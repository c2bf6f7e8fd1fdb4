"""Pallas vectorized softmax vs jax.nn.softmax on the attention-logits shape,
plus fused-kv GEMM hypothesis checks."""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def timeit(f, x, n=30):
    o = f(x); np.asarray(jax.device_get(jnp.ravel(o)[0]))
    t0 = time.time()
    out = x
    for _ in range(n):
        out = f(out)
    np.asarray(jax.device_get(jnp.ravel(out)[0]))
    return (time.time() - t0) / n * 1e3


rng = np.random.default_rng(0)

# softmax over last dim of [B*H*Sq, Skv]
R, C = 176 * 8 * 149, 149
l0 = jnp.asarray(rng.normal(size=(R, C)), jnp.bfloat16)


def sm_kernel(l_ref, o_ref):
    l = l_ref[...].astype(jnp.float32)
    m = jnp.max(l, axis=1, keepdims=True)
    p = jnp.exp(l - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    o_ref[...] = (p / s).astype(o_ref.dtype)


def run_pallas_sm(rb):
    rpad = -(-R // rb) * rb
    def f(x):
        return pl.pallas_call(
            sm_kernel,
            grid=(rpad // rb,),
            in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        )(x)
    try:
        print(f"pallas_sm rb={rb}", round(timeit(jax.jit(f), l0), 3), flush=True)
    except Exception as e:
        print(f"pallas_sm rb={rb} FAILED:", str(e)[:200], flush=True)


def run_xla_sm():
    f = jax.jit(lambda x: jax.nn.softmax(x, axis=-1))
    print("xla_sm", round(timeit(f, l0), 3), flush=True)
    g = jax.jit(lambda x: jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype))
    print("xla_sm_f32", round(timeit(g, l0), 3), flush=True)


run_xla_sm()
for rb in (1024, 4096, 8192):
    run_pallas_sm(rb)

# GEMM separate vs fused along N, with a nonlinearity to block reassociation
M, K = 26224, 256
x0 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
wk = jnp.asarray(rng.normal(size=(K, 256)) * 0.02, jnp.bfloat16)
wv = jnp.asarray(rng.normal(size=(K, 256)) * 0.02, jnp.bfloat16)
wkv = jnp.concatenate([wk, wv], axis=1)
wkv4 = jnp.asarray(rng.normal(size=(K, 1024)) * 0.02, jnp.bfloat16)


def bench_gemm(name, f):
    print(name, round(timeit(jax.jit(f), x0), 3), flush=True)


bench_gemm("two_separate_256", lambda x: (
    jnp.tanh(x @ wk)[:, :1] * 1e-6 + jnp.tanh(x @ wv)[:, :1] * 1e-6 + x))
bench_gemm("one_fused_512", lambda x: jnp.tanh(x @ wkv)[:, :1] * 1e-6 + x)
bench_gemm("one_fused_1024", lambda x: jnp.tanh(x @ wkv4)[:, :1] * 1e-6 + x)
bench_gemm("one_256", lambda x: jnp.tanh(x @ wk)[:, :1] * 1e-6 + x)
