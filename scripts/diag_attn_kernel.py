"""Diagnose which part of the fused attention kernel is slow on real TPU."""

import functools
import sys, os, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def timeit(f, x, n=20):
    t0 = time.time(); o = f(x); np.asarray(jax.device_get(o[0, 0, 0]))
    t0 = time.time()
    out = x
    for _ in range(n):
        out = f(out)
    np.asarray(jax.device_get(out[0, 0, 0]))
    return (time.time() - t0) / n * 1e3


B, S, H, DH = 16, 149, 8, 32
D = H * DH
G = 8
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)


def copy_kernel(q_ref, o_ref):
    # per-(g,h) lane-sliced copies, no compute
    for g in range(G):
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            o_ref[g, :, sl] = q_ref[g, :, sl]


def dot_kernel(q_ref, o_ref):
    # per-(g,h) slices + the two dots, no softmax
    for g in range(G):
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            qg = q_ref[g, :, sl].astype(jnp.float32)
            l = jax.lax.dot_general(qg, qg, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(l.astype(jnp.bfloat16), q_ref[g, :, sl],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[g, :, sl] = o.astype(o_ref.dtype)


def softmax_kernel(q_ref, o_ref):
    # slices + softmax-ish VPU work, one dot
    for g in range(G):
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            qg = q_ref[g, :, sl].astype(jnp.float32)
            l = jax.lax.dot_general(qg, qg, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(l, axis=1, keepdims=True)
            p = jnp.exp(l - m)
            s = jnp.sum(p, axis=1, keepdims=True)
            o_ref[g, :, sl] = (p / s)[:, : DH].astype(o_ref.dtype)


def run(kernel, name):
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, S, D), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((G, S, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
    )(x))
    t0 = time.time()
    o = f(q)
    print(name, "compile+dispatch", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    np.asarray(jax.device_get(o[0, 0, 0]))
    print(name, "first exec", round(time.time() - t0, 2), flush=True)
    print(name, "per-exec ms", round(timeit(f, q), 3), flush=True)


run(copy_kernel, "copy")
run(dot_kernel, "dot")
run(softmax_kernel, "softmax")
