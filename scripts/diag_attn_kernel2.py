"""Diagnose slicing-free attention kernel layouts on real TPU.

C: grid (B/G, H) over the [B,S,D] array, BlockSpec lane-offset head slicing
P: grid (B/G, H) over a pre-transposed [B,H,S,dh] array (flash layout)
"""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, S, H, DH = 176, 149, 8, 32
D = H * DH
G = 8
SCALE = 0.17677
rng = np.random.default_rng(0)
qf = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)


def timeit(f, x, n=30):
    o = f(x); np.asarray(jax.device_get(jnp.ravel(o)[0]))
    t0 = time.time()
    out = x
    for _ in range(n):
        out = f(out)
    np.asarray(jax.device_get(jnp.ravel(out)[0]))
    return (time.time() - t0) / n * 1e3


def attn_body(qg, kg, vg):
    l = jax.lax.dot_general(qg * SCALE, kg, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(l, axis=1, keepdims=True)
    p = jnp.exp(l - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o / s


# --- variant C: lane-offset BlockSpec on [B, S, D] -------------------------


def kernel_c(q_ref, o_ref):
    for g in range(q_ref.shape[0]):
        qg = q_ref[g].astype(jnp.float32)
        o_ref[g] = attn_body(qg, qg, q_ref[g]).astype(o_ref.dtype)


def run_c():
    spec = pl.BlockSpec((G, S, DH), lambda i, h: (i, 0, h))
    f = jax.jit(lambda x: pl.pallas_call(
        kernel_c,
        grid=(B // G, H),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
    )(x))
    try:
        print("C per-exec ms", round(timeit(f, qf), 3), flush=True)
    except Exception as e:
        print("C FAILED:", type(e).__name__, str(e)[:300], flush=True)


# --- variant P: [B, H, S, dh] flash layout ---------------------------------


def kernel_p(q_ref, o_ref):
    for g in range(q_ref.shape[0]):
        qg = q_ref[g, 0].astype(jnp.float32)
        o_ref[g, 0] = attn_body(qg, qg, q_ref[g, 0]).astype(o_ref.dtype)


def run_p():
    q4 = qf.reshape(B, S, H, DH).transpose(0, 2, 1, 3)  # [B, H, S, dh]
    spec = pl.BlockSpec((G, 1, S, DH), lambda i, h: (i, h, 0, 0))

    def call(x):
        return pl.pallas_call(
            kernel_p,
            grid=(B // G, H),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, S, DH), x.dtype),
        )(x)

    f = jax.jit(call)
    try:
        print("P per-exec ms", round(timeit(f, q4), 3), flush=True)
    except Exception as e:
        print("P FAILED:", type(e).__name__, str(e)[:300], flush=True)

    # P including the XLA transposes from/to [B, S, D]
    def full(x):
        x4 = x.reshape(B, S, H, DH).transpose(0, 2, 1, 3)
        o4 = call(x4)
        return o4.transpose(0, 2, 1, 3).reshape(B, S, D)

    print("P+transposes ms", round(timeit(jax.jit(full), qf), 3), flush=True)


# --- XLA reference at same shape ------------------------------------------


def run_xla():
    from transkun_tpu.ops import attention_pallas as ap

    f = jax.jit(lambda x: ap.attention_xla(x, x, x, H, SCALE))
    print("XLA per-exec ms", round(timeit(f, qf), 3), flush=True)


run_xla()
run_c()
run_p()
