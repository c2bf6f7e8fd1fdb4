"""Row-softmax Pallas kernel for attention logits.

XLA lowers ``jax.nn.softmax`` over a [*, S] logits tensor as ~4 HBM passes
(max reduce; exp+sum; normalize read+write) — measured 0.44 ms on the
flagship F-attention logits ([176, 8, 149, 149] bf16, ~63 MB).  This kernel
does the whole row softmax in VMEM: one read + one write (2 passes), fully
vectorized across rows (unlike a fused per-head attention kernel, which
degenerates into thousands of tiny MXU ops at these shapes — measured 4x
slower than XLA; see scripts/diag_attn_kernel*.py).

Backward is the standard ``dl = p * (dp - rowsum(dp * p))`` with p
recomputed from the saved input (2 reads + 1 write vs XLA's 5+ passes).

fp32 row statistics regardless of input dtype.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

INTERPRET = False

# rows per block: [RB, C] fp32 intermediates must sit in VMEM comfortably
# (RB=2048, C<=512 -> ~4 MB fp32)
_ROW_BLOCK = 2048  # rb=8192 exceeded VMEM (remote compile failure); keep <=4096


def _call_kwargs():
    return {"interpret": INTERPRET}


def use_pallas_softmax() -> bool:
    # STUDY KERNEL, NOT WIRED INTO THE MODEL: the production attention went
    # to the exp-trick formulation (ops/attention_pallas.attention_xla),
    # which removes the explicit softmax entirely — so no model code calls
    # softmax_last and TRANSKUN_TPU_FUSED_SOFTMAX has no effect on the
    # model.  The kernel + tests are kept as the measured 2-pass reference
    # (ARCHITECTURE "The attention-core study") for any future explicit-
    # softmax call site.
    if os.environ.get("TRANSKUN_TPU_NO_PALLAS"):
        return False
    if not os.environ.get("TRANSKUN_TPU_FUSED_SOFTMAX"):
        return False
    return jax.default_backend() == "tpu"


def _fwd_kernel(l_ref, o_ref):
    l = l_ref[...].astype(jnp.float32)
    m = jnp.max(l, axis=1, keepdims=True)
    p = jnp.exp(l - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    o_ref[...] = (p / s).astype(o_ref.dtype)


def _bwd_kernel(l_ref, do_ref, dl_ref):
    l = l_ref[...].astype(jnp.float32)
    m = jnp.max(l, axis=1, keepdims=True)
    e = jnp.exp(l - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s
    dp = do_ref[...].astype(jnp.float32)
    delta = jnp.sum(dp * p, axis=1, keepdims=True)
    dl_ref[...] = (p * (dp - delta)).astype(dl_ref.dtype)


def _rows_call(kernel, out_dtype, *arrays):
    r, c = arrays[0].shape
    rb = min(_ROW_BLOCK, r)
    pad = (-r) % rb
    if pad:
        arrays = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in arrays)
    spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=((r + pad) // rb,),
        in_specs=[spec] * len(arrays),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(((r + pad), c), out_dtype),
        **_call_kwargs(),
    )(*arrays)
    return out[:r] if pad else out


@jax.custom_vjp
def _softmax_rows(l: Array) -> Array:
    return _rows_call(_fwd_kernel, l.dtype, l)


def _vjp_fwd(l):
    return _softmax_rows(l), l


def _vjp_bwd(l, do):
    return (_rows_call(_bwd_kernel, l.dtype, l, do),)


_softmax_rows.defvjp(_vjp_fwd, _vjp_bwd)


def softmax_last(l: Array) -> Array:
    """Softmax over the last axis via the Pallas kernel on TPU, plain
    ``jax.nn.softmax`` elsewhere.  Any leading shape."""
    if not use_pallas_softmax():
        return jax.nn.softmax(l, axis=-1)
    shape = l.shape
    out = _softmax_rows(l.reshape(-1, shape[-1]))
    return out.reshape(shape)
