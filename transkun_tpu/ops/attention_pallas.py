"""Fused multi-head attention Pallas kernel for the backbone's small-sequence
axial attention (ref ``transkun/LayersTransformer.py:119-190``, the
``F.scaled_dot_product_attention`` call at ``:184``).

Why a custom kernel: the encoder's attention shapes are tiny sequences with a
large batch ([N*T', H=8, S~=89..149, dh=32]).  The XLA path materializes the
attention logits ([B, H, S, S]) in HBM three-plus times (matmul out, softmax,
weighted sum) — ~200 MB per encoder layer at flagship shape, which makes MHA
~0.8 ms while its GEMMs alone are worth ~0.15 ms.  Library flash-attention
kernels want S and dh in units of 128 and would pad dh 32 -> 128.  Here the
whole [S, S] score matrix for one (batch, head) fits in VMEM trivially, so
each grid block computes G batch elements x H heads start-to-finish, and the
logits never touch HBM.

Layout choice: q/k/v stay in the GEMM-native [B, S, H*dh] layout (no
[B, H, S, dh] transpose pass); heads are static lane slices inside the
kernel.

The backward recomputes the softmax per block (flash-attention style — cheap
at these sizes) and emits dq/dk/dv in one pass.  Numerics: logits and
softmax accumulate in fp32 regardless of input dtype (the XLA path in bf16
does bf16 softmax, so the kernel is the *more* precise of the two).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# interpret mode lets the kernels run (slowly) on CPU for testing
INTERPRET = False


def _call_kwargs():
    return {"interpret": INTERPRET}


def use_pallas_attention() -> bool:
    # opt-in while the kernel is being tuned: the first layout (in-kernel
    # lane-sliced heads) measured ~50x slower than XLA on real hardware —
    # Mosaic lane-offset slices are emulated.  Flip the default once the
    # slicing-free layout beats the XLA path.
    if os.environ.get("TRANSKUN_TPU_NO_PALLAS"):
        return False
    if not os.environ.get("TRANSKUN_TPU_FUSED_ATTN"):
        return False
    return jax.default_backend() == "tpu"


def use_fused_kv() -> bool:
    """Concat-fuse every k/v projection of a BasicBlock's shared ``mem``
    into one GEMM (``models/layers.py::BasicBlock``).  Opt-in pending an
    on-chip win: the separate projections already run at ~60% of the HBM
    roofline, so the headroom is <=0.07 ms/layer (ARCHITECTURE roofline)."""
    return bool(os.environ.get("TRANSKUN_TPU_FUSED_KV"))


def _pick_group(b: int) -> int:
    for g in (8, 4, 2):
        if b % g == 0:
            return g
    return 1


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, head_dim, scale):
    g_sz = q_ref.shape[0]
    for g in range(g_sz):
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qg = q_ref[g, :, sl].astype(jnp.float32) * scale  # [Sq, dh]
            kg = k_ref[g, :, sl].astype(jnp.float32)  # [Skv, dh]
            logits = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Sq, Skv]
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=1, keepdims=True)
            vg = v_ref[g, :, sl].astype(jnp.float32)
            o = jax.lax.dot_general(
                p, vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Sq, dh]
            o_ref[g, :, sl] = (o / s).astype(o_ref.dtype)


def _fwd(q: Array, k: Array, v: Array, num_heads: int, scale: float) -> Array:
    b, sq, d = q.shape
    skv = k.shape[1]
    head_dim = d // num_heads
    g = _pick_group(b)
    kernel = functools.partial(
        _fwd_kernel, num_heads=num_heads, head_dim=head_dim, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, skv, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, skv, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, d), q.dtype),
        **_call_kwargs(),
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward (recomputes softmax per block)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads, head_dim, scale,
):
    g_sz = q_ref.shape[0]
    for g in range(g_sz):
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qs = q_ref[g, :, sl].astype(jnp.float32) * scale  # [Sq, dh]
            kg = k_ref[g, :, sl].astype(jnp.float32)  # [Skv, dh]
            logits = jax.lax.dot_general(
                qs, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=1, keepdims=True)
            pn = p / s  # softmax [Sq, Skv]

            do = do_ref[g, :, sl].astype(jnp.float32)  # [Sq, dh]
            og = o_ref[g, :, sl].astype(jnp.float32)
            delta = jnp.sum(do * og, axis=1, keepdims=True)  # [Sq, 1]
            vg = v_ref[g, :, sl].astype(jnp.float32)
            dp = jax.lax.dot_general(
                do, vg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Sq, Skv]
            dl = pn * (dp - delta)  # [Sq, Skv]
            dq = jax.lax.dot_general(
                dl, kg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Sq, dh]
            dk = jax.lax.dot_general(
                dl, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Skv, dh]
            dv = jax.lax.dot_general(
                pn, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Skv, dh]
            dq_ref[g, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, sl] = dv.astype(dv_ref.dtype)


def _bwd_call(
    q: Array, k: Array, v: Array, o: Array, do: Array,
    num_heads: int, scale: float,
) -> Tuple[Array, Array, Array]:
    b, sq, d = q.shape
    skv = k.shape[1]
    head_dim = d // num_heads
    g = _pick_group(b)
    kernel = functools.partial(
        _bwd_kernel, num_heads=num_heads, head_dim=head_dim, scale=scale
    )
    spec_q = pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0))
    spec_kv = pl.BlockSpec((g, skv, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[spec_q, spec_kv, spec_kv, spec_q, spec_q],
        out_specs=[spec_q, spec_kv, spec_kv],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, skv, d), k.dtype),
            jax.ShapeDtypeStruct((b, skv, d), v.dtype),
        ],
        **_call_kwargs(),
    )(q, k, v, o, do)


# ---------------------------------------------------------------------------
# public entry: custom-VJP fused attention
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(
    q: Array, k: Array, v: Array, num_heads: int, scale: float
) -> Array:
    """softmax((q @ k^T) * scale) @ v per head; q/k/v: [B, S, H*dh]."""
    return _fwd(q, k, v, num_heads, scale)


def _vjp_fwd(q, k, v, num_heads, scale):
    o = _fwd(q, k, v, num_heads, scale)
    return o, (q, k, v, o)


def _vjp_bwd(num_heads, scale, res, do):
    q, k, v, o = res
    dq, dk, dv = _bwd_call(q, k, v, o, do, num_heads, scale)
    return dq, dk, dv


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def attention_xla(
    q: Array, k: Array, v: Array, num_heads: int, scale: float
) -> Array:
    """The production XLA attention: softmax expressed as the "exp trick" —
    ``o = exp(l - m) @ [v | 1]`` followed by one division.

    Mathematically identical to ``softmax(l) @ v`` (m = detached row max,
    the standard stabilizer), but the normalized probability tensor is
    never materialized: XLA fuses the exp into the weighted-sum einsum's
    operand, and the row-sum rides along as an extra value column.
    Measured at the flagship F-attention shape this is ~4.8x faster than
    the einsum + jax.nn.softmax chain (0.34 ms vs 1.6 ms, same-run
    comparison; jax.nn.softmax alone costs ~4 HBM passes over the logits).
    Logits accumulate in fp32 (the old path did bf16 softmax), so this is
    also the MORE precise formulation.

    Accepts ANY number of leading (batch) dims, and q vs k/v leads may
    broadcast against each other (the All0 path attends many query rows
    against one shared key row) — the einsums broadcast implicitly, so the
    shared keys/values are never materialized per query row."""
    d = q.shape[-1]
    head_dim = d // num_heads

    def split(x):
        return jnp.swapaxes(
            x.reshape(*x.shape[:-1], num_heads, head_dim), -2, -3
        )

    qh, kh, vh = split(q), split(k), split(v)
    logits = (
        jnp.einsum(
            "...qd,...kd->...qk", qh, kh, preferred_element_type=jnp.float32
        )
        * scale
    )
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m).astype(vh.dtype)
    v_ext = jnp.concatenate(
        [vh, jnp.ones((*vh.shape[:-1], 1), vh.dtype)], axis=-1
    )
    o_ext = jnp.einsum("...qk,...kd->...qd", p, v_ext)
    o = o_ext[..., :head_dim] / o_ext[..., head_dim:]
    o = jnp.swapaxes(o, -2, -3)  # [..., Sq, heads, head_dim]
    return o.reshape(*o.shape[:-2], d).astype(q.dtype)


def attention(q: Array, k: Array, v: Array, num_heads: int, scale: float) -> Array:
    """Backend-dispatched fused attention over [B, S, H*dh] inputs."""
    if use_pallas_attention():
        return fused_attention(q, k, v, num_heads, scale)
    return attention_xla(q, k, v, num_heads, scale)
