"""Fused MLP (Dense -> exact-erf GELU -> Dense) Pallas kernel.

In XLA the FFN hidden activation ([tokens, 4*D], bf16) makes a full HBM
round trip between the two GEMMs (~107 MB per FFN at flagship train shape).
This kernel keeps both weight matrices resident in VMEM and streams row
blocks of x through hidden without touching HBM: traffic drops to
read-x + write-out + weights-once.  Per-block matmuls are [rows, 256] x
[256, 1024] — big enough for real MXU utilization (unlike per-head
attention bodies, see ARCHITECTURE "attention-core study").

Backward is plain XLA (jax.vjp over the identical reference math,
recompute-style) — the backward pass needs dW reductions across all rows,
which XLA already schedules well.

Gated OPT-IN via ``TRANSKUN_TPU_FUSED_MLP=1``: the kernel wins in isolation
(scripts/profile_candidates.py case D: 0.298 ms vs 0.417 ms) but loses ~25%
end-to-end in the streaming decode program — the pallas_call is a fusion
barrier, and XLA's own FFN+residual+norm fusion is worth more than the
hidden-tensor HBM round trip it removes (bench.py A/B, 2026-08-17).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

INTERPRET = False
_ROW_BLOCK = 1024


def _call_kwargs():
    return {"interpret": INTERPRET}


def use_pallas_mlp() -> bool:
    # OPT-IN.  The kernel wins its isolated microbenchmark (0.298 ms vs
    # 0.417 ms for XLA Dense-gelu-Dense at the flagship FFN shape,
    # [26224,256->1024->256] bf16) but LOSES ~25% end-to-end in the decode
    # program (bench.py 121.8x with it on vs 152.9x off, same weather
    # window): inside the full backbone XLA fuses the FFN GEMMs with the
    # surrounding residual/norm elementwise work, and the pallas_call is a
    # fusion barrier that re-buys those HBM passes.  Enable with
    # TRANSKUN_TPU_FUSED_MLP=1 for isolated-FFN workloads only.
    if os.environ.get("TRANSKUN_TPU_NO_PALLAS"):
        return False
    if os.environ.get("TRANSKUN_TPU_FUSED_MLP", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def mlp_reference(x, w1, b1, w2, b2):
    """The exact XLA math (flax Dense(dtype) -> gelu -> Dense(dtype)
    semantics with pre-cast operands): also the backward-pass body."""
    h = x @ w1 + b1
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return g @ w2 + b2


def _erf_approx(x):
    # Mosaic implements neither erfc nor erf; Abramowitz & Stegun 7.1.26
    # rational approximation (max abs error 1.5e-7 — far below the bf16
    # cast that follows).
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return s * y


def _gelu_erf(h):
    # exact-erf gelu with the in-kernel erf approximation above
    inv_sqrt2 = 0.7071067811865476
    return 0.5 * h * (1.0 + _erf_approx(h * inv_sqrt2))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    g = _gelu_erf(h).astype(x.dtype)
    o = jax.lax.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_fwd_call(x, w1, b1, w2, b2):
    m, d = x.shape
    hid = w1.shape[1]
    rb = min(_ROW_BLOCK, m)
    pad = (-m) % rb
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    out = pl.pallas_call(
        _mlp_kernel,
        grid=((m + pad) // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0)),
            pl.BlockSpec((d, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, d), x.dtype),
        **_call_kwargs(),
    )(xp, w1, b1, w2, b2)
    return out[:m] if pad else out


@jax.custom_vjp
def fused_mlp(x: Array, w1: Array, b1: Array, w2: Array, b2: Array) -> Array:
    """gelu(x @ w1 + b1) @ w2 + b2 with the hidden activation VMEM-resident.
    x: [M, D]; dtypes of all operands must already match (pre-cast)."""
    return _mlp_fwd_call(x, w1, b1, w2, b2)


def _vjp_fwd(x, w1, b1, w2, b2):
    return _mlp_fwd_call(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _vjp_bwd(res, do):
    _, vjp = jax.vjp(mlp_reference, *res)
    return vjp(do)


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def mlp(x: Array, w1: Array, b1: Array, w2: Array, b2: Array) -> Array:
    """Backend-dispatched MLP over [..., D] inputs."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    if use_pallas_mlp():
        out = fused_mlp(xf, w1, b1, w2, b2)
    else:
        out = mlp_reference(xf, w1, b1, w2, b2)
    return out.reshape(*lead, out.shape[-1])
