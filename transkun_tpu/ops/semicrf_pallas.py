"""Pallas TPU kernels for the semi-Markov CRF dynamic programs.

The recurrences (``semicrf._alpha_scan`` / ``viterbi_backward_tables``) are
not first-order: step ``i`` reads every earlier state.  The XLA scan version
issues T sequential steps of tiny sliced ops — measured ~140x off the HBM
roofline on v5e.  These kernels block the DP: positions are processed in
blocks of ``KP``; per block, the contribution of all *finalized* states
("far" part) is one full-stripe masked reduction over a [T, KP, lanes] VMEM
tile (the score tensor streams through VMEM exactly once), and only the tiny
within-block corner runs sequentially.  The lane dimension (batch*tracks,
padded to 128) is the outer grid axis.

Padding is exact by construction: padded score entries are -inf-like, padded
noise is 0, so padded positions reduce to skip chains that do not change any
real state (see ``_pad_inputs``).

Exposed:
* ``viterbi_backward_tables(score, noise)`` — drop-in for the scan version
  (identical pointer semantics including skip-wins-ties / smallest-end ties).
* ``alpha_table(score, noise)``            — the full forward (alpha) table.
* ``beta_table_padded(...)``               — the backward (beta) table, read
  directly off the *alpha-layout* score via column stripes — no flipped /
  transposed copy of the score tensor is ever materialized.
* ``log_z(score, noise)``                  — custom-VJP logZ: one alpha + one
  beta kernel pass, each streaming the score tensor through VMEM once;
  marginals stay in XLA (one fused elementwise pass over the score tensor).
* ``log_z_padded(t_real, s_pad, noise_pad)`` — logZ from *pre-padded,
  pre-masked* inputs, so a producer (the interval scorer) can fuse the NEG
  padding into its einsum epilogue and the [T,T,NB] tensor is written
  exactly once per train step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import semicrf as _scan

NEG = -1e30
LN = _scan.PALLAS_LN  # lane block (batch*track axis)
KP = _scan.PALLAS_KP  # positions per sequential block

# interpret mode lets the kernels run (slowly) on CPU for testing
INTERPRET = False


def _call_kwargs():
    return {"interpret": INTERPRET}


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Right-to-left Viterbi (the decoder)
# ---------------------------------------------------------------------------


def _viterbi_bwd_kernel(st_ref, noise_ref, diag_ref, ptr_ref, q_ref):
    # st_ref:   [KP, Tp, LN] stripe of score^T[p0:p0+KP, :, lane block]
    #           (leading dim = begin position p, sublane dim = end position e,
    #            so every op aligns with the q table layout [Tp, LN])
    # noise_ref/diag_ref/ptr_ref: [KP, LN] rows p0..p0+KP
    # q_ref:    [Tp, LN] scratch, persists across the sequential i steps
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    tp = q_ref.shape[0]
    p0 = (n_steps - 1 - i) * KP

    stripe = st_ref[...].astype(jnp.float32)  # [KP, Tp, LN]
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (KP, tp, LN), 1)

    @pl.when(i == 0)
    def _():
        q_ref[...] = jnp.zeros_like(q_ref)

    # far part: best interval into any finalized end e >= p0+KP
    far_mask = e_idx >= p0 + KP
    cand = jnp.where(far_mask, q_ref[...][None, :, :] + stripe, NEG)
    far_max = jnp.max(cand, axis=1)  # [KP, LN]
    hit = cand == far_max[:, None, :]
    far_idx = jnp.min(
        jnp.where(hit & far_mask, e_idx, jnp.int32(2**30)), axis=1
    )  # smallest end wins ties (torch argmax-first semantics)

    sub = st_ref[:, pl.ds(p0, KP), :]  # [KP(p_rel), KP(e_rel), LN]
    rel_idx = jax.lax.broadcasted_iota(jnp.int32, (KP, LN), 0)

    # within-block sweep, unrolled so every block-relative index is static
    for k in range(KP):
        p_rel = KP - 1 - k
        p = p0 + p_rel
        is_top = jnp.logical_and(i == 0, k == 0)

        qblock = q_ref[pl.ds(p0, KP)]  # [KP, LN]
        wcand = jnp.where(
            rel_idx > p_rel, qblock + sub[p_rel].astype(jnp.float32), NEG
        )  # [KP(e_rel), LN]
        wmax = jnp.max(wcand, axis=0)  # [LN]
        whit = wcand == wmax[None]
        widx = jnp.min(
            jnp.where(whit & (rel_idx > p_rel), rel_idx, jnp.int32(2**30)), axis=0
        )

        best = jnp.where(wmax >= far_max[p_rel], wmax, far_max[p_rel])
        best_e = jnp.where(wmax >= far_max[p_rel], p0 + widx, far_idx[p_rel])

        skip = q_ref[jnp.minimum(p + 1, tp - 1)] + noise_ref[p_rel]
        skip = jnp.where(is_top, NEG, skip)

        take_skip = skip >= best
        sel = jnp.where(take_skip, -1, best_e - (p + 1)).astype(jnp.int32)
        val = jnp.maximum(skip, best)
        val = jnp.where(is_top, 0.0, val)
        sel = jnp.where(is_top, -1, sel)

        q_ref[p] = val + diag_ref[p_rel]
        ptr_ref[p_rel] = sel


def _pad_inputs(score, noise, extra):
    """Pad (score, noise, extra[T,N]) to (Tp, Tp, NBp)/(Tp, NBp) so that the
    padded DP is an exact extension: no intervals touch padding, padded skip
    steps carry zero weight."""
    t, _, nb = score.shape
    tp, nbp = _ceil(t, KP), _ceil(nb, LN)
    score = jnp.pad(
        score, ((0, tp - t), (0, tp - t), (0, nbp - nb)), constant_values=NEG
    )
    noise = jnp.pad(noise.astype(jnp.float32), ((0, tp - t + 1), (0, nbp - nb)))
    extra = jnp.pad(extra.astype(jnp.float32), ((0, tp - t), (0, nbp - nb)))
    return score, noise, extra, t, nb, tp, nbp


def viterbi_backward_tables_padded(
    s_t_pad: jax.Array, noise_pad: jax.Array, diag_gate_pad: jax.Array
) -> jax.Array:
    """Viterbi pointer tables from pre-padded, pre-transposed inputs.

    s_t_pad: [Tp, Tp, NBp] in [begin, end, lane] layout, padded with NEG
    (producers can fuse the padding mask into the score computation so the
    tensor is written exactly once); noise_pad [Tp, NBp] (rows >= T-1 zero);
    diag_gate_pad [Tp, NBp] f32 (already gated).  Returns ptr [Tp, NBp].
    """
    tp, _, nbp = s_t_pad.shape
    assert tp % KP == 0 and nbp % LN == 0, (tp, nbp)
    grid = (nbp // LN, tp // KP)
    n_steps = tp // KP
    return pl.pallas_call(
        _viterbi_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (KP, tp, LN), lambda j, i: (n_steps - 1 - i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (KP, LN), lambda j, i: (n_steps - 1 - i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tp, nbp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tp, LN), jnp.float32)],
        **_call_kwargs(),
    )(s_t_pad, noise_pad, diag_gate_pad)


def viterbi_backward_tables(score, noise) -> Tuple[jax.Array, jax.Array]:
    """Pallas drop-in for ``semicrf.viterbi_backward_tables``."""
    diag = jnp.einsum("iin->in", score).astype(jnp.float32)
    diag_gate = diag * (diag > 0)
    s_pad, n_pad, d_pad, t, nb, tp, nbp = _pad_inputs(score, noise, diag_gate)

    s_pad = jnp.swapaxes(s_pad, 0, 1)  # [begin, end, NB]
    grid = (nbp // LN, tp // KP)
    n_steps = tp // KP
    ptr = pl.pallas_call(
        _viterbi_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (KP, tp, LN), lambda j, i: (n_steps - 1 - i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (KP, LN), lambda j, i: (n_steps - 1 - i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tp, nbp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tp, LN), jnp.float32)],
        **_call_kwargs(),
    )(s_pad, n_pad, d_pad)
    return ptr[: t - 1, :nb], diag > 0


# ---------------------------------------------------------------------------
# Alpha (forward logsumexp) table
# ---------------------------------------------------------------------------


def _alpha_kernel(s_ref, noise_ref, spdiag_ref, v_out_ref, v_ref):
    # s_ref:  [KP, Tp, LN] stripe of score[i0:i0+KP, :, lane block]
    # noise_ref: [KP, LN] noise_shift rows (noise_shift[i] = noise[i-1])
    # spdiag_ref: [KP, LN]; v_out_ref: [KP, LN]; v_ref: [Tp, LN] scratch
    i = pl.program_id(1)
    tp = v_ref.shape[0]
    i0 = i * KP

    stripe = s_ref[...].astype(jnp.float32)  # [KP, Tp, LN]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (KP, tp, LN), 1)

    @pl.when(i == 0)
    def _():
        v_ref[...] = jnp.zeros_like(v_ref)

    # far: logsumexp over finalized j < i0
    far_mask = j_idx < i0
    cand = jnp.where(far_mask, v_ref[...][None, :, :] + stripe, NEG)
    far_m = jnp.max(cand, axis=1)  # [KP, LN]
    far_s = jnp.sum(jnp.where(far_mask, jnp.exp(cand - far_m[:, None, :]), 0.0), axis=1)

    sub = s_ref[:, pl.ds(i0, KP), :]  # [KP(i_rel), KP(j_rel), LN]
    rel_idx = jax.lax.broadcasted_iota(jnp.int32, (KP, LN), 0)

    for k in range(KP):
        i_abs = i0 + k
        is_first = jnp.logical_and(i == 0, k == 0)

        vblock = v_ref[pl.ds(i0, KP)]  # [KP, LN] (rows >= k are garbage, masked)
        wcand = jnp.where(rel_idx < k, vblock + sub[k].astype(jnp.float32), NEG)  # [KP, LN]
        wmax = jnp.max(wcand, axis=0)  # [LN]

        skip = v_ref[jnp.maximum(i_abs - 1, 0)] + noise_ref[k]
        skip = jnp.where(is_first, NEG, skip)

        m = jnp.maximum(jnp.maximum(far_m[k], wmax), skip)
        total = (
            far_s[k] * jnp.exp(far_m[k] - m)
            + jnp.sum(jnp.where(rel_idx < k, jnp.exp(wcand - m[None]), 0.0), axis=0)
            + jnp.exp(skip - m)
        )
        combined = m + jnp.log(total + 1e-38)
        combined = jnp.where(is_first, 0.0, combined)

        v_ref[i_abs] = combined + spdiag_ref[k]
        v_out_ref[k] = combined + spdiag_ref[k]


def alpha_table_padded(
    s_pad: jax.Array, noise_shift_pad: jax.Array, spdiag_pad: jax.Array
) -> jax.Array:
    """Full alpha table [Tp, NBp] from pre-padded inputs.

    s_pad [Tp, Tp, NBp] in (end, begin, lane) layout, NEG-padded;
    noise_shift_pad [Tp, NBp] with row i = noise[i-1] (row 0 and rows >= T
    zero); spdiag_pad [Tp, NBp] = softplus(diag) (zero on padded rows).
    logZ = result[T-1] (and every later row, via the zero-weight skip chain).
    """
    tp, _, nbp = s_pad.shape
    assert tp % KP == 0 and nbp % LN == 0, (tp, nbp)
    grid = (nbp // LN, tp // KP)
    return pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (KP, tp, LN), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((KP, LN), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, LN), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (KP, LN), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tp, nbp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tp, LN), jnp.float32)],
        **_call_kwargs(),
    )(s_pad, noise_shift_pad, spdiag_pad)


def alpha_table(score, noise) -> jax.Array:
    """Full alpha table [T, N] via the blocked kernel; logZ = result[-1]."""
    spdiag = jax.nn.softplus(jnp.einsum("iin->in", score).astype(jnp.float32))
    t, _, nb = score.shape
    # noise_shift[i] = noise[i-1]
    noise_shift = jnp.pad(noise, ((1, 0), (0, 0)))
    s_pad, _, sp_pad, t, nb, tp, nbp = _pad_inputs(score, noise, spdiag)
    ns_pad = jnp.pad(noise_shift.astype(jnp.float32), ((0, tp - t), (0, nbp - nb)))
    v = alpha_table_padded(s_pad, ns_pad, sp_pad)
    return v[:t, :nb]


# ---------------------------------------------------------------------------
# Beta (backward logsumexp) table
# ---------------------------------------------------------------------------


def _beta_kernel(s_ref, noise_ref, spdiag_ref, q_out_ref, q_ref):
    # The backward recurrence of the interval semi-CRF, derived by unrolling
    # the reference's flip trick back onto the original tensor:
    #   q[t] = logaddexp(q[t+1] + noise[t],
    #                    logsumexp_{e>t} (q[e] + S[e, t])) + softplus(S[t,t])
    #   q[T-1] = softplus(S[T-1, T-1])
    # It reads *columns* of the alpha-layout score, so the same [Tp, Tp, NBp]
    # tensor feeds both kernels with no transposed/flipped copy.
    #
    # s_ref:  [Tp, KP, LN] column stripe score[:, t0:t0+KP, lane block]
    # noise_ref/spdiag_ref/q_out_ref: [KP, LN] rows t0..t0+KP
    # q_ref:  [Tp, LN] scratch, persists across the sequential steps
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    tp = q_ref.shape[0]
    t0 = (n_steps - 1 - i) * KP

    stripe = s_ref[...].astype(jnp.float32)  # [Tp, KP, LN]
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (tp, KP, LN), 0)

    @pl.when(i == 0)
    def _():
        q_ref[...] = jnp.zeros_like(q_ref)

    # far part: logsumexp over finalized ends e >= t0+KP
    far_mask = e_idx >= t0 + KP
    cand = jnp.where(far_mask, q_ref[...][:, None, :] + stripe, NEG)
    far_m = jnp.max(cand, axis=0)  # [KP, LN]
    far_s = jnp.sum(
        jnp.where(far_mask, jnp.exp(cand - far_m[None]), 0.0), axis=0
    )

    sub = s_ref[pl.ds(t0, KP)]  # [KP(e_rel), KP(t_rel), LN]
    rel_idx = jax.lax.broadcasted_iota(jnp.int32, (KP, LN), 0)

    for k in range(KP - 1, -1, -1):
        t = t0 + k
        is_last = jnp.logical_and(i == 0, k == KP - 1)

        qblock = q_ref[pl.ds(t0, KP)]  # [KP, LN] (rows <= k garbage, masked)
        wcand = jnp.where(
            rel_idx > k, qblock + sub[:, k].astype(jnp.float32), NEG
        )  # [KP(e_rel), LN]
        wmax = jnp.max(wcand, axis=0)  # [LN]

        skip = q_ref[jnp.minimum(t + 1, tp - 1)] + noise_ref[k]
        skip = jnp.where(is_last, NEG, skip)

        m = jnp.maximum(jnp.maximum(far_m[k], wmax), skip)
        total = (
            far_s[k] * jnp.exp(far_m[k] - m)
            + jnp.sum(jnp.where(rel_idx > k, jnp.exp(wcand - m[None]), 0.0), axis=0)
            + jnp.exp(skip - m)
        )
        combined = m + jnp.log(total + 1e-38)
        combined = jnp.where(is_last, 0.0, combined)

        q_ref[t] = combined + spdiag_ref[k]
        q_out_ref[k] = combined + spdiag_ref[k]


def beta_table_padded(
    s_pad: jax.Array, noise_pad: jax.Array, spdiag_pad: jax.Array
) -> jax.Array:
    """Full beta table [Tp, NBp] from pre-padded alpha-layout inputs.

    noise_pad [Tp, NBp] with row t = noise[t] (rows >= T-1 zero)."""
    tp, _, nbp = s_pad.shape
    assert tp % KP == 0 and nbp % LN == 0, (tp, nbp)
    grid = (nbp // LN, tp // KP)
    n_steps = tp // KP
    return pl.pallas_call(
        _beta_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tp, KP, LN), lambda j, i: (0, n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (KP, LN), lambda j, i: (n_steps - 1 - i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (KP, LN), lambda j, i: (n_steps - 1 - i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tp, nbp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tp, LN), jnp.float32)],
        **_call_kwargs(),
    )(s_pad, noise_pad, spdiag_pad)


# ---------------------------------------------------------------------------
# logZ with exact-marginal VJP
# ---------------------------------------------------------------------------


def _fb_padded(s_pad, noise_pad):
    """(logZ [NBp], v [Tp,NBp], q [Tp,NBp]) from pre-padded inputs — one
    alpha and one beta kernel pass over the same score tensor."""
    spdiag = jax.nn.softplus(jnp.einsum("iin->in", s_pad).astype(jnp.float32))
    noise_pad = noise_pad.astype(jnp.float32)
    ns_pad = jnp.concatenate(
        [jnp.zeros((1, noise_pad.shape[1]), jnp.float32), noise_pad[:-1]], axis=0
    )
    v = alpha_table_padded(s_pad, ns_pad, spdiag)
    q = beta_table_padded(s_pad, noise_pad, spdiag)
    return v[-1], v, q


def _forward_backward(score, noise):
    """(logZ, v, q): pad once, then alpha + beta kernels — the flipped score
    copy of the reference's doubled-batch trick is never materialized."""
    t, _, nb = score.shape
    s_pad, n_pad, _, t, nb, tp, nbp = _pad_inputs(
        score, noise, jnp.zeros((t, nb), jnp.float32)
    )
    logz, v, q = _fb_padded(s_pad, n_pad)
    return logz[:nb], v[:t, :nb], q[:t, :nb]


@jax.custom_vjp
def log_z(score, noise):
    """Pallas-backed logZ with exact-marginal VJP."""
    logz, _, _ = _forward_backward(score, noise)
    return logz


def _log_z_fwd(score, noise):
    logz, v, q = _forward_backward(score, noise)
    return logz, (score, noise, v, q, logz)


def _log_z_bwd(res, g):
    score, noise, v, q, logz = res
    grad, grad_noise = _scan._marginals(score, noise, v, q, logz)
    return (
        (grad * g[None, None, :]).astype(score.dtype),
        (grad_noise * g[None, :]).astype(noise.dtype),
    )


log_z.defvjp(_log_z_fwd, _log_z_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def log_z_padded(t_real: int, s_pad, noise_pad):
    """logZ [NBp] from pre-padded, pre-masked inputs (see module docstring).

    Producers fuse the NEG mask into the score emission so the [Tp,Tp,NBp]
    tensor is written exactly once; this function then runs one alpha and one
    beta kernel pass over it.  Padded *lanes* must be all-NEG score + zero
    noise (their logZ is 0; their score cotangent is exactly 0).  The noise
    cotangent is masked to the ``t_real-1`` real rows."""
    logz, _, _ = _fb_padded(s_pad, noise_pad)
    return logz


def _log_z_padded_fwd(t_real, s_pad, noise_pad):
    logz, v, q = _fb_padded(s_pad, noise_pad)
    return logz, (s_pad, noise_pad, v, q, logz)


def _log_z_padded_bwd(t_real, res, g):
    s_pad, noise_pad, v, q, logz = res
    # _marginals takes the unpadded-convention [T-1, N] noise rows
    grad, grad_noise = _scan._marginals(s_pad, noise_pad[:-1], v, q, logz)
    row = jnp.arange(grad_noise.shape[0])[:, None]
    grad_noise = jnp.where(row < t_real - 1, grad_noise * g[None, :], 0.0)
    grad_noise = jnp.pad(grad_noise, ((0, 1), (0, 0)))  # back to [Tp, NBp]
    return (
        (grad * g[None, None, :]).astype(s_pad.dtype),
        grad_noise.astype(noise_pad.dtype),
    )


log_z_padded.defvjp(_log_z_padded_fwd, _log_z_padded_bwd)
