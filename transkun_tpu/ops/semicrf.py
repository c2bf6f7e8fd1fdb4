"""Neural semi-Markov CRF over time intervals — TPU-native JAX implementation.

This is the model-agnostic probabilistic output layer of the framework: given a
score tensor ``score[T, T, N]`` assigning a score to every closed time interval
``[tBegin, tEnd]`` (axes ``[tEnd, tBegin, batch]``, lower triangle used) and a
"no event" score ``noise[T-1, N]`` for every step ``t -> t+1``, it provides

* ``log_z``             — the log partition function, with a custom VJP that
                          emits exact posterior marginals in the backward pass,
* ``eval_path_padded``  — the unnormalized score of a given interval set,
* ``viterbi_*``         — max-semiring DP producing backtracking pointer
                          tables on device; the O(#events) pointer walk runs on
                          host in numpy,
* ``NeuralSemiCRFInterval`` — a thin wrapper mirroring the reference API.

Semantics match the reference implementation
(``transkun/CRF/NeuralSemiCRFInterval.py``): the diagonal entries ``S[i,i]``
are *singleton* scores — marginalized through ``softplus`` in the partition
function (ref ``:218-246``) and included in a decode iff ``S[i,i] > 0`` at a
visited position (ref ``:49-51,177-179``).  The partition recursion is

    v[i] = logaddexp(v[i-1] + noise[i-1], logsumexp_{j<i} v[j] + S[i,j])
           + softplus(S[i,i])                                  (ref ``:402-410``)

which is not a first-order recurrence (``v[i]`` reads all of ``v[:i]``); here
it runs as a ``lax.scan`` carrying the full ``v`` buffer, with the
forward/backward passes fused into ONE scan via the flipped-score doubled-batch
trick (ref ``:386-417``).  A Pallas blocked-DP kernel with the same contract
lives in ``semicrf_pallas.py``; this module is the always-correct fallback and
test oracle.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Large-negative instead of -inf: keeps masked lanes NaN-free under exp/grad.
NEG = -1e30

# Pallas kernel block sizes (single source of truth; semicrf_pallas and the
# fused score producers pad to these)
PALLAS_KP = 8  # positions per sequential DP block
PALLAS_LN = 128  # lane block (batch*track axis)


def _diag(score: Array) -> Array:
    """Diagonal of score[T, T, N] -> [T, N]."""
    return jnp.einsum("iin->in", score)


def _masked_logsumexp(x: Array, mask: Array, axis: int) -> Array:
    xm = jnp.where(mask, x, NEG)
    m = jnp.max(xm, axis=axis, keepdims=True)
    s = jnp.sum(jnp.where(mask, jnp.exp(x - m), 0.0), axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(s + 1e-38)


def _alpha_scan(score: Array, noise: Array) -> Array:
    """Forward (alpha) DP. score [T,T,N] (end, begin, batch), noise [T-1,N].

    Returns the full alpha table v[T, N]; logZ = v[-1].
    """
    T, _, N = score.shape
    score = score.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    spdiag = jax.nn.softplus(_diag(score))  # [T, N]
    v0 = jnp.zeros((T, N), score.dtype).at[0].set(spdiag[0])
    pos = jnp.arange(T)[:, None]

    def step(v, xs):
        row, noise_i, i = xs  # row: score[i, :, :] -> [T, N]
        interval = _masked_logsumexp(v + row, pos < i, axis=0)
        skip = jax.lax.dynamic_index_in_dim(v, i - 1, 0, keepdims=False) + noise_i
        vi = jnp.logaddexp(skip, interval) + jax.lax.dynamic_index_in_dim(
            spdiag, i, 0, keepdims=False
        )
        v = jax.lax.dynamic_update_index_in_dim(v, vi, i, 0)
        return v, None

    v, _ = jax.lax.scan(step, v0, (score[1:], noise, jnp.arange(1, T)))
    return v


def _flip_score(score: Array) -> Array:
    """Time-reverse a score tensor: out[e, b] = score[T-1-b, T-1-e].

    Running the forward recursion on the flipped tensor yields the backward
    (beta) quantities of the original problem (ref ``:386-391``).
    """
    return jnp.swapaxes(score[::-1, ::-1], 0, 1)


def _forward_backward(score: Array, noise: Array) -> Tuple[Array, Array, Array]:
    """One scan over the doubled batch computing alpha and beta together.

    Returns (logZ [N], v [T,N], q [T,N]).
    """
    score_fb = jnp.concatenate([score, _flip_score(score)], axis=-1)
    noise_fb = jnp.concatenate([noise, noise[::-1]], axis=-1)
    vq = _alpha_scan(score_fb, noise_fb)
    v, q = jnp.split(vq, 2, axis=-1)
    q = q[::-1]
    return v[-1], v, q


def _marginals(
    score: Array, noise: Array, v: Array, q: Array, logz: Array
) -> Tuple[Array, Array]:
    """Exact posterior marginals (the logZ gradient), ref ``:424-447``.

    grad[e, b]  = exp(v[b] + q[e] + S[e,b] - logZ - 2*softplus(S)[diag only])
                  masked to the lower triangle;
    gradNoise[i] = exp(v[i] + q[i+1] + noise[i] - logZ).
    """
    T = score.shape[0]
    spdiag = jax.nn.softplus(_diag(score))  # [T, N]
    g = v[None, :, :] + q[:, None, :] + score.astype(v.dtype) - logz[None, None, :]
    eye = jnp.eye(T, dtype=bool)[:, :, None]
    g = g - jnp.where(eye, 2.0 * spdiag[:, None, :], 0.0)
    tril = jnp.tril(jnp.ones((T, T), dtype=bool))[:, :, None]
    grad = jnp.where(tril, jnp.exp(jnp.where(tril, g, NEG)), 0.0)
    grad_noise = jnp.exp(v[:-1] + q[1:] + noise - logz[None, :])
    return grad, grad_noise


@jax.custom_vjp
def log_z(score: Array, noise: Array) -> Array:
    """Log partition function of the interval semi-CRF.  [T,T,N],[T-1,N] -> [N].

    Backward pass returns exact marginals times the upstream cotangent
    (matching reference ``ComputeLogZFasterGrad``, ref ``:459-475``) without
    materializing the [T,T,N] marginal tensor in the forward residuals.
    """
    logz, _, _ = _forward_backward(score, noise)
    return logz


def _log_z_fwd(score, noise):
    logz, v, q = _forward_backward(score, noise)
    return logz, (score, noise, v, q, logz)


def _log_z_bwd(res, g):
    score, noise, v, q, logz = res
    grad, grad_noise = _marginals(score, noise, v, q, logz)
    return (
        (grad * g[None, None, :]).astype(score.dtype),
        (grad_noise * g[None, :]).astype(noise.dtype),
    )


log_z.defvjp(_log_z_fwd, _log_z_bwd)


def log_z_slow(score: Array, noise: Array) -> Array:
    """Plain autodiff-able logZ (single forward scan). Test oracle."""
    return _alpha_scan(score, noise)[-1]


def marginals(score: Array, noise: Array) -> Tuple[Array, Array, Array]:
    """Returns (logZ, interval marginals [T,T,N], noise marginals [T-1,N])."""
    logz, v, q = _forward_backward(score, noise)
    grad, grad_noise = _marginals(score, noise, v, q, logz)
    return logz, grad, grad_noise


# ---------------------------------------------------------------------------
# Backend dispatch: Pallas blocked-DP kernels on TPU, scan elsewhere
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    import os

    return jax.default_backend() == "tpu" and not os.environ.get(
        "TRANSKUN_TPU_NO_PALLAS"
    )


def log_z_best(score: Array, noise: Array) -> Array:
    """logZ via the fastest available backend (Pallas kernel on TPU)."""
    if _use_pallas():
        from . import semicrf_pallas

        return semicrf_pallas.log_z(score, noise)
    return log_z(score, noise)


def viterbi_backward_tables_best(score: Array, noise: Array):
    """Viterbi tables via the fastest available backend."""
    if _use_pallas():
        from . import semicrf_pallas

        return semicrf_pallas.viterbi_backward_tables(score, noise)
    return viterbi_backward_tables(score, noise)


def log_z_padded_best(t_real: int, s_pad: Array, noise_pad: Array) -> Array:
    """logZ from pre-padded, pre-NEG-masked inputs (the fused training path:
    the producer writes the [Tp,Tp,NBp] score tensor exactly once).

    s_pad [Tp,Tp,NBp] alpha layout (end, begin, lane), padded entries NEG;
    noise_pad [Tp,NBp] with row t = noise[t] (rows >= t_real-1 zero).
    Returns [NBp]; padded lanes (all-NEG score) yield logZ = 0.
    """
    if _use_pallas():
        from . import semicrf_pallas

        return semicrf_pallas.log_z_padded(t_real, s_pad, noise_pad)
    # scan fallback: the padded DP is an exact extension of the real one.
    # stop_gradient on the padding rows matches the Pallas path's masked
    # noise cotangent (padded skip steps otherwise receive marginal ~1)
    noise = noise_pad[:-1]
    row = jnp.arange(noise.shape[0])[:, None]
    noise = jnp.where(row < t_real - 1, noise, jax.lax.stop_gradient(noise))
    return log_z(s_pad, noise)


# ---------------------------------------------------------------------------
# Path scoring
# ---------------------------------------------------------------------------


def eval_path_padded(
    score: Array,
    noise: Array,
    begins: Array,
    ends: Array,
    mask: Array,
) -> Array:
    """Unnormalized score of interval sets, static-shape (jit-friendly).

    begins/ends: [N, K] int32 frame indices (closed intervals), mask [N, K].
    Equals sum of interval scores plus noise over uncovered steps
    (ref ``evalPath``, ``:508-550``).
    """
    T, _, N = score.shape
    ncum = jnp.concatenate(
        [jnp.zeros((1, N), noise.dtype), jnp.cumsum(noise, axis=0)], axis=0
    )  # [T, N]
    sc = jnp.moveaxis(score, -1, 0).reshape(N, T * T)
    b = jnp.clip(begins, 0, T - 1)
    e = jnp.clip(ends, 0, T - 1)
    vals = jnp.take_along_axis(sc, e * T + b, axis=1)
    ncum_t = ncum.T  # [N, T]
    span = jnp.take_along_axis(ncum_t, e, axis=1) - jnp.take_along_axis(
        ncum_t, b, axis=1
    )
    contrib = jnp.where(mask, vals - span, 0.0)
    return jnp.sum(contrib, axis=1) + ncum[-1]


def eval_path_slow(
    intervals: Sequence[Sequence[Tuple[int, int]]], score: Array, noise: Array
) -> Array:
    """Naive per-interval path scoring (ref ``evalPathSlow``, ``:478-502``) —
    a readable oracle for ``eval_path_padded``."""
    ncum = jnp.concatenate(
        [jnp.zeros((1, noise.shape[1]), noise.dtype), jnp.cumsum(noise, axis=0)],
        axis=0,
    )
    out = []
    for idx, cur in enumerate(intervals):
        v = ncum[-1, idx]
        for b, e in cur:
            v = v + score[e, b, idx] - ncum[e, idx] + ncum[b, idx]
        out.append(v)
    return jnp.stack(out, axis=-1)


def pad_intervals(
    intervals: Sequence[Sequence[Tuple[int, int]]], k: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: ragged per-track interval lists -> padded (begins, ends, mask).

    Pads K to the next power of two to bound recompilation.
    """
    n = len(intervals)
    kmax = max((len(c) for c in intervals), default=0)
    if k is None:
        k = 1
        while k < max(kmax, 1):
            k *= 2
    assert kmax <= k
    begins = np.zeros((n, k), np.int32)
    ends = np.zeros((n, k), np.int32)
    mask = np.zeros((n, k), bool)
    for i, cur in enumerate(intervals):
        for j, (b, e) in enumerate(cur):
            begins[i, j] = b
            ends[i, j] = e
            mask[i, j] = True
    return begins, ends, mask


def eval_path(
    intervals: Sequence[Sequence[Tuple[int, int]]], score: Array, noise: Array
) -> Array:
    """List-of-lists convenience wrapper around ``eval_path_padded``."""
    begins, ends, mask = pad_intervals(intervals)
    return eval_path_padded(
        score, noise, jnp.asarray(begins), jnp.asarray(ends), jnp.asarray(mask)
    )


# ---------------------------------------------------------------------------
# Viterbi (max-semiring DP) — pointer tables on device, walk on host
# ---------------------------------------------------------------------------


def viterbi_backward_tables(score: Array, noise: Array) -> Tuple[Array, Array]:
    """Right-to-left Viterbi DP (the decoder used for segment stitching).

    Returns (ptr [T-1, N] int32, diag_pos [T, N] bool).  ``ptr[pos]`` encodes
    the best move leaving position ``pos`` towards T-1: -1 = skip to pos+1,
    s >= 0 = interval (pos, pos+1+s).  Matches ref ``viterbiBackward``
    (``:12-104``) including the skip-wins-ties convention.
    """
    T, _, N = score.shape
    score = score.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    diag = _diag(score)  # [T, N]
    diag_gate = diag * (diag > 0)
    score_t = jnp.swapaxes(score, 0, 1)  # [begin, end, N]
    q0 = jnp.zeros((T, N), score.dtype).at[T - 1].set(diag_gate[T - 1])
    endpos = jnp.arange(T)[:, None]

    def step(q, xs):
        row, noise_p, p = xs  # row = score[:, p, :] -> [T_end, N]
        cand = jnp.where(endpos > p, q + row, NEG)
        best = jnp.max(cand, axis=0)
        bestj = jnp.argmax(cand, axis=0)
        skip = jax.lax.dynamic_index_in_dim(q, p + 1, 0, keepdims=False) + noise_p
        take_skip = skip >= best
        sel = jnp.where(take_skip, -1, bestj - (p + 1)).astype(jnp.int32)
        val = jnp.maximum(skip, best) + jax.lax.dynamic_index_in_dim(
            diag_gate, p, 0, keepdims=False
        )
        q = jax.lax.dynamic_update_index_in_dim(q, val, p, 0)
        return q, sel

    _, sels = jax.lax.scan(
        step, q0, (score_t[:-1][::-1], noise[::-1], jnp.arange(T - 2, -1, -1))
    )
    return sels[::-1], diag > 0


def viterbi_forward_tables(score: Array, noise: Array) -> Tuple[Array, Array]:
    """Left-to-right Viterbi DP (ref ``viterbi``, ``:106-202``).

    Returns (ptr [T-1, N] int32, diag_pos).  ``ptr[i-1]`` is the best move
    into position ``i``: -1 = skip from i-1, j >= 0 = interval (j, i).
    """
    T, _, N = score.shape
    score = score.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    diag = _diag(score)
    diag_gate = diag * (diag > 0)
    v0 = jnp.zeros((T, N), score.dtype).at[0].set(diag_gate[0])
    pos = jnp.arange(T)[:, None]

    def step(v, xs):
        row, noise_i, i = xs
        cand = jnp.where(pos < i, v + row, NEG)
        best = jnp.max(cand, axis=0)
        bestj = jnp.argmax(cand, axis=0)
        skip = jax.lax.dynamic_index_in_dim(v, i - 1, 0, keepdims=False) + noise_i
        take_skip = skip >= best
        sel = jnp.where(take_skip, -1, bestj).astype(jnp.int32)
        val = jnp.maximum(skip, best) + jax.lax.dynamic_index_in_dim(
            diag_gate, i, 0, keepdims=False
        )
        v = jax.lax.dynamic_update_index_in_dim(v, val, i, 0)
        return v, sel

    _, sels = jax.lax.scan(step, v0, (score[1:], noise, jnp.arange(1, T)))
    return sels, diag > 0


def backtrack_backward(
    ptr: np.ndarray,
    diag_pos: np.ndarray,
    forced_start: Optional[Sequence[int]] = None,
) -> List[List[Tuple[int, int]]]:
    """Host pointer walk for the right-to-left DP (ref ``:61-104``).

    ``forced_start[b]`` pins the first visited frame of track b (used to carry
    the last confirmed offset across streaming segments).  Default 0.
    """
    Tm1, n = ptr.shape
    T = Tm1 + 1
    if forced_start is None:
        forced_start = [0] * n
    results: List[List[Tuple[int, int]]] = []
    for b in range(n):
        j = int(forced_start[b])
        out: List[Tuple[int, int]] = []
        while j < T - 1:
            sel = int(ptr[j, b])
            if diag_pos[j, b]:
                out.append((j, j))
            if sel < 0:
                j += 1
            else:
                e = j + 1 + sel
                out.append((j, e))
                j = e
        if diag_pos[T - 1, b]:
            out.append((T - 1, T - 1))
        results.append(out)
    return results


def backtrack_forward(
    ptr: np.ndarray,
    diag_pos: np.ndarray,
    forced_start: Optional[Sequence[int]] = None,
) -> List[List[Tuple[int, int]]]:
    """Host pointer walk for the left-to-right DP (ref ``:157-202``)."""
    Tm1, n = ptr.shape
    T = Tm1 + 1
    if forced_start is None:
        forced_start = [T - 1] * n
    results: List[List[Tuple[int, int]]] = []
    for b in range(n):
        j = int(forced_start[b])
        out: List[Tuple[int, int]] = []
        while j > 0:
            sel = int(ptr[j - 1, b])
            if diag_pos[j, b]:
                out.append((j, j))
            if sel < 0:
                j -= 1
            else:
                out.append((sel, j))
                j = sel
        if diag_pos[0, b]:
            out.append((0, 0))
        out.reverse()
        results.append(out)
    return results


def walk_backward_device(
    ptr: Array,
    diag_pos: Array,
    forced_start: Array,
    k_max: int,
) -> Tuple[Array, Array, Array, Array]:
    """ON-DEVICE pointer walk: the jittable, all-tracks-parallel equivalent of
    ``backtrack_backward`` (same event order and semantics).

    Exists so the sequential decode chain — Viterbi tables -> pointer walk ->
    lastP -> next segment's forcedStartPos -> attribute gather — can stay
    entirely on the accelerator: only compact per-event tensors ever cross
    the (slow) host link, instead of the full [T-1, NB] pointer table per
    segment.  The walk is a ``lax.scan`` over the T frame positions; each
    track's cursor advances when the sweep reaches it, so one pass emits
    every event exactly in walk order.

    Args:
      ptr        [T-1, NB] int: -1 = skip to t+1, s >= 0 = interval (t, t+1+s)
      diag_pos   [T, NB] bool: singleton fires at visited positions
      forced_start [NB] int32
      k_max      static event capacity per track

    Returns (begins [NB, K] i32, ends [NB, K] i32, count [NB] i32 clamped to
    K, overflow [NB] bool — True where a track emitted more than K events;
    callers must fall back to the host walk for those).
    """
    T, nb = diag_pos.shape
    ptr_pad = jnp.concatenate(
        [ptr.astype(jnp.int32), jnp.full((1, nb), -1, jnp.int32)], axis=0
    )

    # Phase 1 — the only sequential part: chase the cursor, carrying nothing
    # but its position ([NB] ints), and record which positions it visits.
    # The emission bookkeeping ([NB, K] scatter per step in the earlier
    # version) is deliberately NOT in the carry — it dominated the scan cost.
    def step(j, xs):
        sel, t = xs
        active = t == j
        j = jnp.where(
            active & (t < T - 1),
            jnp.where(sel < 0, t + 1, t + 1 + sel),
            j,
        )
        return j, active

    _, visited = jax.lax.scan(
        step,
        forced_start.astype(jnp.int32),
        (ptr_pad, jnp.arange(T, dtype=jnp.int32)),
        unroll=8,
    )  # visited [T, NB]

    # Phase 2 — pointwise emission flags at visited positions, in walk order
    # (singleton before interval at the same t, ref backtrack order), then a
    # fully parallel compaction via exclusive cumsum + one-hot reduction.
    t_col = jnp.arange(T, dtype=jnp.int32)[:, None]
    s_do = visited & diag_pos
    i_do = visited & (ptr_pad >= 0) & (t_col < T - 1)
    t_b = jnp.broadcast_to(t_col, (T, nb))
    i_end = t_b + 1 + ptr_pad
    do = jnp.stack([s_do, i_do], axis=1).reshape(2 * T, nb)
    b_val = jnp.stack([t_b, t_b], axis=1).reshape(2 * T, nb)
    e_val = jnp.stack([t_b, i_end], axis=1).reshape(2 * T, nb)
    doi = do.astype(jnp.int32)
    k_of = jnp.cumsum(doi, axis=0) - doi  # exclusive: each event's slot
    count = k_of[-1] + doi[-1]
    oh = (k_of[..., None] == jnp.arange(k_max)) & do[..., None]  # [2T, NB, K]
    begins = jnp.sum(jnp.where(oh, b_val[..., None], 0), axis=0)
    ends = jnp.sum(jnp.where(oh, e_val[..., None], 0), axis=0)
    return begins, ends, jnp.minimum(count, k_max), count > k_max


# ---------------------------------------------------------------------------
# Wrapper mirroring the reference API (ref ``NeuralSemiCRFInterval``, :553-588)
# ---------------------------------------------------------------------------


class NeuralSemiCRFInterval:
    """Stateless wrapper bundling a score pair with the CRF operations."""

    def __init__(self, score: Array, noiseScore: Array):
        self.score = score
        self.noiseScore = noiseScore

    def decode(
        self, forcedStartPos: Optional[Sequence[int]] = None, forward: bool = False
    ) -> List[List[Tuple[int, int]]]:
        if forward:
            ptr, diag = viterbi_forward_tables(self.score, self.noiseScore)
            return backtrack_forward(
                np.asarray(ptr), np.asarray(diag), forcedStartPos
            )
        ptr, diag = viterbi_backward_tables(self.score, self.noiseScore)
        return backtrack_backward(np.asarray(ptr), np.asarray(diag), forcedStartPos)

    def evalPath(self, intervals) -> Array:
        return eval_path(intervals, self.score, self.noiseScore)

    def computeLogZ(self, noBackward: bool = False) -> Array:
        if noBackward:
            return log_z_slow(self.score, self.noiseScore)
        return log_z(self.score, self.noiseScore)

    def logProb(self, intervals, noBackward: bool = False) -> Array:
        return self.evalPath(intervals) - self.computeLogZ(noBackward=noBackward)
