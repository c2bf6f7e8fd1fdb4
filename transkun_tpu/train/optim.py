"""Optimizer stack: AdaBelief + decoupled masked weight decay + OneCycle LR
with warmup cutoff + adaptive quantile gradient clipping.

Mirrors the reference training configuration (``transkun/TrainUtil.py:82-141``,
``transkun/train.py:110,132,239-254``):

* AdaBelief (decoupled weight decay, rectified) — ``optax.adabelief`` +
  RAdam-style rectification implemented as a learning-rate gate
* weight decay masked off biases, GroupNorm params and position embeddings
* OneCycleLR(max_lr, nIter, pct_start=0.05, div_factor=20,
  final_div_factor=2), stepped only after a 500-step warmup cutoff
* gradient clipping to a running quantile of observed gradient norms
  (device-resident circular buffer; the reference keeps a 10k host deque)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params) -> Any:
    """True = decay.  Excludes biases, GroupNorm scale/bias, and the three
    position-embedding builders (ref ``TrainUtil.py:94-101``)."""

    def mask_path(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any("posEmbedBuilder" in str(k) for k in keys):
            return False
        if str(keys[-1]) == "bias":
            return False
        # GroupNorm modules are named norm{i} in DownConv
        if any(str(k).startswith("norm") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_path, params)


def onecycle_with_cutoff(
    max_lr: float,
    n_iter: int,
    pct_start: float = 0.05,
    div_factor: float = 20.0,
    final_div_factor: float = 2.0,
    warmup_cutoff: int = 500,
):
    """OneCycle cosine schedule whose clock only starts after
    ``warmup_cutoff`` steps (ref ``train.py:132,250-254``)."""
    base = optax.cosine_onecycle_schedule(
        transition_steps=n_iter,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )

    def schedule(step):
        eff = jnp.clip(step - warmup_cutoff, 0, n_iter)
        return base(eff)

    return schedule


class QuantileClipState(NamedTuple):
    buffer: jax.Array  # [maxlen] grad-norm history ring buffer
    count: jax.Array  # total values ever written (ring write pos = count % maxlen)


def quantile_clip_init(init_value: float = 40.0, maxlen: int = 10000):
    """Seed the history with ONE entry, like the reference
    ``MovingBuffer(initValue=40, maxLen=10000)`` (``TrainUtil.py:12-25``,
    ``train.py:110``): the quantile is taken over only the observed values,
    so the clip value tracks real grad norms within a few steps instead of
    staying pinned at the seed until the buffer cycles."""
    return QuantileClipState(
        buffer=jnp.zeros((maxlen,), jnp.float32).at[0].set(init_value),
        count=jnp.ones((), jnp.int32),
    )


def _masked_quantile(buffer: jax.Array, count: jax.Array, q: float) -> jax.Array:
    """np.quantile (linear interpolation) over the first ``count`` written
    slots of a ring buffer — ``np.quantile(deque, q)`` on the reference's
    growing deque (``TrainUtil.py:23-25``)."""
    maxlen = buffer.shape[0]
    n = jnp.minimum(count, maxlen)
    filled = jnp.where(jnp.arange(maxlen) < n, buffer, jnp.inf)
    s = jnp.sort(filled)
    pos = q * (n.astype(jnp.float32) - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    return s[lo] * (1.0 - frac) + s[hi] * frac


def quantile_clip(grads, state: QuantileClipState, quantile: float = 0.8):
    """Clip grads to the running ``quantile`` of past global grad norms and
    push the current norm into the history (ref ``train.py:239-244``; the
    quantile is computed BEFORE the current norm is appended, matching the
    reference's getQuantile-then-step order).

    Returns (clipped_grads, new_state, grad_norm, clip_value).
    """
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    clip_value = _masked_quantile(state.buffer, state.count, quantile)
    scale = jnp.minimum(1.0, clip_value / (norm + 1e-6))
    clipped = jax.tree.map(lambda g: g * scale, grads)
    maxlen = state.buffer.shape[0]
    new_state = QuantileClipState(
        buffer=state.buffer.at[state.count % maxlen].set(norm),
        count=state.count + 1,
    )
    return clipped, new_state, norm, clip_value


def _rectification_gate(step, b2):
    """RAdam/AdaBelief ``rectify=True``: scale the update by the variance
    rectification term; freeze the adaptive step while rho <= 4."""
    t = step.astype(jnp.float32) + 1.0
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    b2t = jnp.power(b2, t)
    rho_t = rho_inf - 2.0 * t * b2t / (1.0 - b2t)
    rect = jnp.sqrt(
        jnp.clip(
            (rho_t - 4.0) * (rho_t - 2.0) * rho_inf
            / jnp.clip((rho_inf - 4.0) * (rho_inf - 2.0) * rho_t, 1e-8),
            0.0,
        )
    )
    return jnp.where(rho_t > 4.0, rect, 0.0)


def make_optimizer(
    params,
    max_lr: float = 2e-4,
    weight_decay: float = 1e-4,
    n_iter: int = 180000,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    warmup_cutoff: int = 500,
) -> optax.GradientTransformation:
    schedule = onecycle_with_cutoff(max_lr, n_iter, warmup_cutoff=warmup_cutoff)
    mask = weight_decay_mask(params)

    def rectified_scale():
        def init_fn(params):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update_fn(updates, state, params=None):
            lr = schedule(state.count) * _rectification_gate(state.count, b2)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            return updates, optax.ScaleByScheduleState(count=state.count + 1)

        return optax.GradientTransformation(init_fn, update_fn)

    return optax.chain(
        optax.scale_by_belief(b1=b1, b2=b2, eps=eps, eps_root=1e-16),
        optax.add_decayed_weights(weight_decay, mask=mask),
        rectified_scale(),
    )
