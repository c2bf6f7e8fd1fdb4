"""The jitted data-parallel training step.

One XLA program per step: frames -> mel -> backbone -> scorer -> semi-CRF
NLL + attribute NLLs -> grads -> psum over the ``dp`` mesh axis -> adaptive
quantile clipping -> rectified AdaBelief.  Matches the reference semantics
(``train.py:134-254``): the loss backpropagated is ``(-logp.sum(-1).mean())/50``
per worker and gradients are SUMMED (not averaged) across workers, with
stability coming from the quantile clip.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.transkun import TransKunModule, log_prob_padded
from .optim import QuantileClipState, quantile_clip, quantile_clip_init

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    clip_state: QuantileClipState
    step: Array


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params["params"]),
        clip_state=quantile_clip_init(),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    module: TransKunModule,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    clip_quantile: float = 0.8,
    loss_scale: float = 1.0 / 50.0,
):
    """Build the jitted train step.

    With a mesh: batch inputs are sharded over ``dp``; gradients/metrics are
    psum'd; params/optimizer state replicated.  Without: single device.

    Returns step_fn(state, frames [N,C,T,W], labels tuple, dropout_key)
    -> (state, metrics dict).
    """

    def local_loss(params, frames, labels, key):
        logp = log_prob_padded(
            module,
            params,
            frames,
            labels,
            rngs={"dropout": key},
            deterministic=False,
        )
        loss = -logp.sum(-1).mean()
        return loss * loss_scale, loss

    def apply_update(state: TrainState, grads, loss_sum, n_shards):
        grads = grads["params"]
        clipped, clip_state, gnorm, clip_value = quantile_clip(
            grads, state.clip_state, clip_quantile
        )
        updates, opt_state = optimizer.update(
            clipped, state.opt_state, state.params["params"]
        )
        params = {"params": optax.apply_updates(state.params["params"], updates)}
        new_state = TrainState(params, opt_state, clip_state, state.step + 1)
        metrics = {
            "loss": loss_sum / n_shards,
            "grad_norm": gnorm,
            "clip_value": clip_value,
        }
        return new_state, metrics

    if mesh is None:

        @jax.jit
        def step_fn(state: TrainState, frames, labels, key):
            (_, loss), grads = jax.value_and_grad(local_loss, has_aux=True)(
                state.params, frames, labels, key
            )
            return apply_update(state, grads, loss, 1)

        return step_fn

    n_dp = mesh.shape["dp"]
    batch_spec = P("dp")
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, batch_spec, batch_spec, rep),
        out_specs=rep,
        check_vma=False,
    )
    def grad_shard(params, frames, labels, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        (_, loss), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, frames, labels, key
        )
        # reference semantics: SUM of raw per-worker grads (TrainUtil.py:48)
        grads = jax.lax.psum(grads, "dp")
        loss = jax.lax.psum(loss, "dp")
        return grads, loss

    @jax.jit
    def step_fn(state: TrainState, frames, labels, key):
        grads, loss_sum = grad_shard(state.params, frames, labels, key)
        return apply_update(state, grads, loss_sum, n_dp)

    return step_fn
