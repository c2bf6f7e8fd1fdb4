"""The jitted data-parallel training step.

One XLA program per step: frames -> mel -> backbone -> scorer -> semi-CRF
NLL + attribute NLLs -> grads -> psum over the ``dp`` mesh axis -> adaptive
quantile clipping -> rectified AdaBelief.  Matches the reference semantics
(``train.py:134-254``): the loss backpropagated is ``(-logp.sum(-1).mean())/50``
per worker and gradients are SUMMED (not averaged) across workers, with
stability coming from the quantile clip.

The step is model-generic: ``make_train_step`` takes a ``loss_fn`` so either
model generation trains through the same step (the reference resolves the
model class from the conf and trains both through one ``train.py``,
``train.py:47-49``).  V1's BatchNorm runs in train mode with mutated running
statistics carried in the train state; under the mesh its batch statistics
are synchronized across shards by a ``pmean`` inside the kernel — the JAX
equivalent of the reference's hand-written autograd SyncBN
(``SyncBN.py:12-143``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.transkun import TransKunModule, log_prob_padded
from .optim import QuantileClipState, quantile_clip, quantile_clip_init

Array = jax.Array

# loss_fn(variables, frames, labels, dropout_key)
#   -> (logp [N, P], new_model_state dict of mutated non-param collections)
LossFn = Callable[[Any, Array, Tuple[Array, ...], Array], Tuple[Array, Any]]


class TrainState(NamedTuple):
    params: Any  # full variables dict: {"params": ..., maybe "batch_stats": ...}
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


def default_loss_fn(module: TransKunModule) -> LossFn:
    """The V2 objective (ref ``ModelTransformer.py:228-332``): no mutable
    collections."""

    def loss_fn(variables, frames, labels, key):
        logp = log_prob_padded(
            module,
            variables,
            frames,
            labels,
            rngs={"dropout": key},
            deterministic=False,
        )
        return logp, {}

    return loss_fn


def make_train_step(
    module: Optional[TransKunModule],
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    clip_quantile: float = 0.8,
    loss_scale: float = 1.0 / 50.0,
    loss_fn: Optional[LossFn] = None,
):
    """Build the jitted train step.

    With a mesh: batch inputs are sharded over ``dp``; gradients/metrics are
    psum'd; params/optimizer state replicated.  Without: single device.

    ``loss_fn`` defaults to the V2 objective on ``module``; pass a custom one
    (e.g. ``TransKunAblation.make_train_loss``) to train other model
    generations, including ones with mutable collections (BatchNorm running
    stats), which are threaded through ``TrainState.params``.

    Returns step_fn(state, frames [N,C,T,W], labels tuple, dropout_key)
    -> (state, metrics dict).
    """
    if loss_fn is None:
        loss_fn = default_loss_fn(module)

    def local_loss(params_only, model_state, frames, labels, key):
        variables = dict(model_state)
        variables["params"] = params_only
        logp, new_model_state = loss_fn(variables, frames, labels, key)
        loss = -logp.sum(-1).mean()
        return loss * loss_scale, (loss, new_model_state)

    def split_vars(variables):
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return variables["params"], model_state

    def apply_update(state: TrainState, grads, loss_sum, new_model_state, n_shards):
        params_only, old_model_state = split_vars(state.params)
        clipped, clip_state, gnorm, clip_value = quantile_clip(
            grads, state.clip_state, clip_quantile
        )
        # Non-finite guard, fully on device: if the loss or the global grad
        # norm is NaN/Inf this step, keep EVERY state leaf unchanged (params,
        # optimizer moments, clip buffer, mutable collections) so a bad batch
        # can never poison the state a later checkpoint persists.  The host
        # fetches ``finite`` with the batched metric flush and aborts — the
        # reference aborts same-step instead (``train.py:299``) but pays a
        # per-step device sync for it.
        finite = jnp.isfinite(loss_sum) & jnp.isfinite(gnorm)

        def keep_if_finite(new, old):
            return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

        updates, opt_state = optimizer.update(clipped, state.opt_state, params_only)
        new_params = keep_if_finite(
            optax.apply_updates(params_only, updates), params_only
        )
        opt_state = keep_if_finite(opt_state, state.opt_state)
        clip_state = keep_if_finite(clip_state, state.clip_state)
        variables = keep_if_finite(
            dict(new_model_state), {**new_model_state, **old_model_state}
        )
        variables["params"] = new_params
        new_state = TrainState(variables, opt_state, clip_state, state.step + 1)
        metrics = {
            "loss": loss_sum / n_shards,
            "grad_norm": gnorm,
            "clip_value": clip_value,
            "finite": finite,
        }
        return new_state, metrics

    if mesh is None:

        @jax.jit
        def step_fn(state: TrainState, frames, labels, key):
            params_only, model_state = split_vars(state.params)
            (_, (loss, new_ms)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params_only, model_state, frames, labels, key)
            new_ms = {**model_state, **new_ms}
            return apply_update(state, grads, loss, new_ms, 1)

        return step_fn

    n_dp = mesh.shape["dp"]
    batch_spec = P("dp")
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, batch_spec, batch_spec, rep),
        out_specs=rep,
        check_vma=False,
    )
    def grad_shard(params_only, model_state, frames, labels, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        (_, (loss, new_ms)), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params_only, model_state, frames, labels, key
        )
        # reference semantics: SUM of raw per-worker grads (TrainUtil.py:48).
        grads = jax.lax.psum(grads, "dp")
        loss = jax.lax.psum(loss, "dp")
        # mutable collections (BatchNorm running stats): the batch statistics
        # feeding them are already pmean'd across dp inside the kernel when
        # bn_axis_name="dp" (SyncBN), so every shard holds identical values;
        # pmean here is a synchronization no-op that makes that explicit and
        # keeps the output replicated.
        new_ms = jax.lax.pmean(new_ms, "dp")
        return grads, loss, new_ms

    @jax.jit
    def step_fn(state: TrainState, frames, labels, key):
        params_only, model_state = split_vars(state.params)
        grads, loss_sum, new_ms = grad_shard(
            params_only, model_state, frames, labels, key
        )
        new_ms = {**model_state, **new_ms}
        return apply_update(state, grads, loss_sum, new_ms, n_dp)

    return step_fn
