"""Distribution math used by the attribute heads: ContinuousBernoulli (for
sub-frame onset/offset refinement) and Bernoulli (endpoint presence).

Matches the torch.distributions semantics used by the reference model
(``transkun/ModelTransformer.py:311-317,640-643``) including the Taylor-
stabilized log-normalizer / mean near lambda = 0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# |logits| below this use the Taylor branch around lambda = 1/2
_EPS_LOGIT = 8e-3


def continuous_bernoulli_log_norm(logits: Array) -> Array:
    """log C(lambda), lambda = sigmoid(logits), computed IN LOGIT SPACE.

    Analytically ``2*arctanh(1 - 2*sigmoid(l)) = -l``, so

        log C = log|l| - log|tanh(l/2)|
              = log|l| - [log1p(-exp(-|l|)) - log1p(exp(-|l|))]

    which stays finite (and differentiable) for ANY logit — the naive
    probs-space form (ref torch.distributions semantics) hits
    ``arctanh(+-1) = +-inf`` once the sigmoid saturates in f32 (|l| > ~17),
    which is exactly where a fitted refinement head operates, and NaNs the
    whole training step through its gradient."""
    al = jnp.abs(logits)
    outside = al > _EPS_LOGIT
    safe_al = jnp.where(outside, al, 1.0)
    exact = jnp.log(safe_al) - (
        jnp.log1p(-jnp.exp(-safe_al)) - jnp.log1p(jnp.exp(-safe_al))
    )
    d = jax.nn.sigmoid(logits) - 0.5
    taylor = jnp.log(2.0) + 4.0 / 3.0 * d**2 + 104.0 / 45.0 * d**4
    return jnp.where(outside, exact, taylor)


def continuous_bernoulli_log_prob(logits: Array, value: Array) -> Array:
    """log p(value) of CB(logits); value in [0, 1]."""
    # Bernoulli part: value*logits - softplus(logits)
    return (
        value * logits
        - jax.nn.softplus(logits)
        + continuous_bernoulli_log_norm(logits)
    )


def continuous_bernoulli_mean(logits: Array) -> Array:
    """E[CB(logits)] = sigmoid(l)/tanh(l/2) - 1/l, logit-space stable (the
    probs-space form loses the -1/l term to sigmoid saturation)."""
    outside = jnp.abs(logits) > _EPS_LOGIT
    safe_l = jnp.where(outside, logits, 1.0)
    exact = jax.nn.sigmoid(safe_l) / jnp.tanh(safe_l / 2.0) - 1.0 / safe_l
    d = jax.nn.sigmoid(logits) - 0.5
    taylor = 0.5 + d / 3.0 + 16.0 / 45.0 * d**3
    return jnp.where(outside, exact, taylor)


def bernoulli_log_prob(logits: Array, value: Array) -> Array:
    """log p(value) of Bernoulli(logits); value in {0, 1}."""
    return value * logits - jax.nn.softplus(logits)
