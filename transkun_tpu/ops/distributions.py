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

_LIMS = (0.499, 0.501)


def _outside_unstable(probs: Array) -> Array:
    return (probs < _LIMS[0]) | (probs > _LIMS[1])


def continuous_bernoulli_log_norm(logits: Array) -> Array:
    """log C(lambda) where C is the continuous-Bernoulli normalizer."""
    probs = jax.nn.sigmoid(logits)
    safe = jnp.where(_outside_unstable(probs), probs, 0.6)  # avoid NaN branch
    x = 1.0 - 2.0 * safe
    exact = jnp.log(jnp.abs(2.0 * jnp.arctanh(x))) - jnp.log(jnp.abs(x))
    d = probs - 0.5
    taylor = jnp.log(2.0) + 4.0 / 3.0 * d**2 + 104.0 / 45.0 * d**4
    return jnp.where(_outside_unstable(probs), exact, taylor)


def continuous_bernoulli_log_prob(logits: Array, value: Array) -> Array:
    """log p(value) of CB(logits); value in [0, 1]."""
    # Bernoulli part: value*logits - softplus(logits)
    return (
        value * logits
        - jax.nn.softplus(logits)
        + continuous_bernoulli_log_norm(logits)
    )


def continuous_bernoulli_mean(logits: Array) -> Array:
    probs = jax.nn.sigmoid(logits)
    safe = jnp.where(_outside_unstable(probs), probs, 0.6)
    exact = safe / (2.0 * safe - 1.0) + 1.0 / (
        jnp.log1p(-safe) - jnp.log(safe)
    )
    d = probs - 0.5
    taylor = 0.5 + d / 3.0 + 16.0 / 45.0 * d**3
    return jnp.where(_outside_unstable(probs), exact, taylor)


def bernoulli_log_prob(logits: Array, value: Array) -> Array:
    """log p(value) of Bernoulli(logits); value in {0, 1}."""
    return value * logits - jax.nn.softplus(logits)
