"""Pallas row-softmax kernel vs jax.nn.softmax (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import softmax_pallas as sp


@pytest.fixture(autouse=True)
def interpret_mode():
    sp.INTERPRET = jax.default_backend() != "tpu"
    yield
    sp.INTERPRET = False


@pytest.mark.parametrize("r,c", [(7, 13), (130, 149), (2049, 9)])
def test_forward_matches_xla(rng, r, c):
    l = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32) * 3)
    out = sp._softmax_rows(l)
    ref = jax.nn.softmax(l, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_grad_matches_xla(rng):
    l = jnp.asarray(rng.normal(size=(33, 21)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(33, 21)).astype(np.float32))
    g_p = jax.grad(lambda x: jnp.sum(sp._softmax_rows(x) * co))(l)
    g_x = jax.grad(lambda x: jnp.sum(jax.nn.softmax(x, axis=-1) * co))(l)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-6)


def test_softmax_last_nd(rng):
    l = jnp.asarray(rng.normal(size=(3, 4, 5, 11)).astype(np.float32))
    sp.INTERPRET = True
    # force the pallas path regardless of backend gating
    out = sp._softmax_rows(l.reshape(-1, 11)).reshape(l.shape)
    ref = jax.nn.softmax(l, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bf16_row_stats_fp32(rng):
    l32 = jnp.asarray(rng.normal(size=(16, 33)).astype(np.float32) * 8)
    out = sp._softmax_rows(l32.astype(jnp.bfloat16)).astype(jnp.float32)
    ref = jax.nn.softmax(l32, axis=-1)
    # bf16 input quantization alone causes ~1% relative error on exp values
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.08, atol=0.01)
