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


# ---------------------------------------------------------------------------
# fused MLP kernel (ops/mlp_pallas.py)
# ---------------------------------------------------------------------------


def test_fused_mlp_matches_reference(rng):
    from transkun_tpu.ops import mlp_pallas as mp

    mp.INTERPRET = jax.default_backend() != "tpu"
    try:
        x = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32) * 0.3)
        b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        out = mp.fused_mlp(x, w1, b1, w2, b2)
        ref = mp.mlp_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

        co = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
        gp = jax.grad(
            lambda *a: jnp.sum(mp.fused_mlp(*a) * co), argnums=(0, 1, 2, 3, 4)
        )(x, w1, b1, w2, b2)
        gr = jax.grad(
            lambda *a: jnp.sum(mp.mlp_reference(*a) * co), argnums=(0, 1, 2, 3, 4)
        )(x, w1, b1, w2, b2)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        mp.INTERPRET = False


def test_ffn_block_fused_flag_matches_plain(rng, monkeypatch):
    """FFNResBlock under TRANSKUN_TPU_FUSED_MLP (interpret mode) must match
    the plain path on the same params."""
    import os

    from transkun_tpu.models.layers import FFNResBlock
    from transkun_tpu.ops import mlp_pallas as mp

    blk = FFNResBlock(size=16, hidden_factor=2.0, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, True)
    plain = blk.apply(params, x, True)

    mp.INTERPRET = True
    monkeypatch.setenv("TRANSKUN_TPU_FUSED_MLP", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        fused = blk.apply(params, x, True)
    finally:
        mp.INTERPRET = False
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-5)
