"""Pallas kernel correctness vs the scan oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import semicrf
from transkun_tpu.ops import semicrf_pallas as sp


@pytest.fixture(autouse=True)
def interpret_mode():
    sp.INTERPRET = jax.default_backend() != "tpu"
    yield
    sp.INTERPRET = False


@pytest.mark.parametrize("t,nb", [(10, 3), (40, 7), (100, 130)])
def test_viterbi_tables_match_scan(rng, t, nb):
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))
    ptr_p, diag_p = sp.viterbi_backward_tables(s, n)
    ptr_s, diag_s = semicrf.viterbi_backward_tables(s, n)
    np.testing.assert_array_equal(np.asarray(ptr_p), np.asarray(ptr_s))
    np.testing.assert_array_equal(np.asarray(diag_p), np.asarray(diag_s))


@pytest.mark.parametrize("t,nb", [(10, 3), (40, 7)])
@pytest.mark.quick
def test_alpha_and_logz_match_scan(rng, t, nb):
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))
    v_p = sp.alpha_table(s, n)
    v_s = semicrf._alpha_scan(s, n)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_s), atol=2e-4)

    lz_p = sp.log_z(s, n)
    lz_s = semicrf.log_z(s, n)
    np.testing.assert_allclose(np.asarray(lz_p), np.asarray(lz_s), atol=2e-4)


def test_logz_gradients_match_scan(rng):
    t, nb = 24, 4
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))
    gp = jax.grad(lambda a, b: sp.log_z(a, b).sum(), argnums=(0, 1))(s, n)
    gs = jax.grad(lambda a, b: semicrf.log_z(a, b).sum(), argnums=(0, 1))(s, n)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-3)


def test_log_z_padded_backends_agree_on_noise_grad(rng):
    """The scan fallback of log_z_padded_best must return the SAME noise
    cotangent as the Pallas path: zero on padding rows (the padded skip
    chain otherwise gets marginal ~1)."""
    t, nb = 13, 3
    t_pad, nb_pad = 16, 128
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))
    s_pad, noise_pad = _pad_like_producer(s, n, t_pad, nb_pad)

    def via_pallas(nz):
        return sp.log_z_padded(t, s_pad, nz)[:nb].sum()

    def via_scan(nz):
        return semicrf.log_z_padded_best(t, s_pad, nz)[:nb].sum()

    g_pallas = jax.grad(via_pallas)(noise_pad)
    g_scan = jax.grad(via_scan)(noise_pad)  # CPU backend -> scan fallback
    np.testing.assert_allclose(
        np.asarray(g_scan), np.asarray(g_pallas), atol=1e-4
    )
    # padding rows must be exactly zero in both
    np.testing.assert_array_equal(np.asarray(g_scan[t - 1 :]), 0.0)


@pytest.mark.parametrize("t,nb", [(10, 3), (40, 7)])
def test_beta_table_matches_scan(rng, t, nb):
    """The column-stripe beta kernel equals the scan flip-trick backward."""
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))
    _, _, q_scan = semicrf._forward_backward(s, n)
    _, _, q_pallas = sp._forward_backward(s, n)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_scan), atol=2e-4)


def _pad_like_producer(s, n_noise, t_pad, nb_pad):
    """NEG-pad score + zero-pad noise the way the fused scorer emission does."""
    t, _, nb = s.shape
    s_pad = jnp.pad(
        s, ((0, t_pad - t), (0, t_pad - t), (0, nb_pad - nb)),
        constant_values=sp.NEG,
    )
    noise_pad = jnp.pad(n_noise, ((0, t_pad - t + 1), (0, nb_pad - nb)))
    return s_pad, noise_pad


def test_log_z_padded_matches_unpadded(rng):
    """log_z_padded on producer-padded inputs == scan log_z on real inputs,
    value and gradients; padded-lane logZ is exactly 0."""
    t, nb = 21, 5
    t_pad, nb_pad = 24, 128  # the kernels require full lane blocks
    s = jnp.asarray(rng.normal(size=(t, t, nb)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(t - 1, nb)).astype(np.float32))

    def padded_sum(a, b):
        s_pad, noise_pad = _pad_like_producer(a, b, t_pad, nb_pad)
        lz = sp.log_z_padded(t, s_pad, noise_pad)
        return lz[:nb].sum(), lz

    (_, lz_pad), gp = jax.value_and_grad(padded_sum, argnums=(0, 1), has_aux=True)(s, n)
    lz_ref, gs = jax.value_and_grad(
        lambda a, b: semicrf.log_z(a, b).sum(), argnums=(0, 1)
    )(s, n)
    np.testing.assert_allclose(np.asarray(lz_pad[:nb]).sum(), float(lz_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lz_pad[nb:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-3)
