"""Fused-attention Pallas kernel vs the XLA einsum oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import attention_pallas as ap


@pytest.fixture(autouse=True)
def interpret_mode():
    ap.INTERPRET = jax.default_backend() != "tpu"
    yield
    ap.INTERPRET = False


def _mk(rng, b, sq, skv, d, dtype=np.float32):
    q = jnp.asarray(rng.normal(size=(b, sq, d)).astype(dtype))
    k = jnp.asarray(rng.normal(size=(b, skv, d)).astype(dtype))
    v = jnp.asarray(rng.normal(size=(b, skv, d)).astype(dtype))
    return q, k, v


# shapes cover: group sizes 8/4/2/1 (b = 16, 4, 6, 5), self- and
# cross-attention, the flagship head count, odd sequence lengths
@pytest.mark.parametrize(
    "b,sq,skv,h,dh",
    [(16, 13, 13, 2, 8), (4, 9, 21, 4, 8), (6, 17, 17, 8, 32), (5, 7, 7, 1, 16)],
)
def test_forward_matches_xla(rng, b, sq, skv, h, dh):
    d = h * dh
    q, k, v = _mk(rng, b, sq, skv, d)
    scale = 1.0 / np.sqrt(dh)
    out_p = ap.fused_attention(q, k, v, h, scale)
    out_x = ap.attention_xla(q, k, v, h, scale)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-6)


def test_grads_match_xla(rng):
    b, sq, skv, h, dh = 4, 11, 11, 2, 8
    d = h * dh
    q, k, v = _mk(rng, b, sq, skv, d)
    scale = 1.0 / np.sqrt(dh)
    co = jnp.asarray(rng.normal(size=(b, sq, d)).astype(np.float32))

    def loss_p(q, k, v):
        return jnp.sum(ap.fused_attention(q, k, v, h, scale) * co)

    def loss_x(q, k, v):
        return jnp.sum(ap.attention_xla(q, k, v, h, scale) * co)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_bf16_forward_close(rng):
    b, s, h, dh = 8, 15, 4, 16
    d = h * dh
    q, k, v = _mk(rng, b, s, s, d)
    scale = 1.0 / np.sqrt(dh)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out_p = ap.fused_attention(qb, kb, vb, h, scale).astype(jnp.float32)
    out_f = ap.attention_xla(q, k, v, h, scale)
    # the kernel does fp32 softmax on bf16 inputs; compare against the fp32
    # oracle with a bf16-grade tolerance
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f), atol=0.05)


def test_mha_module_dispatch_unchanged(rng):
    """MultiHeadAttention (which now routes through ops.attention_pallas)
    still matches a hand-computed einsum attention on CPU."""
    from transkun_tpu.models.layers import MultiHeadAttention
    import math

    mha = MultiHeadAttention(embed_dim=24, num_heads=3, hidden_factor=1.0)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 24)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x)
    assert out.shape == (2, 5, 7, 24)

    p = params["params"]
    q = x @ p["q_proj"]["kernel"]
    k = x @ p["k_proj"]["kernel"]
    v = x @ p["v_proj"]["kernel"]
    hd = q.shape[-1] // 3

    def split(t):
        return jnp.swapaxes(t.reshape(*t.shape[:-1], 3, hd), -2, -3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("...qd,...kd->...qk", qh, kh) / math.sqrt(hd)
    o = jnp.einsum("...qk,...kd->...qd", jax.nn.softmax(logits, -1), vh)
    o = jnp.swapaxes(o, -2, -3).reshape(*x.shape[:-1], q.shape[-1])
    ref = o @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
