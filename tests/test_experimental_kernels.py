"""Experimental (opt-in) Pallas kernels — single gating module.

These kernels are measured end-to-end LOSERS on the target chip and stay
behind env flags as documented experiments (see ARCHITECTURE.md "The
attention-core study" and docs/EXPERIMENTS.md):

* TRANSKUN_TPU_FUSED_ATTN  — fused MHA fwd+bwd (ops/attention_pallas.py)
* TRANSKUN_TPU_FUSED_SOFTMAX — 2-pass row softmax (ops/softmax_pallas.py)
* TRANSKUN_TPU_FUSED_MLP   — fused FFN (ops/mlp_pallas.py)
* TRANSKUN_TPU_FUSED_KV    — concat-fused shared-mem k/v projections

This module is their ONLY test surface: interpret-mode correctness vs the
shipped XLA formulations, so they cannot rot silently while staying out of
the default build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import attention_pallas as ap
from transkun_tpu.ops import softmax_pallas as sp


@pytest.fixture(autouse=True)
def attn_interpret_mode():
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
def test_attn_forward_matches_xla(rng, b, sq, skv, h, dh):
    d = h * dh
    q, k, v = _mk(rng, b, sq, skv, d)
    scale = 1.0 / np.sqrt(dh)
    out_p = ap.fused_attention(q, k, v, h, scale)
    out_x = ap.attention_xla(q, k, v, h, scale)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-6)


def test_attn_grads_match_xla(rng):
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


def test_attn_bf16_forward_close(rng):
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


@pytest.fixture(autouse=True)
def softmax_interpret_mode():
    sp.INTERPRET = jax.default_backend() != "tpu"
    yield
    sp.INTERPRET = False


@pytest.mark.parametrize("r,c", [(7, 13), (130, 149), (2049, 9)])
def test_softmax_forward_matches_xla(rng, r, c):
    l = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32) * 3)
    out = sp._softmax_rows(l)
    ref = jax.nn.softmax(l, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_softmax_grad_matches_xla(rng):
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


def test_fused_kv_projection_matches_default():
    """TRANSKUN_TPU_FUSED_KV=1 concat-fuses every k/v projection of a
    block's shared mem into one GEMM; outputs must match the per-block
    GEMMs (same params, fp32, all attention variants enabled)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transkun_tpu.models.layers import BasicBlock

    for enabled in [("F", "T", "All0", "0All"), ("F", "T", "FT"), ("T",)]:
        blk = BasicBlock(
            size=24, num_heads=3, hidden_factor=2.0, hidden_factor_attn=1.0,
            enabled=enabled, dropout=0.0,
        )
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 5, 7, 24)), jnp.float32
        )
        params = blk.init(jax.random.PRNGKey(1), x)
        saved = os.environ.pop("TRANSKUN_TPU_FUSED_KV", None)
        try:
            y_ref = blk.apply(params, x)  # flag OFF regardless of caller env
            os.environ["TRANSKUN_TPU_FUSED_KV"] = "1"
            y_fused = blk.apply(params, x)
        finally:
            if saved is None:
                os.environ.pop("TRANSKUN_TPU_FUSED_KV", None)
            else:
                os.environ["TRANSKUN_TPU_FUSED_KV"] = saved
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_ref), rtol=2e-5, atol=2e-5,
            err_msg=str(enabled),
        )
