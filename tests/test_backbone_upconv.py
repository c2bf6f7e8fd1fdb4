"""Parity for the full upConv1d upsample path (upsampleProjOnly=False).

The reference never enables this in a shipped config — it is a latent
Backbone capability (``LayersTransformer.py:522-534,645-646``) — so parity
is proven at the Backbone level: torch Backbone(upsampleProjOnly=False,
expansionFactor=1) vs our flax Backbone with converted weights.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/transkun"), reason="reference absent"
)


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_loader import load_reference_transkun

    load_reference_transkun()  # installs stubs + sys.path
    from transkun.LayersTransformer import Backbone as RefBackbone

    from transkun_tpu.models.backbone import Backbone
    from transkun_tpu.utils.torch_convert import convert_backbone

    torch.manual_seed(3)
    ref = RefBackbone(
        inputSize=3,
        baseSize=8,
        posEmbedInitGamma=1.0,
        nHead=2,
        fourierSize=16,
        hiddenFactor=2,
        hiddenFactorAttn=1,
        expansionFactor=1,
        dropoutProb=0.0,
        nLayers=2,
        enabledAttn=["F", "T"],
        useGradientCheckpoint=False,
        downsampleF=True,
        upsampleProjOnly=False,
    )
    ref.eval()

    ours = Backbone(
        input_size=3,
        base_size=8,
        pos_embed_init_gamma=1.0,
        n_head=2,
        hidden_factor=2,
        hidden_factor_attn=1,
        expansion_factor=1,
        dropout=0.0,
        n_layers=2,
        enabled_attn=("F", "T"),
        use_gradient_checkpoint=False,
        downsample_f=True,
        upsample_proj_only=False,
    )
    sd = {
        "backbone." + k: v.detach().numpy() for k, v in ref.state_dict().items()
    }
    params = {"params": convert_backbone(sd)}
    return ref, ours, params


def test_upconv_full_path_parity(pair):
    import torch

    ref, ours, params = pair
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 33, 32, 3)).astype(np.float32)
    idx = np.arange(21, 26, dtype=np.float32)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(idx)).numpy()

    out = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(idx), True)
    )
    assert out.shape == out_ref.shape, (out.shape, out_ref.shape)
    scale = np.abs(out_ref).max() + 1e-6
    assert np.max(np.abs(out - out_ref)) / scale < 2e-5


def test_upconv_requires_expansion_one(pair):
    """expansion_factor != 1 with the full path must fail loudly (the skip
    and the conv stack land on different channel counts, ref ``:533,646``)."""
    from transkun_tpu.models.backbone import Backbone

    bad = Backbone(
        input_size=3,
        base_size=8,
        pos_embed_init_gamma=1.0,
        n_head=2,
        expansion_factor=2,
        n_layers=1,
        upsample_proj_only=False,
        use_gradient_checkpoint=False,
    )
    x = jnp.zeros((1, 17, 32, 3))
    idx = jnp.arange(21, 23, dtype=jnp.float32)
    with pytest.raises(AssertionError):
        bad.init(jax.random.PRNGKey(0), x, idx, True)
