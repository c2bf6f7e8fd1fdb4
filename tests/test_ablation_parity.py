"""V1 ablation model parity vs the torch reference with converted weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/transkun"), reason="reference absent"
)

TINY = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2,
    preConvSpec=[
        {"outputSize": 8, "hiddenSize": 8, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
        {"outputSize": 12, "hiddenSize": 12, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
    ],
    ctxSize=32, nLayersCtx=2, rnnHiddenSize=16, pitchEmbedSize=16,
    scoreDropoutProb=0.0, contextDropoutProb=0.0,
    velocityDropoutProb=0.0, refinedOFDropoutProb=0.0,
)


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_loader import load_reference_transkun

    load_reference_transkun()  # installs stubs + sys.path
    import transkun.Model_ablation as ref_mod

    from transkun_tpu.models.ablation import AblationConfig, TransKunAblation
    from transkun_tpu.utils.torch_convert import convert_state_dict_ablation

    ref_conf = ref_mod.ModelConfig()
    for k, v in TINY.items():
        setattr(ref_conf, k, v)
    torch.manual_seed(0)
    ref = ref_mod.TransKun(ref_conf)
    ref.eval()

    conf = AblationConfig.from_dict(TINY)
    ours = TransKunAblation(conf)
    variables = convert_state_dict_ablation(ref.state_dict(), conf)
    return ref, ours, variables


def test_process_frames_parity(pair, rng):
    import torch

    from transkun_tpu.models.ablation import TransKunAblationModule
    from transkun_tpu.ops import frontend

    ref, ours, variables = pair
    x = (rng.normal(size=(2, 1, 4000)) * 0.1).astype(np.float32)
    frames = np.asarray(frontend.make_frame(jnp.asarray(x), 64, 256))

    with torch.no_grad():
        crf_ref, ctx_ref = ref.processFramesBatch(torch.from_numpy(frames))
    s_ref = crf_ref.score.numpy()
    noise_ref = crf_ref.noiseScore.numpy()
    ctx_ref = ctx_ref.numpy()  # [T, N, C] time-major

    s, s_skip, ctx = ours.module.apply(
        frames=jnp.asarray(frames),
        method=TransKunAblationModule.process_frames,
        variables=variables,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ctx, 0, 1)), ctx_ref, atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(s_skip), noise_ref, atol=3e-3)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=3e-2, rtol=1e-3)


def test_log_prob_parity(pair, rng):
    import torch

    from transkun_tpu.data.note import Note

    ref, ours, variables = pair
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)

    def mknotes():
        return [
            [Note(0.10, 0.50, 60, 80), Note(0.55, 0.80, 60, 90),
             Note(0.05, 0.95, -64, 127)],
            [Note(0.30, 0.60, 21, 10)],
        ]

    with torch.no_grad():
        lp_ref = ref.log_prob(torch.from_numpy(audio), mknotes()).numpy()
    lp = np.asarray(ours.log_prob(variables, audio, mknotes(), max_events=8))
    np.testing.assert_allclose(lp, lp_ref, atol=2e-2, rtol=1e-4)
