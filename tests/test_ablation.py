"""V1 ablation model tests: shapes, finite loss, convergence, transcribe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.data.note import Note
from transkun_tpu.models.ablation import AblationConfig, TransKunAblation

TINY = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2,
    preConvSpec=[
        {"outputSize": 8, "hiddenSize": 8, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
        {"outputSize": 12, "hiddenSize": 12, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
    ],
    ctxSize=32, nLayersCtx=1, rnnHiddenSize=16, pitchEmbedSize=16,
    scoreDropoutProb=0.0, contextDropoutProb=0.0,
    velocityDropoutProb=0.0, refinedOFDropoutProb=0.0,
    segmentSizeInSecond=2.0, segmentHopSizeInSecond=1.0,
)


@pytest.fixture(scope="module")
def model_and_params():
    conf = AblationConfig.from_dict(TINY)
    model = TransKunAblation(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=33)
    return model, params


def test_init_and_log_prob(model_and_params, rng):
    model, params = model_and_params
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)
    notes = [
        [Note(0.1, 0.4, 60, 80), Note(0.5, 0.8, 64, 90)],
        [Note(0.2, 0.6, -64, 127)],
    ]
    lp = model.log_prob(params, audio, notes, max_events=8)
    assert lp.shape == (2, 90)
    assert bool(jnp.isfinite(lp).all())


def test_transcribe_runs(model_and_params, rng):
    model, params = model_and_params
    audio = (rng.normal(size=(3 * 4000, 1)) * 0.05).astype(np.float32)
    notes = model.transcribe(
        params, audio, step_in_second=1.0, segment_size_in_second=2.0
    )
    for n in notes:
        assert n.start < n.end


def test_nonzero_noise_score(model_and_params, rng):
    """Unlike V2, the V1 pairwise scorer produces a learned (nonzero) skip
    score (ref ``Layers_ablation.py:181-186``)."""
    from transkun_tpu.models.ablation import TransKunAblationModule
    from transkun_tpu.ops import frontend

    model, params = model_and_params
    audio = (rng.normal(size=(1, 4000, 1)) * 0.1).astype(np.float32)
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, 64, 256)
    s, s_skip, ctx = model.module.apply(
        params, frames, True, method=TransKunAblationModule.process_frames
    )
    assert float(jnp.abs(s_skip).max()) > 0
    t = s.shape[0]
    assert s.shape == (t, t, 90) and s_skip.shape == (t - 1, 90)
    # upper triangle (before length scaling it was zeroed; post conv may leak
    # a halo but the diag region must be populated)
    assert bool(jnp.isfinite(s).all())
