"""V2 with the pairwise-scorer ablation fallback (useInnerProductScorer=False,
ref ``ModelTransformer.py:107-109,207-211``)."""

import jax
import jax.numpy as jnp
import numpy as np

from transkun_tpu.data.note import Note
from transkun_tpu.models import ModelConfig, TransKun

TINY = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2, baseSize=8, nHead=2, nLayers=1, scoringExpansionFactor=2,
    useInnerProductScorer=False,
    segmentSizeInSecond=1.0, segmentHopSizeInSecond=0.5,
    scoreDropoutProb=0.0, contextDropoutProb=0.0, velocityDropoutProb=0.0,
    refinedOFDropoutProb=0.0,
)


def test_v2_pairwise_log_prob_and_transcribe(rng):
    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=33)
    audio = (rng.normal(size=(1, 4000, 1)) * 0.1).astype(np.float32)
    notes = [[Note(0.1, 0.4, 60, 80)]]
    lp = model.log_prob(params, audio, notes, max_events=8)
    assert lp.shape == (1, 90)
    assert bool(jnp.isfinite(lp).all())

    out = model.transcribe(params, audio[0])
    for n in out:
        assert n.start < n.end
