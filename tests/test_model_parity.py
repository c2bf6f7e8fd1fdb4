"""Full-model parity: reference torch TransKun vs our flax TransKun with
converted weights, on identical inputs (behavioral oracle, tiny config)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/transkun"), reason="reference absent"
)


TINY = dict(
    f_min=30,
    f_max=1900,
    n_mels=32,
    segmentHopSizeInSecond=0.5,
    segmentSizeInSecond=1.0,
    hopSize=64,
    windowSize=256,
    fs=4000,
    nExtraWins=2,
    baseSize=8,
    nHead=2,
    fourierSize=16,
    nLayers=2,
    scoringExpansionFactor=2,
    scoreDropoutProb=0.0,
    contextDropoutProb=0.0,
    velocityDropoutProb=0.0,
    refinedOFDropoutProb=0.0,
)


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_loader import load_reference_transkun
    from transkun_tpu.models import ModelConfig, TransKun
    from transkun_tpu.utils.torch_convert import convert_state_dict

    ref_mod = load_reference_transkun()
    ref_conf = ref_mod.ModelConfig()
    for k, v in TINY.items():
        setattr(ref_conf, k, v)
    torch.manual_seed(0)
    ref = ref_mod.TransKun(ref_conf)
    ref.eval()

    conf = ModelConfig.from_dict(TINY)
    ours = TransKun(conf)
    params = convert_state_dict(ref.state_dict(), conf)
    return ref, ours, params


@pytest.fixture(scope="module")
def frames(pair):
    import torch

    from transkun_tpu.ops import frontend

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 1, 4000)) * 0.1).astype(np.float32)  # [N, C, nSample]
    fr = np.asarray(frontend.make_frame(jnp.asarray(x), 64, 256))
    # cross-check framing against torch path
    fr_t = torch.from_numpy(x).unfold(-1, 256, 64)
    return fr


def test_process_frames_parity(pair, frames):
    import torch

    ref, ours, params = pair
    with torch.no_grad():
        crf_ref, ctx_ref = ref.processFramesBatch(torch.from_numpy(frames))
    s_ref = crf_ref.score.numpy()
    noise_ref = crf_ref.noiseScore.numpy()
    ctx_ref = ctx_ref.numpy()

    s, noise, ctx = ours.module.apply(
        params,
        jnp.asarray(frames),
        True,
        method=type(ours.module).process_frames,
    )
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(noise), noise_ref, atol=1e-5)


def test_log_prob_parity(pair):
    import torch

    from transkun_tpu.data.note import Note

    ref, ours, params = pair
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)

    def mknotes():
        return [
            [
                Note(0.10, 0.50, 60, 80),
                Note(0.55, 0.80, 60, 90),
                Note(0.20, 0.90, 72, 70),
                Note(0.05, 0.95, -64, 127),
            ],
            [Note(0.30, 0.60, 21, 10)],
        ]

    ref_notes = mknotes()

    with torch.no_grad():
        lp_ref = ref.log_prob(torch.from_numpy(audio), ref_notes).numpy()

    lp = np.asarray(ours.log_prob(params, audio, mknotes()))
    np.testing.assert_allclose(lp, lp_ref, atol=5e-3)


def test_transcribe_frames_parity(pair, frames):
    import torch

    ref, ours, params = pair
    with torch.no_grad():
        notes_ref, lastp_ref = ref.transcribeFrames(torch.from_numpy(frames))
    notes, lastp = ours.transcribe_frames(params, jnp.asarray(frames))

    assert lastp == lastp_ref
    assert len(notes) == len(notes_ref)
    for ns, ns_ref in zip(notes, notes_ref):
        assert len(ns) == len(ns_ref)
        for a, b in zip(ns, ns_ref):
            assert a.pitch == b.pitch
            assert a.velocity == b.velocity
            assert a.hasOnset == b.hasOnset
            assert a.hasOffset == b.hasOffset
            assert abs(a.start - b.start) < 1e-4
            assert abs(a.end - b.end) < 1e-4


def test_transcribe_full_parity(pair):
    import torch

    ref, ours, params = pair
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=(3 * 4000, 1)) * 0.1).astype(np.float32)

    with torch.no_grad():
        notes_ref = ref.transcribe(torch.from_numpy(audio))
    notes = ours.transcribe(params, audio)

    assert len(notes) == len(notes_ref), (len(notes), len(notes_ref))
    for a, b in zip(notes, notes_ref):
        assert a.pitch == b.pitch
        assert a.velocity == b.velocity
        assert abs(a.start - b.start) < 1e-4
        assert abs(a.end - b.end) < 1e-4


def test_continuous_bernoulli_matches_torch():
    import torch

    from transkun_tpu.ops import distributions as dist

    logits = np.linspace(-6, 6, 101).astype(np.float32)
    logits = np.concatenate([logits, np.array([0.0, 1e-4, -1e-4], np.float32)])
    values = np.linspace(0.005, 0.995, 104).astype(np.float32)

    tdist = torch.distributions.ContinuousBernoulli(logits=torch.from_numpy(logits))
    lp_ref = tdist.log_prob(torch.from_numpy(values)).numpy()
    mean_ref = tdist.mean.numpy()

    lp = np.asarray(dist.continuous_bernoulli_log_prob(jnp.asarray(logits), jnp.asarray(values)))
    mean = np.asarray(dist.continuous_bernoulli_mean(jnp.asarray(logits)))
    np.testing.assert_allclose(lp, lp_ref, atol=1e-4)
    np.testing.assert_allclose(mean, mean_ref, atol=1e-4)
