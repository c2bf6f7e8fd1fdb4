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
    with torch.no_grad():
        # random-init scores hover around 0, so the S[i,i]>0 singleton gate
        # flips on float noise for thousands of entries at full-piece scale;
        # bias the scorer MLP negative so the decode is sparse and parity is
        # about the algorithm, not about which of 30k near-ties flip
        ref.pairwiseScore.scoreMap[-1].bias -= 3.0
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


def test_transcribe_frames_parity(pair, rng):
    """V1 decode + attribute readout (pitch-embedding attribute features,
    2-logit OF head without presence, ``Model_ablation.py:157,170-178,565-640``)
    must match torch event-for-event, including lastP stitching state."""
    import torch

    from transkun_tpu.ops import frontend

    ref, ours, variables = pair
    x = (rng.normal(size=(1, 1, 4000)) * 0.3).astype(np.float32)
    frames = np.asarray(frontend.make_frame(jnp.asarray(x), 64, 256))

    with torch.no_grad():
        notes_ref, lastp_ref = ref.transcribeFrames(torch.from_numpy(frames))
    notes, lastp = ours.transcribe_frames(variables, jnp.asarray(frames))

    assert list(lastp) == list(lastp_ref)
    assert len(notes) == len(notes_ref)
    n_events = 0
    # both sides sort by (start, end, pitch); float end values a few 1e-5
    # apart can flip that order across implementations, so compare in the
    # float-stable (pitch, start) order instead
    key = lambda n: (n.pitch, n.start, n.end)
    for ns, ns_ref in zip(notes, notes_ref):
        assert len(ns) == len(ns_ref)
        n_events += len(ns)
        for a, b in zip(sorted(ns, key=key), sorted(ns_ref, key=key)):
            assert a.pitch == b.pitch
            assert a.velocity == b.velocity
            assert a.hasOnset == b.hasOnset
            assert a.hasOffset == b.hasOffset
            assert abs(a.start - b.start) < 1e-4
            assert abs(a.end - b.end) < 1e-4
    assert n_events > 0, "degenerate test: decode produced no events"


def test_transcribe_full_parity(pair, rng):
    """V1 full-piece streaming transcription (forcedStartPos chaining, no
    cross-segment merge — ``Model_ablation.py:739-816``) vs torch on a 5 s
    piece cut into 2 s segments with 1 s steps."""
    import torch

    ref, ours, variables = pair
    audio = (rng.normal(size=(5 * 4000, 1)) * 0.3).astype(np.float32)

    with torch.no_grad():
        notes_ref = ref.transcribe(
            torch.from_numpy(audio), stepInSecond=1, segmentSizeInSecond=2
        )
    notes = ours.transcribe(
        variables, audio, step_in_second=1, segment_size_in_second=2
    )

    # random-init V1 weights decode ~27k near-zero-margin events on 5 s of
    # noise; a handful (<0.1%) of Viterbi near-ties flip between torch and
    # XLA float rounding.  Require the piece-level agreement to be >=99.5%
    # with exact attribute equality on every matched pair (the exact
    # event-for-event check lives in test_transcribe_frames_parity).
    assert len(notes) > 0 and len(notes_ref) > 0
    assert abs(len(notes) - len(notes_ref)) <= 0.002 * len(notes_ref), (
        len(notes), len(notes_ref),
    )
    key = lambda n: (n.pitch, n.start, n.end)
    ours_sorted = sorted(notes, key=key)
    ref_sorted = sorted(notes_ref, key=key)
    matched = vel_equal = 0
    i = j = 0
    while i < len(ours_sorted) and j < len(ref_sorted):
        a, b = ours_sorted[i], ref_sorted[j]
        if (
            a.pitch == b.pitch
            and abs(a.start - b.start) < 2e-4
            and abs(a.end - b.end) < 2e-4
        ):
            matched += 1
            vel_equal += a.velocity == b.velocity
            i += 1
            j += 1
        elif key(a) < key(b):
            i += 1
        else:
            j += 1
    total = max(len(notes), len(notes_ref))
    assert matched >= 0.99 * total, (matched, len(notes), len(notes_ref))
    # velocity argmax over 128 near-uniform random logits is the most
    # tie-prone readout; still must agree on >=99% of matched events
    assert vel_equal >= 0.99 * matched, (vel_equal, matched)
