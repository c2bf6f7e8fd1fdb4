"""Additional reference-parity coverage: velocity read-out criteria,
onsetBound filtering, discardSecondHalf transcription, computeStats."""

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
    nExtraWins=2, baseSize=8, nHead=2, fourierSize=16, nLayers=2,
    scoringExpansionFactor=2, segmentHopSizeInSecond=0.5,
    segmentSizeInSecond=1.0, scoreDropoutProb=0.0, contextDropoutProb=0.0,
    velocityDropoutProb=0.0, refinedOFDropoutProb=0.0,
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
    torch.manual_seed(3)
    ref = ref_mod.TransKun(ref_conf)
    ref.eval()
    conf = ModelConfig.from_dict(TINY)
    ours = TransKun(conf)
    params = convert_state_dict(ref.state_dict(), conf)
    return ref, ours, params


@pytest.fixture(scope="module")
def frames(rng_module=None):
    from transkun_tpu.ops import frontend

    rng = np.random.default_rng(17)
    x = (rng.normal(size=(2, 1, 4000)) * 0.1).astype(np.float32)
    return np.asarray(frontend.make_frame(jnp.asarray(x), 64, 256))


@pytest.mark.parametrize("criterion", ["mse", "match", "mae"])
def test_velocity_criteria_parity(pair, frames, criterion):
    import torch

    ref, ours, params = pair
    with torch.no_grad():
        notes_ref, _ = ref.transcribeFrames(
            torch.from_numpy(frames), velocityCriteron=criterion
        )
    notes, _ = ours.transcribe_frames(
        params, jnp.asarray(frames), velocity_criterion=criterion
    )
    # sort by pitch+rounded times: with random weights many starts are
    # near-identical floats, making the (start, end, pitch) sort unstable
    key = lambda n: (n.pitch, round(n.start, 4), round(n.end, 4))
    for ns, ns_ref in zip(notes, notes_ref):
        assert len(ns) == len(ns_ref)
        for a, b in zip(sorted(ns, key=key), sorted(ns_ref, key=key)):
            assert a.pitch == b.pitch
            assert abs(float(a.velocity) - float(b.velocity)) < (
                0.02 if criterion == "mse" else 0.5
            ), criterion


def test_onset_bound_parity(pair, frames):
    import torch

    ref, ours, params = pair
    with torch.no_grad():
        notes_ref, lastp_ref = ref.transcribeFrames(
            torch.from_numpy(frames), onsetBound=30
        )
    notes, lastp = ours.transcribe_frames(
        params, jnp.asarray(frames), onset_bound=30
    )
    assert lastp == lastp_ref
    for ns, ns_ref in zip(notes, notes_ref):
        assert len(ns) == len(ns_ref)


def test_discard_second_half_transcribe_parity(pair):
    import torch

    ref, ours, params = pair
    rng = np.random.default_rng(23)
    audio = (rng.normal(size=(3 * 4000, 1)) * 0.1).astype(np.float32)
    with torch.no_grad():
        notes_ref = ref.transcribe(torch.from_numpy(audio), discardSecondHalf=True)
    notes = ours.transcribe(params, audio, discard_second_half=True)
    assert len(notes) == len(notes_ref)
    key = lambda n: (n.pitch, round(n.start, 4), round(n.end, 4))
    for a, b in zip(sorted(notes, key=key), sorted(notes_ref, key=key)):
        assert a.pitch == b.pitch and abs(a.start - b.start) < 1e-4


def test_compute_stats_parity(pair):
    import torch

    from transkun_tpu.data.note import Note

    ref, ours, params = pair
    rng = np.random.default_rng(29)
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)

    def mknotes():
        return [
            [Note(0.10, 0.50, 60, 80), Note(0.55, 0.80, 60, 90)],
            [Note(0.30, 0.60, 21, 10), Note(0.1, 0.9, -64, 127)],
        ]

    with torch.no_grad():
        stats_ref = ref.computeStats(torch.from_numpy(audio), mknotes())
    stats = ours.compute_stats(params, audio, mknotes())
    for key in ("nGT", "nEst", "nCorrect", "nGTFramewise", "nEstFramewise",
                "nCorrectFramewise"):
        assert stats[key] == stats_ref[key], key
    assert abs(stats["seVelocityForced"] - stats_ref["seVelocityForced"]) < 2e-2
    assert abs(stats["seOFForced"] - stats_ref["seOFForced"]) < 2e-3
