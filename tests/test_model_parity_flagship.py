"""Flagship-operating-point parity vs the torch reference (VERDICT round-2
missing #1): the tiny-config suite (test_model_parity.py) proves the math;
this one proves it at the PRODUCT shape — ``pretrained/2.0.conf``
(baseSize 64, nHead 8, nLayers 6, fs 44100, T=691 frames, 90 tracks) where
padding (90 -> 128 lanes, T 691 -> Pallas multiples), reduction order and
tie-breaking could diverge.  Random-init converted weights exercise the
numerics fully (the real 2.0.pt is absent from this environment).

Everything runs fp32 on CPU; minutes of torch CPU time is expected (slow).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists("/root/reference/transkun"), reason="reference absent"
    ),
]


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_loader import load_reference_transkun
    from transkun_tpu.models import ModelConfig, TransKun
    from transkun_tpu.models.config import default_conf_path
    from transkun_tpu.utils.torch_convert import convert_state_dict

    with open(default_conf_path()) as f:
        flagship = json.load(f)["Model"]["config"]

    ref_mod = load_reference_transkun()
    ref_conf = ref_mod.ModelConfig()
    for k, v in flagship.items():
        setattr(ref_conf, k, v)
    # zero dropouts (eval parity) and mildly negative scorer diag bias so the
    # random-init decode emits a realistic (not wall-to-wall) event density
    for k in (
        "scoreDropoutProb",
        "contextDropoutProb",
        "velocityDropoutProb",
        "refinedOFDropoutProb",
    ):
        setattr(ref_conf, k, 0.0)
        flagship[k] = 0.0
    torch.manual_seed(0)
    ref = ref_mod.TransKun(ref_conf)
    ref.eval()
    with torch.no_grad():
        ref.scorer.map[0].bias[-1] -= 2.0

    conf = ModelConfig.from_dict(flagship)
    ours = TransKun(conf)
    params = convert_state_dict(ref.state_dict(), conf)
    return ref, ours, params


def test_process_frames_parity_flagship(pair):
    import torch

    from transkun_tpu.ops import frontend

    ref, ours, params = pair
    rng = np.random.default_rng(7)
    fs = ours.conf.fs
    x = (rng.normal(size=(1, 1, 16 * fs)) * 0.1).astype(np.float32)
    fr = np.asarray(
        frontend.make_frame(jnp.asarray(x), ours.conf.hopSize, ours.conf.windowSize)
    )
    with torch.no_grad():
        crf_ref, ctx_ref = ref.processFramesBatch(torch.from_numpy(fr))
    s_ref = crf_ref.score.numpy()
    ctx_ref = ctx_ref.numpy()

    s, noise, ctx = ours.module.apply(
        params, jnp.asarray(fr), True, method=type(ours.module).process_frames
    )
    assert s.shape == s_ref.shape  # [T, T, N*90]
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, rtol=2e-3, atol=2e-3)
    # interval scores scale with |e-b| (up to ~691): compare with a relative
    # tolerance against the magnitude actually present
    scale = np.maximum(np.abs(s_ref), 1.0)
    err = np.abs(np.asarray(s) - s_ref) / scale
    assert float(err.max()) < 5e-3
    np.testing.assert_allclose(np.asarray(noise), crf_ref.noiseScore.numpy(), atol=1e-5)


def test_log_prob_parity_flagship(pair):
    import torch

    from transkun_tpu.data.note import Note

    ref, ours, params = pair
    rng = np.random.default_rng(3)
    fs = ours.conf.fs
    audio = (rng.normal(size=(1, 16 * fs, 1)) * 0.1).astype(np.float32)

    def mknotes():
        # fresh rng per call: ref and ours must see identical, independent
        # Note objects (torch-side code must not be able to mutate ours)
        from transkun_tpu.data.note import resolve_overlapping

        rng = np.random.default_rng(42)
        notes = []
        t = 0.05
        for i in range(80):
            start = float(t)
            dur = 0.08 + float(rng.uniform(0, 1.2))
            pitch = int(rng.integers(21, 109))
            notes.append(Note(start, min(start + dur, 15.9), pitch, int(rng.integers(1, 127))))
            t += float(rng.uniform(0.05, 0.15))
        notes.append(Note(0.5, 14.0, -64, 127))
        notes.append(Note(2.0, 9.0, -67, 127))
        return [resolve_overlapping(sorted(notes, key=lambda n: (n.pitch, n.start)))]

    with torch.no_grad():
        lp_ref = ref.log_prob(torch.from_numpy(audio), mknotes()).numpy()
    lp = np.asarray(ours.log_prob(params, audio, mknotes()))
    np.testing.assert_allclose(lp, lp_ref, rtol=2e-3, atol=0.05)


def test_transcribe_full_parity_flagship(pair):
    """Note-event equality on a ~40 s piece (5 stitched segments with
    forcedStartPos chaining, merge logic, pedals) at the flagship shape."""
    import torch

    ref, ours, params = pair
    fs = ours.conf.fs
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=(40 * fs, 1)) * 0.1).astype(np.float32)

    with torch.no_grad():
        notes_ref = ref.transcribe(torch.from_numpy(audio))
    notes = ours.transcribe(params, audio)

    assert len(notes) == len(notes_ref), (len(notes), len(notes_ref))
    for a, b in zip(notes, notes_ref):
        assert a.pitch == b.pitch
        assert a.velocity == b.velocity
        assert abs(a.start - b.start) < 1e-3
        assert abs(a.end - b.end) < 1e-3
