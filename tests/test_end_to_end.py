"""Full-pipeline integration test on a synthetic corpus: MIDI+wav ->
dataset build CLI -> training CLI (few steps, tiny model) -> transcribe CLI
-> metrics CLI.  Exercises every console entry point end to end."""

import csv
import json
import os
import sys
from collections import defaultdict

import numpy as np
import pytest
from scipy.io import wavfile

from transkun_tpu.data.midi import write_midi
from transkun_tpu.data.note import Note

FS = 4000

TINY_CONF = {
    "Model": {
        "module": "transkun_tpu.models.transkun",
        "configClassName": "Config",
        "config": {
            "f_min": 30, "f_max": 1900, "n_mels": 32,
            "hopSize": 64, "windowSize": 256, "fs": FS,
            "nExtraWins": 2, "baseSize": 8, "nHead": 2, "nLayers": 1,
            "scoringExpansionFactor": 2,
            "segmentSizeInSecond": 2.0, "segmentHopSizeInSecond": 1.0,
        },
    }
}


def _synth_piece(rng, path_wav, path_mid, dur=6.0):
    notes = []
    t = 0.25
    while t < dur - 0.6:
        pitch = int(rng.integers(40, 90))
        length = float(rng.uniform(0.2, 0.5))
        notes.append(Note(t, t + length, pitch, int(rng.integers(30, 100))))
        t += float(rng.uniform(0.3, 0.8))
    notes.append(Note(0.5, dur - 0.5, -64, 127))
    write_midi(sorted(notes, key=lambda n: (n.start, n.end, n.pitch)), path_mid)

    x = np.zeros(int(dur * FS), np.float32)
    tt = np.arange(len(x)) / FS
    for n in notes:
        if n.pitch > 0:
            f0 = 440 * 2 ** ((n.pitch - 69) / 12)
            if f0 < FS / 2:
                env = ((tt >= n.start) & (tt < n.end)).astype(np.float32)
                x += 0.1 * env * np.sin(2 * np.pi * f0 * tt).astype(np.float32)
    wavfile.write(path_wav, FS, (np.clip(x, -1, 1) * 32000).astype(np.int16))
    return notes


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("maestro")
    rng = np.random.default_rng(0)
    rows = []
    for i, split in enumerate(["train", "train", "validation", "test"]):
        year = "2020"
        os.makedirs(root / year, exist_ok=True)
        wav = f"{year}/piece{i}.wav"
        mid = f"{year}/piece{i}.midi"
        _synth_piece(rng, str(root / wav), str(root / mid), dur=6.0)
        rows.append(
            {
                "canonical_composer": "synthetic",
                "canonical_title": f"piece{i}",
                "split": split,
                "year": year,
                "midi_filename": mid,
                "audio_filename": wav,
                "duration": 6.0,
            }
        )
    meta = root / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return root, meta


def test_fused_decode_matches_fallback(corpus):
    """The fused chunk-streamed/compacted decode path and the host-walk
    fallback (forced via a 1-event budget overflow) must produce identical
    note lists on the same audio."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    root, _ = corpus
    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    fs, audio = wavfile.read(str(root / "2020" / "piece0.wav"))
    audio = (audio.astype(np.float32) / 32768.0)[:, None]

    notes_fused = model.transcribe(params, audio)

    model_fb = TransKun(conf)
    model_fb.decode_k_budget = 1  # always overflows -> host-walk fallback
    notes_fb = model_fb.transcribe(params, audio)

    assert len(notes_fused) == len(notes_fb)
    for a, b in zip(notes_fused, notes_fb):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) < 1e-9 and abs(a.end - b.end) < 1e-9
        assert a.hasOnset == b.hasOnset and a.hasOffset == b.hasOffset


def test_int16_link_path_is_lossless(corpus):
    """int16-exact audio shipped over the link as int16 (device dequantize)
    must decode to exactly the notes of the forced-f32 link path."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    root, _ = corpus
    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    fs, audio = wavfile.read(str(root / "2020" / "piece1.wav"))
    audio = (audio.astype(np.float32) / 32768.0)[:, None]  # int16-exact

    notes_i16 = model.transcribe(params, audio)
    model_f32 = TransKun(conf)
    model_f32.decode_link_int16 = False
    notes_f32 = model_f32.transcribe(params, audio)

    assert len(notes_i16) == len(notes_f32) > 0
    for a, b in zip(notes_i16, notes_f32):
        assert (a.pitch, a.velocity, a.start, a.end) == (
            b.pitch, b.velocity, b.start, b.end
        )


def test_transcribe_many_matches_per_piece(corpus):
    """The pipelined batch API must yield exactly the per-piece results, in
    order."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    root, _ = corpus
    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)

    pieces = []
    for i in range(3):
        fs, audio = wavfile.read(str(root / "2020" / f"piece{i}.wav"))
        pieces.append((audio.astype(np.float32) / 32768.0)[:, None])

    batched = list(model.transcribe_many(params, iter(pieces)))
    singles = [model.transcribe(params, p) for p in pieces]
    assert len(batched) == len(singles) == 3
    for nb, ns in zip(batched, singles):
        assert len(nb) == len(ns)
        for a, b in zip(nb, ns):
            assert (a.pitch, a.velocity, a.start, a.end) == (
                b.pitch, b.velocity, b.start, b.end
            )


def test_transcribe_many_multi_device(corpus):
    """Round-robining pieces over the 8 virtual CPU devices must produce
    per-piece-identical results in input order (the multi-chip serving
    path: each device runs its own pieces' device-local stitching chains)."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    root, _ = corpus
    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)

    pieces = []
    for i in range(4):
        fs, audio = wavfile.read(str(root / "2020" / f"piece{i}.wav"))
        pieces.append((audio.astype(np.float32) / 32768.0)[:, None])

    assert len(jax.devices()) >= 2
    multi = list(
        model.transcribe_many(params, iter(pieces), devices=jax.devices())
    )
    singles = [model.transcribe(params, p) for p in pieces]
    for nm, ns in zip(multi, singles):
        assert len(nm) == len(ns)
        for a, b in zip(nm, ns):
            assert (a.pitch, a.velocity, a.start, a.end) == (
                b.pitch, b.velocity, b.start, b.end
            )


def test_full_pipeline(corpus, tmp_path):
    root, meta = corpus

    # 1. dataset build CLI
    from transkun_tpu.cli.create_dataset_maestro import main as build_main

    out = tmp_path / "data"
    build_main([str(root), str(meta), str(out)])
    assert (out / "train.pickle").exists()

    # 2. training CLI, a few steps on the tiny model
    conf_path = tmp_path / "tiny.conf"
    with open(conf_path, "w") as f:
        json.dump(TINY_CONF, f)

    from transkun_tpu.cli.train import main as train_main

    ckpt = tmp_path / "ckpt"
    train_main(
        [
            str(ckpt),
            "--datasetPath", str(root),
            "--datasetMetaFile_train", str(out / "train.pickle"),
            "--datasetMetaFile_val", str(out / "val.pickle"),
            "--modelConf", str(conf_path),
            "--batchSize", "2",
            "--maxEpoch", "1",
            "--nDevices", "2",
            "--nIter", "100",
            "--statsEvery", "8",
            "--maxEvents", "16",
        ]
    )
    assert ckpt.exists()

    # 3. transcribe CLI with the trained checkpoint
    from transkun_tpu.cli.transcribe import main as transcribe_main

    est_dir = tmp_path / "est" / "2020"
    os.makedirs(est_dir)
    transcribe_main(
        [
            str(root / "2020" / "piece3.wav"),
            str(est_dir / "piece3.midi"),
            "--weight", str(ckpt),
            "--conf", str(conf_path),
        ]
    )
    assert (est_dir / "piece3.midi").exists()

    # 4. metrics CLI est-vs-GT
    from transkun_tpu.cli.compute_metrics import main as metrics_main

    gt_dir = tmp_path / "gt" / "2020"
    os.makedirs(gt_dir)
    import shutil

    shutil.copy(root / "2020" / "piece3.midi", gt_dir / "piece3.midi")
    out_json = tmp_path / "metrics.json"
    metrics_main(
        [str(tmp_path / "est"), str(tmp_path / "gt"), "--outputJSON", str(out_json)]
    )
    metrics = json.load(open(out_json))
    assert "note" in metrics["aggregated"]
    assert metrics["detailed"][0]["name"].endswith("piece3.midi")


def test_chunk_steps_and_group_size_variants_match(corpus):
    """Every (segment_batch, decode_chunk_steps) geometry — including
    out-of-range chunk_steps values that get clamped — decodes to the
    identical note list: the upload-chunk grid and carve offset are pure
    plumbing."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    root, _ = corpus
    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    fs, audio = wavfile.read(str(root / "2020" / "piece2.wav"))
    audio = (audio.astype(np.float32) / 32768.0)[:, None]

    ref_notes = model.transcribe(params, audio)  # defaults: sb=1, m=1
    assert len(ref_notes) > 0
    for sb, m in [(1, 3), (3, 1), (3, 2), (4, 2), (2, 0), (2, -5)]:
        m2 = TransKun(conf)
        m2.decode_chunk_steps = m
        got = m2.transcribe(params, audio, segment_batch=sb)
        assert len(got) == len(ref_notes), (sb, m)
        # re-sort by (pitch, start) and compare pairwise with a 10 us time
        # tolerance: batched (sb>1) and unbatched GEMMs reduce in different
        # orders, so refined offsets carry ~1e-7 noise that can even flip
        # the global (start, end, pitch) sort of near-simultaneous notes
        key = lambda n: (n.pitch, n.start)
        for a, b in zip(sorted(got, key=key), sorted(ref_notes, key=key)):
            assert (a.pitch, a.velocity) == (b.pitch, b.velocity), (sb, m)
            assert abs(a.start - b.start) < 1e-5, (sb, m)
            assert abs(a.end - b.end) < 1e-5, (sb, m)


def test_bound_decode_program_cache_capped():
    """The closed-over decode-program cache keys on param LEAF ids: a rebuilt
    dict around the same arrays reuses its binding (no re-trace), swapped
    leaves create new bindings, and per geometry at most 16 stay cached."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=(int(1.5 * conf.fs), 1)) * 0.05).astype(np.float32)

    def bound_keys():
        return [
            k for k in model._decode_fn
            if isinstance(k, tuple) and k and k[0] == "fused_chunk" and k[-1]
        ]

    model.transcribe(params, audio)
    for _ in range(3):
        # new dict containers around the SAME leaf arrays -> cache hit
        model.transcribe(jax.tree_util.tree_map(lambda a: a, params), audio)
    assert len(bound_keys()) == 1

    for _ in range(19):
        # new leaf arrays -> new binding each time, LRU-capped at 16
        fresh = jax.tree_util.tree_map(lambda a: a + 0, params)
        model.transcribe(fresh, audio)
    bound = bound_keys()
    assert 0 < len(bound) <= 16
    assert len(model._bound_params) == len(bound)


def test_quantize_link_auto_detect():
    """_quantize_link: int16-exact waveforms ship int16 bit-exactly; a single
    non-representable sample (even in the last block) falls back to f32; the
    forced modes behave as documented."""
    from transkun_tpu.models.transkun import _quantize_link

    rng = np.random.default_rng(0)
    n = (1 << 19) * 2 + 1000  # spans 3 traversal blocks
    ints = rng.integers(-32768, 32768, size=(1, n)).astype(np.float32)
    exact = ints / 32768.0

    q = _quantize_link(exact, None)
    assert q.dtype == np.int16 and np.array_equal(q, ints.astype(np.int16))

    # poison one sample in the LAST block -> f32 fallback
    poisoned = exact.copy()
    poisoned[0, -7] += 1e-6
    q = _quantize_link(poisoned, None)
    assert q.dtype == np.float32 and np.array_equal(q, poisoned)

    # out-of-range (>= 1.0) is not representable either
    loud = exact.copy()
    loud[0, 3] = 1.0
    assert _quantize_link(loud, None).dtype == np.float32

    assert _quantize_link(exact, False).dtype == np.float32
    forced = _quantize_link(loud, True)
    assert forced.dtype == np.int16 and forced[0, 3] == 32767  # clipped

    # int16 input passes through untouched
    i16 = ints.astype(np.int16)
    assert _quantize_link(i16, None) is i16


def test_quantize_link_trainer_scale():
    """scale=32767 (the training slicer's iinfo.max normalization, ref
    Data.py:416-419): auto-detect recovers every int16 value exactly and the
    trainer's divide-dequantize reproduces the loader floats bit-exactly."""
    from transkun_tpu.models.transkun import _quantize_link

    ints = np.arange(-32768, 32768, dtype=np.int32)
    # exactly the loader formula: np.divide(i, iinfo.max, dtype=f32)
    x = np.divide(ints, 32767, dtype=np.float32)[None, :]

    q = _quantize_link(x, None, scale=32767.0)
    assert q.dtype == np.int16
    assert np.array_equal(q[0].astype(np.int32), ints)
    # trainer dequant (cli/train.py _frame): int16 -> f32 DIVIDE by 32767
    assert np.array_equal(q.astype(np.float32) / np.float32(32767.0), x)

    # read_audio-normalized (2^15) audio is NOT 32767-exact -> f32 fallback
    y = (ints.astype(np.float32) / 32768.0)[None, :]
    assert _quantize_link(y, None, scale=32767.0).dtype == np.float32
    # and vice versa under the default decode scale
    assert _quantize_link(x, None).dtype == np.float32


def test_transcribe_boundary_piece_lengths(corpus):
    """Chunk-grid edge cases: pieces shorter than one segment, lengths
    landing exactly on segment/chunk boundaries, and one sample off either
    side must all decode fused == host-walk-fallback."""
    import math

    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    model_fb = TransKun(conf)
    model_fb.decode_k_budget = 1  # force the host-walk fallback

    step = math.ceil(conf.segmentHopSizeInSecond * conf.fs / conf.hopSize)
    step *= conf.hopSize  # samples per segment step (== chunk at sb=1)
    seg = math.ceil(conf.segmentSizeInSecond * conf.fs)
    rng = np.random.default_rng(11)
    for n in [step // 3, seg - 1, seg, seg + 1, 2 * step, 2 * step + 1,
              3 * step - 1]:
        tt = np.arange(n) / conf.fs
        x = (0.1 * np.sin(2 * np.pi * 440 * tt)).astype(np.float32)
        x += (rng.normal(size=n) * 0.01).astype(np.float32)
        x = (np.round(np.clip(x, -1, 1) * 32000) / 32768).astype(np.float32)
        audio = x[:, None]
        a = model.transcribe(params, audio)
        b = model_fb.transcribe(params, audio)
        assert len(a) == len(b), n
        for na, nb in zip(a, b):
            assert (na.pitch, na.velocity, na.start, na.end) == (
                nb.pitch, nb.velocity, nb.start, nb.end
            ), n


def test_train_device_data_matches_host_loader(corpus, tmp_path):
    """One epoch of the training CLI with the device-resident corpus
    (--deviceData on) must produce the SAME final params as the host-loader
    int16-link path: identical chunk enumeration, identical dequantize
    (same in-jit divide), identical update stream."""
    import jax

    from transkun_tpu.cli.create_dataset_maestro import main as build_main
    from transkun_tpu.cli.train import main as train_main
    from transkun_tpu.train.checkpoint import load_checkpoint

    root, meta = corpus
    out = tmp_path / "data"
    build_main([str(root), str(meta), str(out)])
    conf_path = tmp_path / "tiny.conf"
    with open(conf_path, "w") as f:
        json.dump(TINY_CONF, f)

    def run(ckpt_name, device_mode):
        ckpt = tmp_path / ckpt_name
        train_main(
            [
                str(ckpt),
                "--datasetPath", str(root),
                "--datasetMetaFile_train", str(out / "train.pickle"),
                "--datasetMetaFile_val", str(out / "val.pickle"),
                "--modelConf", str(conf_path),
                "--batchSize", "2",
                "--maxEpoch", "1",
                "--nDevices", "2",
                "--nIter", "100",
                "--statsEvery", "0",
                "--maxEvents", "16",
                "--seed", "11",
                "--deviceData", device_mode,
            ]
        )
        return load_checkpoint(str(ckpt))

    a = run("ckpt_dev", "on")
    b = run("ckpt_host", "off")
    assert int(a["step"]) == int(b["step"]) > 0
    flat_a = jax.tree_util.tree_leaves_with_path(a["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b["params"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path], err_msg=str(path))


def test_fused_decode_midpiece_overflow_fallback(corpus):
    """VERDICT r4 item 8: a piece that overflows the fused budget MID-piece
    must equal the pure host path.  First groups assemble on the fast path;
    from the first overflowing group on, the host walk resumes with the
    forcedStartPos state the device chain carried to that point (nonzero,
    because earlier groups decoded events)."""
    import jax

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import ModelConfig

    conf = ModelConfig.from_dict(TINY_CONF["Model"]["config"])
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=126)
    # random weights fire singleton events on every frame of every track,
    # which overflows ANY budget at group 0; bias the scorer diagonal
    # negative (as bench.py does) so decoded counts are storm-driven
    bias = np.asarray(params["params"]["scorer"]["map"]["bias"]).copy()
    bias[-1] = -8.0
    params["params"]["scorer"]["map"]["bias"] = bias

    # a ~50 note/s storm with drifting density so group event counts vary
    rng = np.random.default_rng(3)
    dur = 10.0
    x = np.zeros(int(dur * FS), np.float32)
    tt = np.arange(len(x)) / FS
    t = 0.1
    while t < dur - 0.3:
        f0 = 440 * 2 ** ((int(rng.integers(40, 90)) - 69) / 12)
        if f0 < FS / 2:
            env = ((tt >= t) & (tt < t + 0.12)).astype(np.float32)
            x += 0.08 * env * np.sin(2 * np.pi * f0 * tt).astype(np.float32)
        t += 0.015 + 0.02 * (t / dur)  # densest at the start of the piece
    audio = np.clip(x, -1, 1)[:, None]
    audio = np.round(audio * 32768).clip(-32768, 32767) / np.float32(32768)
    audio = audio.astype(np.float32)

    # discover per-group compact event counts with the roomy default budget
    model.transcribe(params, audio)
    counts = model.last_transcribe_group_counts
    assert model.last_transcribe_fallback_from is None
    later_max = max(counts[1:])
    # a budget that passes group 0 but trips a later group mid-piece
    assert counts[0] < later_max, counts
    budget = max(counts[0], later_max - 1)

    m_mid = TransKun(conf)
    m_mid.decode_k_budget = budget
    notes_mid = m_mid.transcribe(params, audio)
    fb = m_mid.last_transcribe_fallback_from
    assert fb is not None and fb > 0, (fb, counts, budget)
    # the fused prefix really decoded events => the carried start positions
    # at the fallback boundary were nonzero
    assert any(n.start < fb * conf.segmentHopSizeInSecond for n in notes_mid)

    m_host = TransKun(conf)
    m_host.decode_k_budget = 1  # overflows at group 0 -> pure host path
    notes_host = m_host.transcribe(params, audio)
    assert m_host.last_transcribe_fallback_from == 0

    assert len(notes_mid) == len(notes_host) > 0
    # the fused path computes event times as f32 frame*hop on device; the
    # host walk multiplies in f64 — times agree only to ~1e-6 s, which can
    # flip the global (start, pitch) sort between the two lists.  Same-pitch
    # notes are always >= a frame (8 ms) apart after resolve_overlapping, so
    # pair them per pitch by order and compare with a 1e-4 s tolerance.
    def by_pitch(notes):
        d = defaultdict(list)
        for n in notes:
            d[n.pitch].append(n)
        return d

    mid_p, host_p = by_pitch(notes_mid), by_pitch(notes_host)
    assert set(mid_p) == set(host_p)
    for p in mid_p:
        assert len(mid_p[p]) == len(host_p[p]), p
        for a, b in zip(mid_p[p], host_p[p]):
            assert (a.velocity, a.hasOnset, a.hasOffset) == (
                b.velocity, b.hasOnset, b.hasOffset
            ), p
            assert abs(a.start - b.start) < 1e-4, (p, a.start, b.start)
            assert abs(a.end - b.end) < 1e-4, (p, a.end, b.end)


def test_maestro_v3_json_pipeline(tmp_path):
    """MAESTRO-readiness dry run (VERDICT r4 item 9): a fabricated mini
    MAESTRO v3 tree — column-major json metadata exactly as shipped in
    ``maestro-v3.0.0.json`` (string-int row keys, int ``year``), STEREO
    wavs, real split names and v3-style filenames — through the full
    production loop:
    dataset-build CLI (json dispatch) -> training CLI -> transcribe CLI ->
    metrics CLI.  Proves nothing stumbles on v3 metadata shape or stereo
    audio the day real data appears."""
    root = tmp_path / "maestro-v3.0.0"
    rng = np.random.default_rng(5)
    cols = {k: {} for k in (
        "canonical_composer", "canonical_title", "split", "year",
        "midi_filename", "audio_filename", "duration",
    )}
    for i, split in enumerate(["train", "train", "validation", "test"]):
        year = 2017 + i
        os.makedirs(root / str(year), exist_ok=True)
        wav = f"{year}/MIDI-Unprocessed_{i:02d}_R1_2017_wav.wav"
        mid = f"{year}/MIDI-Unprocessed_{i:02d}_R1_2017_wav.midi"
        notes = _synth_piece(rng, str(root / wav), str(root / mid), dur=6.0)
        # rewrite as stereo: decorrelate the channels slightly so a
        # mono-only reader would produce different samples than either
        fs, mono = wavfile.read(str(root / wav))
        right = np.roll(mono, 7)
        wavfile.write(str(root / wav), fs,
                      np.stack([mono, right], axis=1))
        row = str(i)
        cols["canonical_composer"][row] = "synthetic"
        cols["canonical_title"][row] = f"piece {i}"
        cols["split"][row] = split
        cols["year"][row] = year  # int in v3, not str
        cols["midi_filename"][row] = mid
        cols["audio_filename"][row] = wav
        cols["duration"][row] = 6.0
    meta = root / "maestro-v3.0.0.json"
    with open(meta, "w") as f:
        json.dump(cols, f)

    # 1. dataset build CLI dispatches on the .json extension
    from transkun_tpu.cli.create_dataset_maestro import main as build_main

    out = tmp_path / "data"
    build_main([str(root), str(meta), str(out)])
    for name, n in [("train", 2), ("val", 1), ("test", 1)]:
        assert (out / f"{name}.pickle").exists()
    import pickle

    with open(out / "train.pickle", "rb") as f:
        train_rows = pickle.load(f)
    assert len(train_rows) == 2
    assert train_rows[0]["nChannel"] == 2
    assert train_rows[0]["fs"] == FS

    # 2. a few training steps through the production trainer (stereo chunks)
    conf_path = tmp_path / "tiny.conf"
    with open(conf_path, "w") as f:
        json.dump(TINY_CONF, f)

    from transkun_tpu.cli.train import main as train_main

    ckpt = tmp_path / "ckpt"
    train_main(
        [
            str(ckpt),
            "--datasetPath", str(root),
            "--datasetMetaFile_train", str(out / "train.pickle"),
            "--datasetMetaFile_val", str(out / "val.pickle"),
            "--modelConf", str(conf_path),
            "--batchSize", "2",
            "--maxEpoch", "1",
            "--nDevices", "2",
            "--nIter", "100",
            "--statsEvery", "0",
            "--maxEvents", "16",
            "--stopAtStep", "6",
        ]
    )
    assert ckpt.exists()

    # 3. transcribe the held-out stereo test piece with the checkpoint
    from transkun_tpu.cli.transcribe import main as transcribe_main

    est_dir = tmp_path / "est" / "2020"
    os.makedirs(est_dir)
    test_wav = cols["audio_filename"]["3"]
    transcribe_main(
        [
            str(root / test_wav),
            str(est_dir / "piece3.midi"),
            "--weight", str(ckpt),
            "--conf", str(conf_path),
        ]
    )

    # 4. metrics CLI est-vs-GT runs end to end on the result
    from transkun_tpu.cli.compute_metrics import main as metrics_main

    gt_dir = tmp_path / "gt" / "2020"
    os.makedirs(gt_dir)
    import shutil

    shutil.copy(root / cols["midi_filename"]["3"], gt_dir / "piece3.midi")
    out_json = tmp_path / "metrics.json"
    metrics_main(
        [str(tmp_path / "est"), str(tmp_path / "gt"),
         "--outputJSON", str(out_json)]
    )
    metrics = json.load(open(out_json))
    assert "note" in metrics["aggregated"]
