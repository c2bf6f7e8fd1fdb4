"""MIDI IO round-trip and event-processing tests."""

import numpy as np
import pytest

from transkun_tpu.data.midi import read_midi, write_midi
from transkun_tpu.data.note import (
    ControlChange,
    Note,
    extend_pedal,
    parse_control_change_switch,
    parse_event_all,
    resolve_overlapping,
    create_index_events,
    query_interval,
)


def test_midi_roundtrip(tmp_path):
    notes = [
        Note(0.0, 0.5, 60, 80),
        Note(0.25, 1.0, 64, 90),
        Note(0.5, 0.75, 60, 70),
        Note(0.1, 2.0, -64, 127),  # sustain pedal
        Note(1.0, 1.5, -67, 127),  # una corda
    ]
    path = str(tmp_path / "t.mid")
    write_midi(notes, path)
    mf = read_midi(path)

    tick = 1.0 / (960 * 2)  # quantization resolution at 120bpm/960ppq
    got_notes = sorted(mf.notes, key=lambda n: (n.start, n.pitch))
    want_notes = sorted([n for n in notes if n.pitch > 0], key=lambda n: (n.start, n.pitch))
    assert len(got_notes) == len(want_notes)
    for a, b in zip(got_notes, want_notes):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) <= tick
        assert abs(a.end - b.end) <= tick

    # pedals come back as CC on/off pairs
    sus = parse_control_change_switch(mf.control_changes, 64, end_t=5.0)
    assert len(sus) == 1
    assert abs(sus[0].start - 0.1) <= tick and abs(sus[0].end - 2.0) <= tick
    uc = parse_control_change_switch(mf.control_changes, 67, end_t=5.0)
    assert len(uc) == 1


def test_midi_tempo_map(tmp_path):
    """Hand-craft a file with a mid-track tempo change; absolute seconds must
    respect the tempo map."""
    import struct

    from transkun_tpu.data.midi import _track_chunk

    resolution = 480
    header = b"MThd" + struct.pack(">IHHH", 6, 1, 1, resolution)
    events = [
        (0, b"\xff\x51\x03" + struct.pack(">I", 500000)[1:]),  # 120 bpm
        (0, bytes([0x90, 60, 100])),
        (480, bytes([0x80, 60, 0])),  # 1 beat at 120bpm = 0.5 s
        (480, b"\xff\x51\x03" + struct.pack(">I", 250000)[1:]),  # 240 bpm
        (480, bytes([0x90, 62, 100])),
        (960, bytes([0x80, 62, 0])),  # 1 beat at 240bpm = 0.25 s
    ]
    path = str(tmp_path / "tempo.mid")
    with open(path, "wb") as f:
        f.write(header)
        f.write(_track_chunk(events))
    mf = read_midi(path)
    assert len(mf.notes) == 2
    n0, n1 = sorted(mf.notes, key=lambda n: n.start)
    assert abs(n0.start - 0.0) < 1e-9 and abs(n0.end - 0.5) < 1e-9
    assert abs(n1.start - 0.5) < 1e-9 and abs(n1.end - 0.75) < 1e-9


def test_pedal_extension_and_overlap():
    notes = [Note(0.0, 0.4, 60, 80), Note(1.0, 1.2, 60, 80)]
    pedal = [Note(0.3, 1.5, -64, 127)]
    ext = extend_pedal([n.copy() for n in notes], pedal)
    # first note extends to pedal release but is re-truncated at re-onset
    assert ext[0].end == 1.0
    assert ext[1].end == 1.5

    over = resolve_overlapping([Note(0.0, 1.0, 60, 80), Note(0.5, 1.5, 60, 70)])
    assert over[0].end == 0.5


def test_parse_event_all_tracks():
    notes = [Note(0.0, 0.4, 60, 80)]
    ccs = [
        ControlChange(64, 100, 0.1),
        ControlChange(64, 0, 0.3),
        ControlChange(67, 127, 0.0),
        ControlChange(67, 10, 0.2),
    ]
    events = parse_event_all(notes, ccs, extend_sustain_pedal=False)
    pitches = sorted(e.pitch for e in events)
    assert pitches == [-67, -64, 60]


def test_interval_index(rng):
    notes = [Note(float(s), float(s) + 0.5, 60, 80) for s in rng.uniform(0, 100, 200)]
    idx = create_index_events(notes)
    for qs, qe in [(10.0, 11.0), (0.0, 0.1), (99.0, 100.5), (50.0, 50.0)]:
        got = sorted(query_interval(qs, qe, idx))
        want = sorted(
            i for i, n in enumerate(notes) if n.start < qe and n.end > qs
        )
        assert got == want, (qs, qe)
