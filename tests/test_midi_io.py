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


@pytest.mark.quick
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


# -- raw-SMF edge cases (hand-built byte streams) ---------------------------


def _vlq(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def _track(events):
    """events: list of (delta_ticks, payload bytes)"""
    import struct

    data = bytearray()
    for dt, payload in events:
        data += _vlq(dt) + payload
    data += _vlq(0) + b"\xff\x2f\x00"
    return b"MTrk" + struct.pack(">I", len(data)) + bytes(data)


def _smf(tracks, fmt=1, division=480):
    import struct

    return (
        b"MThd"
        + struct.pack(">IHHH", 6, fmt, len(tracks), division)
        + b"".join(tracks)
    )


def test_format0_single_track(tmp_path):
    # format-0: meta + channel events in ONE track
    trk = _track(
        [
            (0, b"\xff\x51\x03" + (500000).to_bytes(3, "big")),
            (0, bytes([0x90, 60, 100])),
            (480, bytes([0x80, 60, 0])),  # one beat = 0.5 s at 120 bpm
        ]
    )
    p = tmp_path / "f0.mid"
    p.write_bytes(_smf([trk], fmt=0))
    mf = read_midi(str(p))
    assert len(mf.notes) == 1
    n = mf.notes[0]
    assert n.pitch == 60 and n.velocity == 100
    assert abs(n.start - 0.0) < 1e-9 and abs(n.end - 0.5) < 1e-9


def test_running_status_across_channels(tmp_path):
    # running status persists until a new status byte, including across
    # same-status repeats; channel changes require a new status byte
    trk = _track(
        [
            (0, bytes([0x90, 60, 100])),
            (10, bytes([62, 100])),        # running status: note-on ch0
            (10, bytes([0x91, 64, 100])),  # new status: note-on ch1
            (10, bytes([65, 100])),        # running status: note-on ch1
            (10, bytes([0x80, 60, 0])),
            (0, bytes([62, 0])),           # running status: note-off ch0
            (0, bytes([0x81, 64, 0])),
            (0, bytes([65, 0])),           # running status: note-off ch1
        ]
    )
    p = tmp_path / "rs.mid"
    p.write_bytes(_smf([trk]))
    mf = read_midi(str(p))
    assert sorted(n.pitch for n in mf.notes) == [60, 62, 64, 65]
    # all four closed by their channel's note-offs
    assert all(n.end > n.start for n in mf.notes)


def test_simultaneous_same_pitch_on_off(tmp_path):
    # off at the same tick as a new on must close the OLD note, keep the new
    trk = _track(
        [
            (0, bytes([0x90, 60, 100])),
            (480, bytes([0x90, 60, 90])),  # re-onset at t of the off below
            (0, bytes([0x80, 60, 0])),     # same tick: closes the OLD note
            (480, bytes([0x80, 60, 0])),
        ]
    )
    p = tmp_path / "sim.mid"
    p.write_bytes(_smf([trk]))
    mf = read_midi(str(p))
    assert len(mf.notes) == 2
    a, b = sorted(mf.notes, key=lambda n: n.start)
    assert abs(a.start - 0.0) < 1e-9 and abs(a.end - 0.5) < 1e-9
    assert a.velocity == 100
    assert abs(b.start - 0.5) < 1e-9 and abs(b.end - 1.0) < 1e-9
    assert b.velocity == 90


def test_dangling_note_on_held_to_track_end(tmp_path):
    trk = _track(
        [
            (0, bytes([0x90, 60, 100])),
            (480, bytes([0x90, 64, 90])),   # never turned off
            (480, bytes([0x80, 60, 0])),    # file ends at tick 960
        ]
    )
    p = tmp_path / "dangle.mid"
    p.write_bytes(_smf([trk]))
    mf = read_midi(str(p))
    assert len(mf.notes) == 2
    by_pitch = {n.pitch: n for n in mf.notes}
    assert abs(by_pitch[60].end - 1.0) < 1e-9
    # dangling note-on held to the final event time (pretty_midi behavior)
    assert abs(by_pitch[64].start - 0.5) < 1e-9
    assert abs(by_pitch[64].end - 1.0) < 1e-9


def test_resolve_overlapping_vectorized_matches_scalar():
    """The >512-event numpy fast path is semantics-identical to the scalar
    loop, including same-pitch truncation chains, exact ties, and pedal
    (negative-pitch) tracks."""
    from transkun_tpu.data.note import (
        _resolve_overlapping_scalar,
        _resolve_overlapping_vec,
    )

    rng = np.random.default_rng(7)
    n = 2000
    pitches = rng.integers(0, 12, n) * 3 + 40
    pitches[:50] = -64  # pedal pseudo-track
    starts = np.round(rng.uniform(0, 30, n), 3)
    durs = np.round(rng.uniform(0.0, 1.0, n), 3)
    notes = [
        Note(float(s), float(s + d), int(p), int(v))
        for s, d, p, v in zip(starts, durs, pitches, rng.integers(1, 127, n))
    ]
    # exact duplicates and shared onsets to exercise tie handling
    notes += [n_.copy() for n_ in notes[:20]]

    a = _resolve_overlapping_scalar([n_.copy() for n_ in notes])
    b = _resolve_overlapping_vec([n_.copy() for n_ in notes])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x.start, x.end, x.pitch, x.velocity) == (
            y.start, y.end, y.pitch, y.velocity,
        )
