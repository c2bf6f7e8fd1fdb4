"""Generate a flagship-scale synthetic piano corpus in MAESTRO layout.

Produces wav (44.1 kHz mono int16) + MIDI pairs with a meta.csv, then builds
the {train,val,test}.pickle annotation files through the real dataset-build
CLI — so a full-scale training run exercises the exact production pipeline
(MIDI parse -> pedal extension -> interval index -> chunk iterator).

The synth is piano-ish on purpose: per-note harmonic stacks with 1/k^2
rolloff, exponential decay driven by velocity, chords and overlapping
polyphony, and sustain-pedal (CC64) segments so the pedal event tracks get
real supervision.  It is NOT meant to sound like a piano — it is meant to
give the flagship model a learnable, polyphonic, pedal-bearing target at the
exact operating shape of the shipped config (fs 44100, 16 s segments,
90 tracks).

Usage: python scripts/make_synth_corpus.py OUTDIR [--train 20 --val 3
       --test 3 --dur 60]
"""

import argparse
import csv
import os
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from transkun_tpu.data.note import Note, resolve_overlapping  # noqa: E402

FS = 44100


def synth_piece(
    rng: np.random.Generator,
    dur: float,
    sustain: bool = True,
    n_partials: int = 6,
    pitch_lo: int = 36,
    pitch_hi: int = 96,
    fs: int = FS,
):
    """Random polyphonic piece: returns (float32 audio, note list).

    With ``sustain=True`` the pedal is rendered acoustically, so pedal events
    are OBSERVABLE from the audio (round-3 corpora did not render it, making
    pedal F1 zero by construction):

    - notes whose key-release falls inside a CC64 segment keep ringing until
      the pedal release (the same extension rule the label pipeline applies,
      ``data/note.py:extend_pedal`` / ref ``Data.py:130-168``), then damp
      over 30 ms — pedal release is audible as the simultaneous damping of
      every ringing tail;
    - pedal press/release each add a faint low-passed mechanical thump
      (dampers lifting off / returning to the strings — the cue real models
      pick up in MAESTRO recordings).

    ``n_partials``/``pitch_lo``/``pitch_hi`` tune identifiability and pitch
    balance.  Round-5 error analysis (scripts/error_analysis.py on the
    round-4 fine-tune) found 2/3 of all onset errors were +-1..5-semitone
    substitutions in the bass register: with only 6 partials at 1/k^2
    rolloff, adjacent bass semitones are ~1 FFT bin apart even at the 6th
    harmonic — unresolvable by construction, unlike a real piano's 20+
    partials.  The bass was also undersampled (center ~ U(36,96) leaves
    pitch<45 at 14% of onsets).  Pass ``n_partials=16, pitch_lo=24,
    pitch_hi=105`` for a corpus whose bass is identifiable and balanced."""
    notes = []
    t = float(rng.uniform(0.2, 0.6))
    while t < dur - 1.0:
        # a "hand": 1-4 simultaneous notes around a random center
        center = int(rng.integers(pitch_lo, pitch_hi))
        n_poly = int(rng.integers(1, 5))
        pitches = np.unique(
            np.clip(center + rng.integers(-12, 13, size=n_poly), 21, 108)
        )
        length = float(rng.uniform(0.15, 1.2))
        vel = int(rng.integers(30, 112))
        for p in pitches:
            # slight per-note length/velocity spread
            plen = max(0.08, length * float(rng.uniform(0.85, 1.15)))
            notes.append(
                Note(t, min(t + plen, dur - 0.05), int(p),
                     int(np.clip(vel + rng.integers(-8, 9), 1, 127)))
            )
        t += float(rng.uniform(0.12, 0.8))

    # sustain pedal segments covering ~40% of the piece
    t = float(rng.uniform(0.5, 2.0))
    while t < dur - 2.0:
        seg = float(rng.uniform(0.8, 3.0))
        notes.append(Note(t, min(t + seg, dur - 0.1), -64, 127))
        t += seg + float(rng.uniform(1.0, 4.0))

    pedal_segs = [(n.start, n.end) for n in notes if n.pitch == -64]
    key_notes = sorted(
        (n for n in notes if n.pitch > 0), key=lambda n: (n.start, n.end)
    )
    # acoustic end per note: extend-to-pedal-release + re-truncate at the
    # next same-pitch strike — exactly extend_pedal's rule, applied to the
    # RENDERING only (labels keep the nominal key-release times)
    render_end = [n.end for n in key_notes]
    if sustain:
        for i, n in enumerate(key_notes):
            for ps, pe in pedal_segs:
                if ps < n.end < pe:
                    render_end[i] = max(render_end[i], pe)
        next_onset = {}
        for i in reversed(range(len(key_notes))):
            n = key_notes[i]
            nxt = next_onset.get(n.pitch)
            if nxt is not None and n.start < nxt < render_end[i]:
                render_end[i] = nxt
            next_onset[n.pitch] = n.start

    x = np.zeros(int(dur * fs), np.float32)
    tt = np.arange(len(x), dtype=np.float32) / fs
    release_s = 0.03  # damper fall time
    for n, rend in zip(key_notes, render_end):
        f0 = 440.0 * 2.0 ** ((n.pitch - 69) / 12.0)
        rend = min(rend + release_s, dur - 1.0 / fs)
        i0, i1 = int(n.start * fs), int(rend * fs)
        seg_t = tt[i0:i1] - np.float32(n.start)
        amp = 0.08 * (n.velocity / 127.0)
        # velocity-dependent decay, faster for high pitches (piano-ish)
        decay = np.exp(-seg_t * (1.5 + f0 / 2000.0)).astype(np.float32)
        tone = np.zeros_like(seg_t)
        for k in range(1, n_partials + 1):
            fk = f0 * k
            if fk >= fs / 2:
                break
            tone += (1.0 / k**2) * np.sin(
                2 * np.pi * fk * seg_t + float(rng.uniform(0, 2 * np.pi))
            ).astype(np.float32)
        # 5 ms attack ramp to avoid clicks (and give onsets a clean edge);
        # 30 ms damping ramp at the (possibly pedal-extended) end
        attack = np.minimum(seg_t / 0.005, 1.0).astype(np.float32)
        damp = np.minimum(
            (np.float32(rend - n.start) - seg_t) / release_s, 1.0
        ).astype(np.float32)
        x[i0:i1] += amp * attack * np.maximum(damp, 0.0) * decay * tone
    if sustain:
        # mechanical pedal thumps: 25 ms low-passed noise bursts at press
        # and (slightly stronger) release
        from scipy.signal import lfilter

        n_th = int(0.025 * fs)
        env = np.exp(-np.arange(n_th, dtype=np.float32) / (0.006 * fs))
        for ps, pe in pedal_segs:
            for t_ev, gain in ((ps, 0.030), (pe, 0.045)):
                i0 = int(t_ev * fs)
                if i0 + n_th >= len(x):
                    continue
                burst = rng.normal(0, 1.0, n_th).astype(np.float32)
                burst = lfilter([1.0], [1.0, -0.97], burst).astype(np.float32)
                burst /= max(np.abs(burst).max(), 1e-6)
                x[i0 : i0 + n_th] += gain * env * burst
    # light tape hiss so the model sees a non-zero noise floor
    x += rng.normal(0, 1e-4, size=len(x)).astype(np.float32)
    # same-pitch re-strikes overlap freely during generation; truncate like
    # the data layer does so the MIDI is valid
    notes = resolve_overlapping(sorted(notes, key=lambda n: (n.start, n.end)))
    return np.clip(x, -1, 1), notes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--train", type=int, default=20)
    ap.add_argument("--val", type=int, default=3)
    ap.add_argument("--test", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--noSustainRender", action="store_true",
                    help="round-3 behavior: pedal in MIDI only, not rendered "
                    "into the audio (pedal tracks unobservable)")
    ap.add_argument("--partials", type=int, default=6,
                    help="harmonics per note (band-limited at Nyquist). "
                    "16 makes bass semitones resolvable like a real piano; "
                    "6 is the round-3/4 corpus")
    ap.add_argument("--pitchLo", type=int, default=36,
                    help="lower bound of the 'hand' center distribution")
    ap.add_argument("--pitchHi", type=int, default=96,
                    help="upper bound of the 'hand' center distribution")
    ap.add_argument("--fs", type=int, default=FS,
                    help="sample rate of the rendered wavs.  The dataset "
                    "builder probes the wav header, so training just needs a "
                    "model conf with matching fs (the CPU-scale accuracy "
                    "certificate uses 4000)")
    args = ap.parse_args(argv)

    from transkun_tpu.data.midi import write_midi

    rng = np.random.default_rng(args.seed)
    root = args.outdir
    year = "2026"
    os.makedirs(os.path.join(root, year), exist_ok=True)
    rows = []
    splits = (
        ["train"] * args.train + ["validation"] * args.val + ["test"] * args.test
    )
    for i, split in enumerate(splits):
        wav = f"{year}/synth{i:03d}.wav"
        mid = f"{year}/synth{i:03d}.midi"
        audio, notes = synth_piece(
            rng, args.dur, sustain=not args.noSustainRender,
            n_partials=args.partials, pitch_lo=args.pitchLo,
            pitch_hi=args.pitchHi, fs=args.fs,
        )
        wavfile.write(
            os.path.join(root, wav), args.fs,
            (audio * 32000).astype(np.int16),
        )
        write_midi(
            sorted(notes, key=lambda n: (n.start, n.end, n.pitch)),
            os.path.join(root, mid),
        )
        rows.append(
            {
                "canonical_composer": "synthetic",
                "canonical_title": f"synth{i:03d}",
                "split": split,
                "year": year,
                "midi_filename": mid,
                "audio_filename": wav,
                "duration": args.dur,
            }
        )
        print(f"{wav}: {sum(1 for n in notes if n.pitch > 0)} notes", flush=True)

    meta = os.path.join(root, "meta.csv")
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    from transkun_tpu.cli.create_dataset_maestro import main as build

    build([root, meta, root])
    print("corpus ready at", root)


if __name__ == "__main__":
    main()
