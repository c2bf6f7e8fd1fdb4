"""Characterize onset errors of a transcription est-tree against its GT tree.

Matches est vs GT notes with onset-only mir_eval semantics (50 ms, the
headline metric) and buckets the FALSE NEGATIVES (missed GT onsets) and
FALSE POSITIVES (spurious est onsets) by the factors that plausibly cause
them: chord size at the onset instant, velocity, pitch register, onset
position within the 8 s decode-segment grid, note duration, and the gap to
the previous same-pitch onset (re-strike speed).  This is the diagnosis step
VERDICT r4 item 2 asks for before attacking the residual F1 gap.

Usage:
  python scripts/error_analysis.py ESTDIR GTDIR [--noPedalExtension]
"""

import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from transkun_tpu.data.dataset import parse_midi_file  # noqa: E402
from transkun_tpu.eval.evaluation import midi_to_freq  # noqa: E402
from transkun_tpu.eval.matching import match_notes  # noqa: E402

SEG_HOP = 8.0  # decode segment hop (s) — stitching boundaries live on this grid


def bucket_stats(notes, all_onsets):
    """Factor vector per note: (chord_size, velocity, pitch, seg_phase,
    duration, same_pitch_gap)."""
    out = []
    onset_arr = np.asarray(sorted(all_onsets))
    prev_by_pitch = {}
    for n in sorted(notes, key=lambda n: n.start):
        chord = int(np.sum(np.abs(onset_arr - n.start) <= 0.05))
        phase = n.start % SEG_HOP
        gap = n.start - prev_by_pitch.get(n.pitch, -10.0)
        prev_by_pitch[n.pitch] = n.start
        out.append(
            dict(
                start=n.start, pitch=n.pitch, velocity=n.velocity,
                chord=chord, seg_phase=phase, dur=n.end - n.start,
                same_pitch_gap=gap,
            )
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("estDIR")
    ap.add_argument("gtDIR")
    ap.add_argument("--noPedalExtension", action="store_true")
    ap.add_argument("--onsetTolerance", default=0.05, type=float)
    ap.add_argument("--outputJSON", default=None)
    args = ap.parse_args(argv)

    fn_all, fp_all = [], []
    n_gt = n_est = n_match = 0
    pieces = []
    for root, _, files in os.walk(args.estDIR):
        for f in files:
            if not f.endswith((".mid", ".midi")):
                continue
            est_path = os.path.join(root, f)
            rel = os.path.relpath(est_path, args.estDIR)
            gt_path = os.path.join(args.gtDIR, rel)
            if os.path.exists(gt_path):
                pieces.append((est_path, gt_path, rel))

    for est_path, gt_path, rel in sorted(pieces):
        est = [n for n in parse_midi_file(est_path) if n.pitch > 0]
        gt = [
            n
            for n in parse_midi_file(
                gt_path, extend_sustain_pedal=not args.noPedalExtension
            )
            if n.pitch > 0
        ]
        ref_iv = np.array([[n.start, n.end] for n in gt])
        ref_p = np.array([midi_to_freq(n.pitch) for n in gt])
        est_iv = np.array([[n.start, n.end] for n in est])
        est_p = np.array([midi_to_freq(n.pitch) for n in est])
        # onset-only matching == the headline "note" metric
        pairs = match_notes(
            ref_iv, ref_p, est_iv, est_p,
            onset_tolerance=args.onsetTolerance, offset_ratio=None,
        )
        m_ref = {a for a, _ in pairs}
        m_est = {b for _, b in pairs}
        gt_on = [n.start for n in gt]
        est_on = [n.start for n in est]
        gt_stats = bucket_stats(gt, gt_on)
        est_stats = bucket_stats(est, est_on)
        order_gt = np.argsort([n.start for n in gt], kind="stable")
        order_est = np.argsort([n.start for n in est], kind="stable")
        pos_gt = {int(orig): k for k, orig in enumerate(order_gt)}
        pos_est = {int(orig): k for k, orig in enumerate(order_est)}
        fn_all += [gt_stats[pos_gt[i]] for i in range(len(gt)) if i not in m_ref]
        fp_all += [
            est_stats[pos_est[j]] for j in range(len(est)) if j not in m_est
        ]
        n_gt += len(gt)
        n_est += len(est)
        n_match += len(pairs)

    def dist(rows, key, edges):
        c = Counter()
        for r in rows:
            v = r[key]
            for lo, hi in edges:
                if lo <= v < hi:
                    c[f"[{lo},{hi})"] += 1
                    break
        return dict(sorted(c.items()))

    chord_edges = [(1, 2), (2, 3), (3, 4), (4, 6), (6, 99)]
    vel_edges = [(0, 40), (40, 60), (60, 80), (80, 100), (100, 128)]
    pitch_edges = [(21, 45), (45, 65), (65, 85), (85, 109)]
    phase_edges = [(0.0, 0.1), (0.1, 7.9), (7.9, 8.01)]
    dur_edges = [(0.0, 0.12), (0.12, 0.3), (0.3, 0.7), (0.7, 99)]
    gap_edges = [(-99, 0.1), (0.1, 0.25), (0.25, 1.0), (1.0, 999)]

    report = {
        "n_gt": n_gt,
        "n_est": n_est,
        "precision": round(n_match / max(n_est, 1), 4),
        "recall": round(n_match / max(n_gt, 1), 4),
        "false_negatives": {
            "count": len(fn_all),
            "by_chord_size": dist(fn_all, "chord", chord_edges),
            "by_velocity": dist(fn_all, "velocity", vel_edges),
            "by_pitch": dist(fn_all, "pitch", pitch_edges),
            "by_segment_phase": dist(fn_all, "seg_phase", phase_edges),
            "by_duration": dist(fn_all, "dur", dur_edges),
            "by_same_pitch_gap": dist(fn_all, "same_pitch_gap", gap_edges),
        },
        "false_positives": {
            "count": len(fp_all),
            "by_chord_size": dist(fp_all, "chord", chord_edges),
            "by_velocity": dist(fp_all, "velocity", vel_edges),
            "by_pitch": dist(fp_all, "pitch", pitch_edges),
            "by_segment_phase": dist(fp_all, "seg_phase", phase_edges),
            "by_duration": dist(fp_all, "dur", dur_edges),
            "by_same_pitch_gap": dist(fp_all, "same_pitch_gap", gap_edges),
        },
        # base-rate context so the FN/FP buckets can be read as rates
        "gt_base": None,
    }
    # GT base distribution for rate normalization
    gt_rows = []
    for est_path, gt_path, rel in sorted(pieces):
        gt = [
            n
            for n in parse_midi_file(
                gt_path, extend_sustain_pedal=not args.noPedalExtension
            )
            if n.pitch > 0
        ]
        gt_rows += bucket_stats(gt, [n.start for n in gt])
    report["gt_base"] = {
        "by_chord_size": dist(gt_rows, "chord", chord_edges),
        "by_velocity": dist(gt_rows, "velocity", vel_edges),
        "by_pitch": dist(gt_rows, "pitch", pitch_edges),
        "by_segment_phase": dist(gt_rows, "seg_phase", phase_edges),
        "by_duration": dist(gt_rows, "dur", dur_edges),
        "by_same_pitch_gap": dist(gt_rows, "same_pitch_gap", gap_edges),
    }

    txt = json.dumps(report, indent=1)
    print(txt)
    if args.outputJSON:
        with open(args.outputJSON, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
