"""Evaluation metric tests (hand-constructed oracles)."""

import numpy as np
import pytest

from transkun_tpu.data.note import Note
from transkun_tpu.eval import compare_bracket, compare_framewise, compare_transcription
from transkun_tpu.eval import matching


def test_compare_bracket():
    assert compare_bracket([(0, 2), (3, 4)], [(0, 2), (5, 6)]) == (2, 2, 1)
    assert compare_bracket([], []) == (0, 0, 0)


def test_compare_framewise():
    n_gt, n_est, n_int = compare_framewise([(0, 5)], [(3, 8)], count_zero=False)
    assert (n_gt, n_est, n_int) == (5, 5, 2)


def test_match_notes_basic():
    ref = np.array([[0.0, 1.0], [2.0, 3.0]])
    ref_p = np.array([440.0, 880.0])
    est = np.array([[0.02, 1.1], [2.3, 3.0]])
    est_p = np.array([440.0, 880.0])
    # onset tolerance 50ms: first matches, second (300ms off) does not
    m = matching.match_notes(ref, ref_p, est, est_p, offset_ratio=None)
    assert m == [(0, 0)]
    p, r, f, o = matching.precision_recall_f1_overlap(
        ref, ref_p, est, est_p, offset_ratio=None
    )
    assert p == 0.5 and r == 0.5 and abs(f - 0.5) < 1e-9


def test_match_notes_offset_criteria():
    ref = np.array([[0.0, 1.0]])
    ref_p = np.array([440.0])
    # onset ok; offset off by 0.3 > max(0.2*1.0, 0.05)
    est = np.array([[0.0, 1.3]])
    m = matching.match_notes(ref, ref_p, est, ref_p)
    assert m == []
    # offset within 20% of duration
    est = np.array([[0.0, 1.15]])
    m = matching.match_notes(ref, ref_p, est, ref_p)
    assert m == [(0, 0)]


def test_match_is_maximum():
    """Greedy matching would fail here; maximum matching must find 2 pairs."""
    ref = np.array([[0.00, 1.0], [0.04, 1.0]])
    ref_p = np.array([440.0, 440.0])
    est = np.array([[0.02, 1.0], [0.08, 1.0]])
    est_p = np.array([440.0, 440.0])
    # ref0 can match est0 only; ref1 matches both -> maximum = 2
    m = matching.match_notes(ref, ref_p, est, est_p, offset_ratio=None)
    assert len(m) == 2


def test_velocity_matching_rescale():
    """Velocity matching is invariant to a global linear velocity rescale."""
    ref = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    ref_p = np.array([440.0, 440.0, 440.0])
    ref_v = np.array([40, 80, 120])
    est_v = np.array([20, 40, 60])  # exactly 0.5x
    m = matching.match_notes_with_velocity(
        ref, ref_p, ref_v, ref, ref_p, est_v, offset_ratio=None
    )
    assert len(m) == 3


def test_compare_transcription_perfect():
    notes = [
        Note(0.0, 1.0, 60, 80),
        Note(1.0, 2.0, 64, 90),
        Note(0.0, 2.5, -64, 127),
    ]
    metrics = compare_transcription(
        [n.copy() for n in notes], [n.copy() for n in notes], split_pedal=True
    )
    assert metrics["note"][2] == 1.0
    assert metrics["note+offset"][2] == 1.0
    assert metrics["note+velocity+offset"][2] == 1.0
    assert metrics["frame"][2] > 0.999
    assert metrics["pedal64"][2] == 1.0
    assert metrics["nGT"] == 2  # pedals split out


@pytest.mark.quick
@pytest.mark.quick
def test_golden_fixtures():
    """Frozen metric outputs on randomized est/GT fixtures: pins the whole
    matching stack (Hopcroft-Karp matching, velocity rescale, framewise
    overlap, pedal split, deviations) against silent behavior drift.
    Regenerate ONLY for an intentional semantics change — and A/B against
    mir_eval first when that library is available (VERDICT r1 #10)."""
    import json
    import os

    import numpy as np

    from transkun_tpu.data.note import Note
    from transkun_tpu.eval.evaluation import compare_transcription

    path = os.path.join(os.path.dirname(__file__), "golden", "eval_fixtures.json")
    cases = json.load(open(path))
    assert len(cases) == 6
    for ci, case in enumerate(cases):
        gt = [Note(*row) for row in case["gt"]]
        est = [Note(*row) for row in case["est"]]
        m = compare_transcription(
            est, gt, split_pedal=case["split_pedal"], compute_deviations=True
        )
        for key, want in case["metrics"].items():
            got = m[key]
            np.testing.assert_allclose(
                np.asarray(got, np.float64), np.asarray(want, np.float64),
                rtol=1e-9, atol=1e-12, err_msg=f"case {ci} metric {key}",
            )
