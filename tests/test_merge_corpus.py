"""merge_corpus_train.py: train-split growth with bit-identical val/test.

This is the targeted-data tool behind the round-5 bass fine-tune (error
analysis -> generate extra pieces where the model is weak -> merge into
train only -> fine-tune).  The held-out splits MUST be untouched or the
accuracy certificate is invalid, so that invariant is the main assertion.
"""

import hashlib
import os
import pickle
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


@pytest.mark.quick
def test_merge_grows_train_only(tmp_path):
    from make_synth_corpus import main as gen_main
    from merge_corpus_train import main as merge_main

    tgt = str(tmp_path / "tgt")
    src = str(tmp_path / "src")
    gen_main([tgt, "--train", "2", "--val", "1", "--test", "1",
              "--dur", "6", "--fs", "4000", "--seed", "1"])
    gen_main([src, "--train", "2", "--val", "1", "--test", "1",
              "--dur", "6", "--fs", "4000", "--seed", "2",
              "--pitchLo", "21", "--pitchHi", "60"])

    before = {s: _md5(os.path.join(tgt, f"{s}.pickle")) for s in ("val", "test")}
    with open(os.path.join(tgt, "train.pickle"), "rb") as f:
        n_before = len(pickle.load(f))

    merge_main([tgt, src, "--prefix", "bass"])

    for s, h in before.items():
        assert _md5(os.path.join(tgt, f"{s}.pickle")) == h
    with open(os.path.join(tgt, "train.pickle"), "rb") as f:
        entries = pickle.load(f)
    assert len(entries) == n_before + 2
    merged = [e for e in entries if "bass" in e["audio_filename"]]
    assert len(merged) == 2
    for e in merged:
        # the copied audio exists and the annotation parsed real notes
        assert os.path.exists(os.path.join(tgt, e["audio_filename"]))
        assert len(e["notes"]) > 0
