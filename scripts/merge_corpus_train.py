"""Merge another MAESTRO-layout corpus's train pieces into a target corpus'
TRAIN split, leaving the target's val/test splits bit-identical.

This is the targeted-data tool behind the round-5 bass fine-tune: error
analysis (scripts/error_analysis.py) showed the onset errors concentrated in
the bass register, so 20 bass-weighted pieces (make_synth_corpus.py
--pitchLo 21 --pitchHi 60) were merged into the train split and the model
fine-tuned — without touching the held-out evaluation data.  The same flow
works for any "generate extra data where the model is weak" iteration.

Pieces are copied under a new name prefix, rows appended to the target's
meta.csv with split=train, and the pickles rebuilt through the production
dataset-build CLI (the same path the reference's createDatasetMaestro.py
provides).  The val/test pickle md5s are asserted unchanged.

Usage:
  python scripts/merge_corpus_train.py TARGET_CORPUS SOURCE_CORPUS \
      [--prefix bass] [--splits train]
"""

import argparse
import csv
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="corpus dir whose train split grows")
    ap.add_argument("source", help="corpus dir providing the new pieces")
    ap.add_argument("--prefix", default="merged",
                    help="new basename prefix for the copied pieces (the "
                    "source's basename stem is replaced, avoiding clashes)")
    ap.add_argument("--splits", default="train",
                    help="comma-separated source splits to take pieces from")
    args = ap.parse_args(argv)

    take = set(args.splits.split(","))
    src_meta = os.path.join(args.source, "meta.csv")
    tgt_meta = os.path.join(args.target, "meta.csv")
    src_rows = list(csv.DictReader(open(src_meta)))
    tgt_rows = list(csv.DictReader(open(tgt_meta)))

    before = {
        s: _md5(os.path.join(args.target, f"{s}.pickle"))
        for s in ("val", "test")
        if os.path.exists(os.path.join(args.target, f"{s}.pickle"))
    }

    existing = {r["audio_filename"] for r in tgt_rows}
    new_rows = []
    for i, r in enumerate(r for r in src_rows if r["split"] in take):
        row = dict(r)
        for key in ("audio_filename", "midi_filename"):
            old = row[key]
            d = os.path.dirname(old)
            ext = os.path.splitext(old)[1]
            new = os.path.join(d, f"{args.prefix}{i:03d}{ext}")
            os.makedirs(os.path.join(args.target, d), exist_ok=True)
            shutil.copyfile(
                os.path.join(args.source, old), os.path.join(args.target, new)
            )
            row[key] = new
        if row["audio_filename"] in existing:
            raise SystemExit(f"name clash: {row['audio_filename']}")
        row["canonical_title"] = f"{args.prefix}{i:03d}"
        row["split"] = "train"
        new_rows.append(row)

    with open(tgt_meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(tgt_rows[0].keys()))
        w.writeheader()
        w.writerows(tgt_rows + new_rows)

    from transkun_tpu.cli.create_dataset_maestro import main as build

    build([args.target, tgt_meta, args.target])

    for s, h in before.items():
        now = _md5(os.path.join(args.target, f"{s}.pickle"))
        assert now == h, f"{s}.pickle changed by a train-only merge: {h} -> {now}"
    print(
        f"merged {len(new_rows)} pieces into {args.target} train split "
        f"({len(tgt_rows)} -> {len(tgt_rows) + len(new_rows)} rows); "
        "val/test pickles unchanged"
    )


if __name__ == "__main__":
    main()
