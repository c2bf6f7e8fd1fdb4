"""Evaluate a trained checkpoint on a MAESTRO-layout corpus split through
the full production path: streaming transcribe (each split piece -> MIDI)
followed by the metrics CLI (est-vs-GT trees, mir_eval semantics), exactly
the reference's `transkun` + `transkunEval` flow.

Usage:
  python scripts/eval_corpus.py CORPUS_DIR SPLIT_PICKLE ESTDIR \
      --weight CKPT [--conf CONF] [--bf16] [--onsetTolerance 0.05]
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("splitPickle")
    ap.add_argument("estDIR")
    ap.add_argument("--weight", required=True)
    ap.add_argument("--conf", default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--onsetTolerance", default=0.05, type=float)
    ap.add_argument("--outputJSON", default=None)
    ap.add_argument("--platform", default=None,
                    help="pin the jax backend (e.g. 'cpu'); must be set "
                    "before backend init — the axon plugin ignores the "
                    "JAX_PLATFORMS env var")
    ap.add_argument(
        "--noPedalExtension", action="store_true",
        help="evaluate against key-release GT offsets instead of "
        "pedal-extended ones.  MUST match the convention the training "
        "pickles were built with (create_dataset_maestro extends by "
        "default; ref createDatasetMaestro.py:16-20 likewise).  Round 4 "
        "hard-coded the no-extension convention here, which mismeasured "
        "a pedal-extended-trained model's offsets as 0.576 when they "
        "were 0.944 under the matching convention.",
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax.numpy as jnp

    from transkun_tpu.data.midi import write_midi
    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf, parse_conf_file
    from transkun_tpu.train.checkpoint import load_params

    if args.conf:
        _, conf = parse_conf_file(args.conf)
    else:
        _, conf = load_default_conf()
    model = TransKun(conf, compute_dtype=jnp.bfloat16 if args.bf16 else None)
    params = load_params(args.weight, conf)
    if "params" not in params:
        params = {"params": params}

    with open(args.splitPickle, "rb") as f:
        entries = pickle.load(f)

    audios, out_paths = [], []
    for e in entries:
        fs, wav = wavfile.read(os.path.join(args.corpus, e["audio_filename"]))
        assert fs == conf.fs, (fs, conf.fs)
        if wav.ndim == 1:
            wav = wav[:, None]
        audios.append(wav.astype(np.float32) / 32768.0)
        # est tree mirrors the GT tree so the metrics CLI pairs the files
        dst = os.path.join(args.estDIR, e["midi_filename"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        out_paths.append(dst)

    # pieces pipeline over the device (the serving path)
    all_notes = model.transcribe_many(params, audios)
    for notes, dst in zip(all_notes, out_paths):
        write_midi(notes, dst)
        print(f"{dst}: {sum(1 for n in notes if n.pitch > 0)} notes, "
              f"{sum(1 for n in notes if n.pitch < 0)} pedal events", flush=True)

    from transkun_tpu.cli.compute_metrics import main as metrics_main

    out_json = args.outputJSON or os.path.join(args.estDIR, "metrics.json")
    metrics_args = [args.estDIR, args.corpus, "--outputJSON", out_json,
                    "--onsetTolerance", str(args.onsetTolerance)]
    if args.noPedalExtension:
        metrics_args.append("--noPedalExtension")
    metrics_main(metrics_args)
    with open(out_json) as f:
        agg = json.load(f)["aggregated"]
    # each metric aggregates as [precision, recall, f1, overlap]
    print(json.dumps({
        "metric": "corpus_note_onset_f1",
        "value": round(agg["note"][2], 4),
        "note_offset_f1": round(agg["note+offset"][2], 4),
        "note_velocity_f1": round(agg["note+velocity"][2], 4),
        "frame_f1": round(agg["frame"][2], 4) if "frame" in agg else None,
        "pedal_f1": round(agg["pedal64"][2], 4) if "pedal64" in agg else None,
        "pedal_offset_f1": (
            round(agg["pedal64+offset"][2], 4)
            if "pedal64+offset" in agg else None
        ),
        "detail_json": out_json,
    }))


if __name__ == "__main__":
    main()
