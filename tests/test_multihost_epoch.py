"""Full-epoch multi-process certificate (VERDICT r3 item 6): two OS
processes x 4 virtual devices each run the REAL production CLI
(``cli/train.py``) end to end — rank-sharded loader, shard_map dp step,
distributed validation, epoch checkpoint — then resume from the checkpoint
for a second epoch.  The resumed run's final params must be BIT-IDENTICAL
to an uninterrupted 2-epoch run (run_seed persisted in the checkpoint).

Ref: ``transkun/train.py:29-31,120-124``, ``TrainUtil.py:231-272``.
"""

import csv
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

FS = 4000

TINY_CONF = {
    "Model": {
        "module": "transkun_tpu.models.transkun",
        "configClassName": "Config",
        "config": {
            "f_min": 30, "f_max": 1900, "n_mels": 32,
            "segmentHopSizeInSecond": 0.5, "segmentSizeInSecond": 1.0,
            "hopSize": 64, "windowSize": 256, "fs": FS, "nExtraWins": 2,
            "baseSize": 8, "nHead": 2, "nLayers": 1,
            "scoringExpansionFactor": 2, "scoreDropoutProb": 0.0,
            "contextDropoutProb": 0.0, "velocityDropoutProb": 0.0,
            "refinedOFDropoutProb": 0.0,
        },
    }
}


def _build_corpus(root):
    """2 train + 1 val pieces of 6 s sine-tone polyphony at 4 kHz."""
    from scipy.io import wavfile

    from transkun_tpu.data.midi import write_midi
    from transkun_tpu.data.note import Note

    rng = np.random.default_rng(99)
    os.makedirs(os.path.join(root, "y"), exist_ok=True)
    rows = []
    for i, split in enumerate(["train", "train", "validation"]):
        dur = 6.0
        notes, t = [], 0.2
        while t < dur - 0.6:
            p = int(rng.integers(50, 80))
            ln = float(rng.uniform(0.2, 0.4))
            notes.append(Note(t, t + ln, p, 80))
            t += ln + float(rng.uniform(0.1, 0.3))
        tt = np.arange(int(dur * FS)) / FS
        x = np.zeros(len(tt), np.float32)
        for n in notes:
            f0 = 440 * 2 ** ((n.pitch - 69) / 12)
            env = ((tt >= n.start) & (tt < n.end)).astype(np.float32)
            x += 0.1 * env * np.sin(2 * np.pi * f0 * tt).astype(np.float32)
        wav, mid = f"y/p{i}.wav", f"y/p{i}.midi"
        wavfile.write(os.path.join(root, wav), FS,
                      (np.clip(x, -1, 1) * 32000).astype(np.int16))
        write_midi(notes, os.path.join(root, mid))
        rows.append({
            "canonical_composer": "t", "canonical_title": f"p{i}",
            "split": split, "year": "y", "midi_filename": mid,
            "audio_filename": wav, "duration": dur,
        })
    meta = os.path.join(root, "meta.csv")
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    from transkun_tpu.cli.create_dataset_maestro import main as build

    build([root, meta, root])


WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    mode = sys.argv[2]          # "straight" (2 epochs) or "resumed" (1+1)
    corpus = sys.argv[3]
    ckpt = sys.argv[4]
    conf = sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_COORDINATOR"] = "127.0.0.1:%PORT%"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    os.environ["JAX_NUM_PROCESSES"] = "2"
    sys.path.insert(0, %REPO%)

    from transkun_tpu.cli.train import main

    base = [ckpt,
            "--datasetPath", corpus,
            "--datasetMetaFile_train", os.path.join(corpus, "train.pickle"),
            "--datasetMetaFile_val", os.path.join(corpus, "val.pickle"),
            "--modelConf", conf,
            "--batchSize", "1", "--seed", "777", "--max_lr", "1e-3",
            "--nIter", "40", "--warmupCutoff", "0", "--maxEvents", "8",
            "--ckptEvery", "1000", "--statsEvery", "1000", "--logEvery", "4",
            "--dataLoaderWorkers", "1"]

    if mode == "straight":
        main(base + ["--maxEpoch", "2"])
    else:
        main(base + ["--maxEpoch", "1"])
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_written")
        main(base + ["--maxEpoch", "2"])   # resumes from the epoch-1 ckpt
        multihost_utils.sync_global_devices("resume_done")

    # fingerprint final params from the checkpoint rank 0 wrote
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("final")
    if pid == 0:
        import numpy as np, jax
        from transkun_tpu.train.checkpoint import load_checkpoint
        ck = load_checkpoint(ckpt)
        leaves = jax.tree.leaves(ck["params"])
        fp = np.float64(sum(np.asarray(l, np.float64).sum() for l in leaves))
        h = float(np.float64(sum(np.abs(np.asarray(l, np.float64)).sum()
                                 for l in leaves)))
        print(f"EPOCH_OK step={int(ck['step'])} fp={fp!r} h={h!r}", flush=True)
    # both ranks must reach process exit together or the laggard trips the
    # runtime's Shutdown barrier while the other is still fingerprinting
    multihost_utils.sync_global_devices("exit_together")
    """
)


def _run(mode, corpus, ckpt, conf, tmp_path, port):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = WORKER.replace("%PORT%", str(port)).replace("%REPO%", repr(repo))
    wfile = tmp_path / f"worker_{mode}.py"
    wfile.write_text(script)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(wfile), str(pid), mode, corpus, ckpt, conf],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{mode} proc {pid} failed:\n{out[-4000:]}"
    ok = [l for out in outs for l in out.splitlines() if "EPOCH_OK" in l]
    assert len(ok) == 1, outs
    return ok[0]


@pytest.mark.slow
def test_two_process_full_epoch_resume_deterministic(tmp_path):
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    _build_corpus(corpus)
    conf = str(tmp_path / "tiny.conf")
    with open(conf, "w") as f:
        json.dump(TINY_CONF, f)

    port = 53310 + os.getpid() % 1000
    line_a = _run("straight", corpus, str(tmp_path / "ckA"), conf, tmp_path, port)
    line_b = _run("resumed", corpus, str(tmp_path / "ckB"), conf, tmp_path, port + 7)

    # same final step count and bit-identical param fingerprints
    assert line_a.split("step=")[1] == line_b.split("step=")[1], (line_a, line_b)
