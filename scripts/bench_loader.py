"""Input-pipeline throughput at the flagship operating point (VERDICT round-2
weak #4 / next #4): sustained chunks/sec from ``BatchLoader`` with the full
``Augmentator`` (pitch shift, EQ, IR reverb, background noise) on synthetic
44.1 kHz pieces, vs the train-step cadence it must feed.

Flagship cadence: B=2 step = 106 ms -> 18.9 chunks/s; B=4 step = 216 ms ->
18.5 chunks/s (ARCHITECTURE.md training-step breakdown).

Run: python scripts/bench_loader.py [--workers N] [--seconds S]
"""

import argparse
import json
import math
import os
import pickle
import shutil
import sys
import tempfile
import time

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from transkun_tpu.data import dataset as D
from transkun_tpu.data.augment import Augmentator
from transkun_tpu.data.note import Note

FS = 44100


def build_corpus(root: str, n_pieces: int = 3, dur: float = 40.0):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(n_pieces):
        notes = []
        t = 0.2
        while t < dur - 1:
            notes.append(
                Note(t, t + float(rng.uniform(0.1, 0.8)), int(rng.integers(21, 109)),
                     int(rng.integers(20, 110)))
            )
            t += float(rng.uniform(0.05, 0.25))
        wav = f"p{i}.wav"
        x = (rng.normal(size=(int(dur * FS), 2)) * 3000).astype(np.int16)
        wavfile.write(os.path.join(root, wav), FS, x)
        samples.append(
            {"audio_filename": wav, "duration": dur, "notes": notes, "fs": FS,
             "nSamples": int(dur * FS), "nChannel": 2}
        )
    pkl = os.path.join(root, "train.pickle")
    with open(pkl, "wb") as f:
        pickle.dump(samples, f)

    # noise + IR folders for the full augmentation chain
    noise_dir = os.path.join(root, "noise")
    ir_dir = os.path.join(root, "ir")
    os.makedirs(noise_dir); os.makedirs(ir_dir)
    for k in range(2):
        nz = (np.random.default_rng(k).normal(size=(5 * FS, 2)) * 2000).astype(np.int16)
        wavfile.write(os.path.join(noise_dir, f"n{k}.wav"), FS, nz)
    ir = np.zeros(int(0.3 * FS), np.float32)
    ir[0] = 1.0
    ir[::1470] = 0.3 * np.exp(-np.arange(len(ir[::1470])) / 5)
    wavfile.write(os.path.join(ir_dir, "ir0.wav"), FS, (ir * 32000).astype(np.int16))
    return root, pkl, noise_dir, ir_dir


def measure(workers: int, seconds: float, batch: int = 2):
    root = tempfile.mkdtemp(prefix="loaderbench")
    try:
        _, pkl, noise_dir, ir_dir = build_corpus(root)
        ds = D.DatasetMaestro(root, pkl)
        aug = Augmentator(
            sampleRate=FS, noiseFolder=noise_dir, convIRFolder=ir_dir
        )
        it = D.DatasetMaestroIterator(
            ds, 8.0, 16.0, seed=0, augmentator=aug,
            notes_strictly_contained=False,
        )
        loader = D.BatchLoader(
            it, batch, shuffle=True, seed=0, num_workers=workers, prefetch=4
        )
        n_chunks = 0
        t0 = time.time()
        for b in loader:
            n_chunks += b["audioSlices"].shape[0]
            if time.time() - t0 > seconds:
                break
        dt = time.time() - t0
        return n_chunks / dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


def measure_per_chunk(n: int = 10) -> float:
    """Mean single-core cost of one augmented 16 s / 44.1 kHz chunk fetch."""
    import random as _random

    root = tempfile.mkdtemp(prefix="loaderbench")
    try:
        _, pkl, noise_dir, ir_dir = build_corpus(root, n_pieces=1)
        ds = D.DatasetMaestro(root, pkl)
        aug = Augmentator(
            sampleRate=FS, noiseFolder=noise_dir, convIRFolder=ir_dir,
            rng=_random.Random(0),
        )
        it = D.DatasetMaestroIterator(
            ds, 8.0, 16.0, seed=0, augmentator=aug,
            notes_strictly_contained=False,
        )
        it[0]  # warm scipy imports + wav caches outside the timed region
        t0 = time.time()
        for j in range(1, n + 1):
            it[j % len(it)]
        return (time.time() - t0) / n
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()
    per_chunk = measure_per_chunk()
    rate = measure(args.workers, args.seconds)
    cadence = 2 / 0.106  # flagship B=2 train step
    print(json.dumps({
        "host_cores": os.cpu_count(),
        "per_chunk_core_seconds": round(per_chunk, 3),
        "chunks_per_sec": round(rate, 2),
        "workers": args.workers,
        "required_flagship_cadence": round(cadence, 2),
        "headroom_x": round(rate / cadence, 2),
        "cores_needed_for_cadence": math.ceil(cadence * per_chunk),
    }))


if __name__ == "__main__":
    main()
