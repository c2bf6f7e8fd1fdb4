"""Round-visible accuracy check: train the small V2 model from scratch on a
synthetic tone corpus and report note-onset F1 through the FULL stack —
label encoding -> semi-CRF NLL -> AdaBelief/OneCycle/quantile clip ->
streaming transcribe -> mir_eval-style matching.

Prints one JSON line: {"metric": "synthetic_onset_f1", ...}.  Used by
tests/test_learning.py (threshold) and recorded per round (the reference
tracks the same online F1 during training, ``transkun/train.py:196-209``).

Usage: python scripts/learning_f1.py [--steps 1000]
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--platform", default=None,
                    help="pin the jax backend (e.g. 'cpu').  Must go through "
                    "jax.config BEFORE backend init: the axon TPU plugin in "
                    "this environment ignores the JAX_PLATFORMS env var")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from transkun_tpu.data.labels import encode_batch
    from transkun_tpu.data.note import Note
    from transkun_tpu.eval.evaluation import compare_transcription
    from transkun_tpu.models import ModelConfig, TransKun
    from transkun_tpu.ops import frontend
    from transkun_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    FS, HOP = 4000, 64
    conf = ModelConfig.from_dict(
        dict(
            f_min=30, f_max=1900, n_mels=48, hopSize=HOP, windowSize=256,
            fs=FS, nExtraWins=2, baseSize=16, nHead=2, nLayers=2,
            scoringExpansionFactor=2, segmentSizeInSecond=3.0,
            segmentHopSizeInSecond=1.5, scoreDropoutProb=0.0,
            contextDropoutProb=0.0, velocityDropoutProb=0.0,
            refinedOFDropoutProb=0.0,
        )
    )
    PITCHES = [48, 55, 60, 64, 67, 72]
    rng = np.random.default_rng(args.seed)

    def synth(notes, dur):
        t = np.arange(int(dur * FS)) / FS
        x = np.zeros(len(t), np.float32)
        for n in notes:
            f0 = 440 * 2 ** ((n.pitch - 69) / 12)
            env = ((t >= n.start) & (t < n.end)).astype(np.float32)
            x += 0.15 * env * np.sin(2 * np.pi * f0 * t).astype(np.float32)
        return np.clip(x, -1, 1)

    def piece(dur):
        notes, t = [], 0.15
        while t < dur - 0.5:
            p = int(rng.choice(PITCHES))
            length = float(rng.uniform(0.25, 0.45))
            notes.append(Note(t, t + length, p, 80))
            t += length + float(rng.uniform(0.15, 0.35))
        return notes

    model = TransKun(conf)
    n_frames = int(3.0 * FS / HOP) + 1
    params = model.init(jax.random.PRNGKey(0), n_frames=n_frames)
    opt = make_optimizer(
        params["params"], max_lr=1.5e-3, n_iter=4 * args.steps,
        warmup_cutoff=0,
    )
    step = make_train_step(model.module, opt)
    state = init_train_state(params, opt)

    crops = [(lambda n: (synth(n, 3.0), n))(piece(3.0)) for _ in range(8)]

    def batch(i):
        a, b = crops[i % 8], crops[(i + 1) % 8]
        audio = np.stack([a[0], b[0]])[..., None]
        x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
        frames = frontend.make_frame(x, HOP, 256)
        labels = encode_batch([a[1], b[1]], HOP / FS, model.targetMIDIPitch, 16)
        return frames, tuple(jnp.asarray(v) for v in labels.astuple())

    batches = [batch(i) for i in range(8)]
    loss0 = loss = None
    for i in range(args.steps):
        frames, labels = batches[i % 8]
        state, metrics = step(state, frames, labels, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        if loss0 is None:
            loss0 = loss
        assert np.isfinite(loss), (i, loss)

    n_cor = n_gt = n_est = 0.0
    for audio, gt in crops:
        est = [
            n for n in model.transcribe(state.params, audio[:, None])
            if n.pitch > 0
        ]
        m = compare_transcription(est, gt)
        _, r, _, _ = m["note"]
        n_gt += m["nGT"]
        n_est += m["nEst"]
        n_cor += r * m["nGT"]
    p = n_cor / max(n_est, 1e-9)
    r = n_cor / max(n_gt, 1e-9)
    f1 = 2 * p * r / max(p + r, 1e-9)
    print(
        json.dumps(
            {
                "metric": "synthetic_onset_f1",
                "value": round(f1, 4),
                "precision": round(p, 4),
                "recall": round(r, 4),
                "steps": args.steps,
                "loss_first": round(loss0, 2),
                "loss_last": round(loss, 2),
                "platform": jax.devices()[0].platform,
            }
        )
    )
    return f1


if __name__ == "__main__":
    main()
