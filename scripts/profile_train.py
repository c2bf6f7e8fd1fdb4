"""Flagship train-step profile: per-phase breakdown at the real training
shape (VERDICT r1 item 4 / STATUS r2 gap 2).

Measures, on the available accelerator:
  1. host label encoding (prepareIntervals-equivalent, numpy)
  2. device forward (loss only)
  3. device forward+backward (grads)
  4. the full train step (grads + quantile clip + AdaBelief)
and prints a JSON breakdown.  Run with --fused/--no-fused to compare the
alpha-layout fused score emission against the einsum+transpose path.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# NOT via PYTHONPATH: any PYTHONPATH value breaks the axon TPU plugin's
# backend registration in this environment
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--max-events", type=int, default=32)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.data.labels import encode_batch
    from transkun_tpu.data.note import Note, resolve_overlapping
    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf
    from transkun_tpu.models.transkun import log_prob_padded
    from transkun_tpu.ops import frontend
    from transkun_tpu.train import init_train_state, make_optimizer, make_train_step

    _, conf = load_default_conf()
    if args.no_remat:
        conf.useGradientCheckpoint = False
    dtype = jnp.bfloat16 if args.bf16 else None
    model = TransKun(conf, compute_dtype=dtype)

    n = args.batch
    n_samples = int(args.seconds * conf.fs)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(n, n_samples, 1)) * 0.1).astype(np.float32)
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, conf.hopSize, conf.windowSize)
    t_frames = frames.shape[2]
    print(f"frames: {frames.shape}  (T={t_frames}, P=90, NB={n * 90})")

    # realistic labels: ~12 notes/sec across the pitch range
    notes_batch = []
    for _ in range(n):
        notes = []
        for _ in range(int(12 * args.seconds)):
            start = float(rng.uniform(0, args.seconds - 0.3))
            notes.append(
                Note(start, start + float(rng.uniform(0.05, 1.5)),
                     int(rng.integers(21, 109)), int(rng.integers(30, 110)))
            )
        notes_batch.append(
            resolve_overlapping(sorted(notes, key=lambda nt: nt.start))
        )

    fdur = conf.hopSize / conf.fs

    t0 = time.time()
    for _ in range(5):
        labels = encode_batch(
            notes_batch, fdur, model.targetMIDIPitch, args.max_events
        )
    host_encode_ms = (time.time() - t0) / 5 * 1e3
    labels_dev = tuple(jnp.asarray(a) for a in labels.astuple())

    params = model.init(jax.random.PRNGKey(0), n_frames=t_frames)
    opt = make_optimizer(params["params"], max_lr=2e-4, n_iter=180000)
    step = make_train_step(model.module, opt)
    state = init_train_state(params, opt)

    fused = not args.no_fused

    def loss_fn(variables, frames, labels, key):
        logp = log_prob_padded(
            model.module, variables, frames, labels,
            rngs={"dropout": key}, deterministic=False, fused=fused,
        )
        return -logp.sum(-1).mean() / 50.0

    fwd = jax.jit(loss_fn)
    grad_fn = jax.jit(jax.grad(loss_fn))

    # The tunnel link to this chip has a ~27 ms host-fetch RTT and
    # block_until_ready returns early on the axon platform, so single-call
    # timing is meaningless.  Dispatch a chain of steps (device executes them
    # back-to-back in dispatch order), force completion with one host fetch of
    # the last output, and take the SLOPE between two chain lengths so the
    # fixed RTT/dispatch overhead cancels.
    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    def chain_time(fn, n_reps):
        t0 = time.time()
        out = None
        for _ in range(n_reps):
            out = fn()
        _sync(out)
        return time.time() - t0

    def timeit(fn, reps_lo=10, reps_hi=40):
        _sync(fn())  # compile + settle
        lo = min(chain_time(fn, reps_lo) for _ in range(3))
        hi = min(chain_time(fn, reps_hi) for _ in range(3))
        return (hi - lo) / (reps_hi - reps_lo) * 1e3

    key = jax.random.PRNGKey(1)
    fwd_ms = timeit(lambda: fwd(params, frames, labels_dev, key))
    bwd_ms = timeit(lambda: grad_fn(params, frames, labels_dev, key))

    # full step threads state through, which sequences naturally
    holder = {"s": state}

    def one_step():
        holder["s"], m = step(holder["s"], frames, labels_dev, key)
        return m["loss"]

    t_step = timeit(one_step)

    report = {
        "backend": jax.default_backend(),
        "batch": n,
        "seconds": args.seconds,
        "T": t_frames,
        "bf16": args.bf16,
        "fused": fused,
        "host_label_encode_ms": round(host_encode_ms, 2),
        "fwd_ms": round(fwd_ms, 2),
        "fwd_bwd_ms": round(bwd_ms, 2),
        "full_step_ms": round(t_step, 2),
        "audio_sec_per_step": n * args.seconds,
        "train_rtf": round(n * args.seconds / (t_step / 1e3), 1),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
