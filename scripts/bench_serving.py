"""Batch-serving throughput benchmark: ``transcribe_many`` over N pieces
(the production mode), vs sequential per-piece calls.

Prints one JSON line per mode.  Single-piece latency is bench.py's metric;
this measures sustained throughput when the device never idles between
pieces (piece-pipelined dispatch, one fetch per piece).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pieces", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=64.0)
    args = ap.parse_args()

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf

    _, conf = load_default_conf()
    model = TransKun(conf, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), n_frames=691)
    bias = np.asarray(params["params"]["scorer"]["map"]["bias"]).copy()
    bias[-1] = -8.0
    params["params"]["scorer"]["map"]["bias"] = jnp.asarray(bias)

    rng = np.random.default_rng(0)
    pieces = []
    for _ in range(args.pieces):
        a = (rng.normal(size=(int(args.seconds * conf.fs), 1)) * 0.05)
        a = np.clip(np.round(a * 32768), -32768, 32767).astype(np.float32) / 32768
        pieces.append(a)
    total = args.pieces * args.seconds

    list(model.transcribe_many(params, iter(pieces[:2])))  # warm/compile
    t0 = time.time()
    list(model.transcribe_many(params, iter(pieces)))
    dt = time.time() - t0
    print(json.dumps({
        "metric": "serving_rtf", "value": round(total / dt, 2),
        "unit": "audio-sec/sec/chip", "pieces": args.pieces,
        "vs_baseline": round(total / dt / 50.0, 3),
    }))

    t0 = time.time()
    for p in pieces:
        model.transcribe(params, p)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "sequential_rtf", "value": round(total / dt, 2),
        "unit": "audio-sec/sec/chip",
    }))


if __name__ == "__main__":
    main()
