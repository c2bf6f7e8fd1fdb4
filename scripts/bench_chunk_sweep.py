"""Sweep streaming-decode geometry (segment_batch x chunk_steps) on the real
chip: times the bench.py workload (64 s piece, flagship config) for each
combo.  Run ALONE (1-core host).  Decides decode_chunk_steps' auto rule."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from transkun_tpu.models import TransKun
from transkun_tpu.models.config import load_default_conf


def main():
    _, conf = load_default_conf()
    model = TransKun(conf, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), n_frames=691)
    bias = np.asarray(params["params"]["scorer"]["map"]["bias"]).copy()
    bias[-1] = -8.0
    params["params"]["scorer"]["map"]["bias"] = jnp.asarray(bias)

    dur = 64.0
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(int(dur * conf.fs), 1)) * 0.05).astype(np.float32)
    audio = np.clip(np.round(audio * 32768), -32768, 32767).astype(np.float32) / 32768

    report = {}
    combos = [(5, 1), (5, 5), (2, 2), (2, 1), (4, 2)]
    if len(sys.argv) > 1:
        combos = [tuple(map(int, c.split(","))) for c in sys.argv[1].split()]
    for sb, m in combos:
        model.decode_chunk_steps = m
        print(f"compiling sb={sb} m={m} ...", flush=True)
        model.transcribe(params, audio, segment_batch=sb)  # compile
        trials = []
        for _ in range(5):
            t0 = time.time()
            model.transcribe(params, audio, segment_batch=sb)
            trials.append(time.time() - t0)
        med = sorted(trials)[2]
        report[f"sb{sb}_m{m}"] = round(dur / med, 1)
        print(f"sb={sb} m={m}: {dur/med:6.1f}x  (med {med*1e3:.0f} ms)", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
