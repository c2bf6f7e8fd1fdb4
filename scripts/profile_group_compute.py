"""Slope-time the fused decode group program per segment_batch on resident
inputs: how much device time does one group of sb segments cost?  Informs the
progressive group schedule (small first groups for upload/compute overlap).
Run ALONE on the chip."""

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
from transkun_tpu.ops import semicrf


def main():
    _, conf = load_default_conf()
    model = TransKun(conf, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), n_frames=691)
    bias = np.asarray(params["params"]["scorer"]["map"]["bias"]).copy()
    bias[-1] = -8.0
    params["params"]["scorer"]["map"]["bias"] = jnp.asarray(bias)

    fs = conf.fs
    step_sec, seg_sec = model.segmentHopSizeInSecond, model.segmentSizeInSecond
    import math
    step_size = math.ceil(step_sec * fs / model.hopSize) * model.hopSize
    segment_size = math.ceil(seg_sec * fs)
    last_frame_idx = round(segment_size / model.hopSize)
    step_frames = int(step_size / model.hopSize)
    n_sym = len(model.targetMIDIPitch)
    chunk_len = step_size

    rng = np.random.default_rng(0)
    for sb in (1, 2, 3, 4, 5, 8):
        span = (sb - 1) * step_size + segment_size
        n_cover = -(-span // chunk_len)
        chunks = [
            jax.device_put(
                (rng.normal(size=(1, chunk_len)) * 1638).astype(np.int16)
            )
            for _ in range(n_cover)
        ]
        k_budget = 2048 * (sb + 1)
        fn = model._get_fused_chunk_fn(
            last_frame_idx, step_frames, segment_size, step_size, sb,
            model.decode_k_max, k_budget, 0, n_cover,
        )
        start = jax.device_put(np.zeros((n_sym,), np.int32))

        def chain(n, start):
            t0 = time.time()
            for _ in range(n):
                out = fn(params, start, *chunks, criterion="hamming",
                         onset_bound=-1)
                start = out[7]
            np.asarray(out[6])
            return time.time() - t0

        chain(1, start)  # compile
        lo = min(chain(4, start) for _ in range(3))
        hi = min(chain(12, start) for _ in range(3))
        per = (hi - lo) / 8 * 1e3
        print(
            f"sb={sb}: {per:7.1f} ms/group  {per/sb:6.1f} ms/segment",
            flush=True,
        )


if __name__ == "__main__":
    main()
