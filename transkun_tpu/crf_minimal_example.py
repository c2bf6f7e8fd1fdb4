"""Minimal semi-CRF usage example (counterpart of
``transkun/crfMinimalExample.py``): score tensors in, interval decode out.

Run:  python -m transkun_tpu.crf_minimal_example
"""

import jax
import jax.numpy as jnp

from transkun_tpu.ops.semicrf import NeuralSemiCRFInterval


def main():
    T, n_batch = 200, 4
    score = jax.random.normal(jax.random.PRNGKey(0), (T, T, n_batch))
    noise_score = jax.random.normal(jax.random.PRNGKey(1), (T - 1, n_batch))

    crf = NeuralSemiCRFInterval(score, noise_score)

    # log probability of a given set of non-overlapping intervals per track
    intervals = [
        [(0, 2), (4, 6), (6, 6), (7, 8)],
        [(1, 2), (3, 5), (19, 19)],
        [(0, 0), (4, 7)],
        [],
    ]
    print("logProb:", crf.logProb(intervals))

    # MAP decoding
    print("decoded:", crf.decode())

    # forced start position (used for streaming segment stitching)
    print("decoded from frame 100:", crf.decode(forcedStartPos=[100] * n_batch))


if __name__ == "__main__":
    main()
