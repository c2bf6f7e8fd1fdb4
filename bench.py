"""Transcription throughput benchmark: audio-seconds per wall-second per chip.

Runs the flagship V2 configuration (baseSize 64, 8 heads, 6 layers — the
shipped-checkpoint architecture) over synthetic audio on the available
accelerator, measuring the steady-state streaming `transcribe` path: frames ->
mel -> backbone -> scorer -> Viterbi tables on device, pointer walk + event
assembly on host.  Prints ONE JSON line; vs_baseline is measured against the
BASELINE.json north star of 50x real time per chip.
"""

import json
import time

import numpy as np


def main():
    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf

    _, conf = load_default_conf()
    model = TransKun(conf, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), n_frames=691)

    # Random weights fire spurious singleton events (diag scores ~ 0), which
    # only inflates *host* assembly work vs. a trained model.  Bias the
    # scorer's diagonal output negative so decoded event counts are realistic;
    # all device work is unchanged.
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    bias = np.asarray(params["params"]["scorer"]["map"]["bias"]).copy()
    bias[-1] = -8.0
    params["params"]["scorer"]["map"]["bias"] = jnp.asarray(bias)

    dur = 64.0  # seconds of audio per timed run
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(int(dur * conf.fs), 1)) * 0.05).astype(np.float32)
    # decoded wav/mp3 input is int16; quantizing keeps the bench honest AND
    # lets transcribe() ship the waveform over the link as int16
    audio = np.clip(np.round(audio * 32768), -32768, 32767).astype(np.float32) / 32768

    # warmup / compile (same length as the timed runs)
    model.transcribe(params, audio)
    trials = []
    for _ in range(5):
        t0 = time.time()
        model.transcribe(params, audio)
        trials.append(time.time() - t0)
    rtf = dur / sorted(trials)[2]  # median of 5 (the tunnel link is jittery)

    print(
        json.dumps(
            {
                "metric": "transcribe_rtf",
                "value": round(rtf, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(rtf / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
