"""Streaming-transcription benchmark WITH the decoded event rate reported
(VERDICT round-2 item 9).

Finding (which reshaped this script): the decoded event rate of a
random-init flagship model is INSENSITIVE to the scorer diagonal bias
(~227 events/s at every bias in [-8, -4]) — the decodes are non-singleton
intervals driven by the qk products, so ``bench.py``'s configuration
already runs at ~10x realistic piano density (~10-20 events/s) and
exercises compaction + host assembly HARDER than a trained model would.
This bench therefore times the standard 64 s streaming transcribe and
reports the measured events/sec alongside the RTF, rather than "tuning to
realistic density" (which the bias cannot do on random weights).

Run: python scripts/bench_density.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    rng = np.random.default_rng(0)

    def with_bias(b):
        p = jax.tree_util.tree_map(lambda x: x, params)
        bias = np.asarray(p["params"]["scorer"]["map"]["bias"]).copy()
        bias[-1] = b
        p["params"]["scorer"]["map"]["bias"] = jnp.asarray(bias)
        return p

    # Measured: the decoded event rate is INSENSITIVE to the diagonal bias
    # (227 events/s on the probe at every bias in [-8, -4]): random-init
    # decodes are non-singleton (b<e) intervals driven by the qk products,
    # so the headline bench.py configuration ALREADY runs at ~10x realistic
    # piano density (~10-20 events/s) — the compaction budget and host
    # assembly are exercised harder than a trained model would.  This bench
    # simply reports the event rate alongside the RTF at the bench config.
    bias = -8.0
    p = with_bias(bias)
    dur = 64.0
    audio = (rng.normal(size=(int(dur * conf.fs), 1)) * 0.05).astype(np.float32)
    audio = np.clip(np.round(audio * 32768), -32768, 32767).astype(np.float32) / 32768

    notes = model.transcribe(p, audio)  # warmup/compile
    trials = []
    for _ in range(5):
        t0 = time.time()
        model.transcribe(p, audio)
        trials.append(time.time() - t0)
    rtf = dur / sorted(trials)[2]

    print(json.dumps({
        "metric": "transcribe_rtf_with_event_rate",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip",
        "events_per_sec": round(len(notes) / dur, 2),
        "diag_bias": round(bias, 3),
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
