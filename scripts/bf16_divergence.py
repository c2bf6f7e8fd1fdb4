"""Quantify bf16 decode divergence at flagship shape (VERDICT round-2 item 3).

The driver bench runs ``compute_dtype=bfloat16`` while all parity tests run
fp32; this script measures what bf16 actually changes at the product
operating point: transcribe a synthetic corpus with the SAME flagship-shape
weights in fp32 and bf16 and report the note-event flip rate, matched-event
timing/velocity deltas, and per-segment logZ error.

Run on the chip: python scripts/bf16_divergence.py [--pieces 3] [--dur 30]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_piece(rng, dur, fs):
    """Piano-ish synthetic audio: decaying harmonics at note onsets."""
    t = np.arange(int(dur * fs)) / fs
    x = np.zeros(len(t), np.float32)
    cur = 0.2
    while cur < dur - 0.8:
        pitch = int(rng.integers(30, 100))
        f0 = 440 * 2 ** ((pitch - 69) / 12)
        length = float(rng.uniform(0.15, 1.2))
        seg = (t >= cur) & (t < cur + length)
        env = np.exp(-(t[seg] - cur) * 3.0).astype(np.float32)
        for h in (1, 2, 3):
            if f0 * h < fs / 2:
                x[seg] += (0.15 / h) * env * np.sin(
                    2 * np.pi * f0 * h * t[seg]
                ).astype(np.float32)
        cur += float(rng.uniform(0.08, 0.5))
    x = np.clip(x, -1, 1)
    # int16-exact like every decoded wav (the int16 link requirement)
    return (x * 32000).astype(np.int16).astype(np.float32)[:, None] / 32768.0


def match_rate(a, b):
    """Fraction of events agreeing between two transcriptions (pitch equal,
    onset/offset within 1 ms), plus stats on matched deltas."""
    key = lambda n: (n.pitch, n.start, n.end)
    sa, sb = sorted(a, key=key), sorted(b, key=key)
    i = j = matched = vel_same = 0
    dt = []
    while i < len(sa) and j < len(sb):
        x, y = sa[i], sb[j]
        if x.pitch == y.pitch and abs(x.start - y.start) < 1e-3 and abs(x.end - y.end) < 1e-3:
            matched += 1
            vel_same += x.velocity == y.velocity
            dt.append(max(abs(x.start - y.start), abs(x.end - y.end)))
            i += 1
            j += 1
        elif key(x) < key(y):
            i += 1
        else:
            j += 1
    total = max(len(a), len(b))
    return matched, vel_same, total, (float(np.max(dt)) if dt else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pieces", type=int, default=3)
    ap.add_argument("--dur", type=float, default=30.0)
    ap.add_argument("--diag-bias", type=float, default=-2.0)
    ap.add_argument(
        "--weight", default=None,
        help="trained checkpoint (orbax dir or .pt).  With real weights the "
        "decode has trained margins instead of the pathological zero-margin "
        "ties random init produces; --diag-bias is ignored",
    )
    ap.add_argument(
        "--wav", default=None,
        help="transcribe this wav instead of synthetic pieces (repeatable "
        "via a directory is NOT supported; single file)",
    )
    args = ap.parse_args()

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf
    from transkun_tpu.ops import frontend
    from transkun_tpu.models.transkun import TransKunModule
    from transkun_tpu.ops import semicrf

    _, conf = load_default_conf()
    rng = np.random.default_rng(0)

    m32 = TransKun(conf)
    m16 = TransKun(conf, compute_dtype=jnp.bfloat16)
    if args.weight:
        from transkun_tpu.train.checkpoint import load_params

        params = load_params(args.weight, conf)  # full variables dict
        if "params" not in params:
            params = {"params": params}
    else:
        params = m32.init(jax.random.PRNGKey(0), n_frames=691)
        # moderate event density: random-init diag fires singletons on ~half
        # of all frame/track slots; a mild negative bias yields a realistic
        # decode
        params["params"]["scorer"]["map"]["bias"] = (
            params["params"]["scorer"]["map"]["bias"].at[-1].add(args.diag_bias)
        )

    report = {
        "pieces": args.pieces,
        "dur": args.dur,
        "diag_bias": None if args.weight else args.diag_bias,
        "weight": args.weight,
    }

    # per-segment logZ error, fp32 vs bf16 (the training objective's dtype
    # sensitivity at flagship shape)
    audio0 = synth_piece(rng, 16.0, conf.fs)
    x = jnp.asarray(audio0.T)[None]
    frames = frontend.make_frame(x, conf.hopSize, conf.windowSize)

    def logz(model, p, fr):
        s, noise, ctx = model.module.apply(
            p, fr, True, method=TransKunModule.process_frames
        )
        return semicrf.log_z_best(s.astype(jnp.float32), noise.astype(jnp.float32))

    lz32 = np.asarray(jax.jit(lambda p, f: logz(m32, p, f))(params, frames), np.float64)
    lz16 = np.asarray(jax.jit(lambda p, f: logz(m16, p, f))(params, frames), np.float64)
    report["logz_mean_abs"] = float(np.mean(np.abs(lz32)))
    report["logz_max_abs_err"] = float(np.max(np.abs(lz32 - lz16)))
    report["logz_max_rel_err"] = float(
        np.max(np.abs(lz32 - lz16) / np.maximum(np.abs(lz32), 1.0))
    )

    if args.wav:
        from scipy.io import wavfile

        fs, wav = wavfile.read(args.wav)
        assert fs == conf.fs, (fs, conf.fs)
        if wav.ndim == 1:
            wav = wav[:, None]
        pieces = [wav.astype(np.float32) / 32768.0]
    else:
        pieces = [synth_piece(rng, args.dur, conf.fs) for _ in range(args.pieces)]

    total_events = total_matched = total_vel = 0
    worst_dt = 0.0
    for i, audio in enumerate(pieces):
        n32 = m32.transcribe(params, audio)
        n16 = m16.transcribe(params, audio)
        matched, vel_same, total, wdt = match_rate(n32, n16)
        total_events += total
        total_matched += matched
        total_vel += vel_same
        worst_dt = max(worst_dt, wdt)
        print(
            f"piece {i}: fp32 {len(n32)} / bf16 {len(n16)} events, "
            f"matched {matched}, vel equal {vel_same}",
            file=sys.stderr, flush=True,
        )

    report["events"] = total_events
    report["event_flip_rate"] = round(1 - total_matched / max(total_events, 1), 5)
    report["velocity_flip_rate_matched"] = round(
        1 - total_vel / max(total_matched, 1), 5
    )
    report["max_matched_time_delta_s"] = worst_dt
    print(json.dumps(report))


if __name__ == "__main__":
    main()
