"""Bisect the backbone's time: DownConv alone, per-encoder-layer slope
(nLayers 0/2/4/6), F-vs-T attention, and the MHA kernel in isolation.
Slope-timed through the tunnel (see profile_train.py)."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf
    from transkun_tpu.models.transkun import target_midi_pitches
    from transkun_tpu.models.layers import BasicBlock, MultiHeadAttention
    from transkun_tpu.ops import frontend

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

    def chain_time(fn, n_reps):
        t0 = time.time()
        out = None
        for _ in range(n_reps):
            out = fn()
        _sync(out)
        return time.time() - t0

    def timeit(fn, reps_lo=5, reps_hi=20):
        _sync(fn())
        lo = min(chain_time(fn, reps_lo) for _ in range(3))
        hi = min(chain_time(fn, reps_hi) for _ in range(3))
        return (hi - lo) / (reps_hi - reps_lo) * 1e3

    _, conf = load_default_conf()
    dtype = jnp.bfloat16 if args.bf16 else None
    n = args.batch
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(n, int(16.0 * conf.fs), 1)) * 0.1).astype(np.float32)
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, conf.hopSize, conf.windowSize)
    pitches = jnp.asarray(target_midi_pitches(), jnp.float32)

    report = {"batch": n, "bf16": args.bf16}

    # per-layer slope: backbone fwd at nLayers 2 vs 6
    def backbone_ms(n_layers):
        c = conf.replace(nLayers=n_layers) if hasattr(conf, "replace") else None
        if c is None:
            import dataclasses
            c = dataclasses.replace(conf, nLayers=n_layers)
        m = TransKun(c, compute_dtype=dtype)
        p = m.init(jax.random.PRNGKey(0), n_frames=frames.shape[2])
        f = jax.jit(lambda pp, fr: m.module.apply(
            pp, fr, method=lambda mm, q: mm.backbone(mm.frontend(q), pitches, True)
        ))
        return timeit(lambda: f(p, frames))

    ms6 = backbone_ms(6)
    ms2 = backbone_ms(2)
    ms0 = backbone_ms(0)
    report["backbone6_ms"] = round(ms6, 2)
    report["backbone2_ms"] = round(ms2, 2)
    report["backbone0_ms"] = round(ms0, 2)  # convs + embeds + upsample only
    report["per_layer_ms"] = round((ms6 - ms2) / 4, 2)

    # one BasicBlock on the real lattice shape, F+T vs F vs T
    tp, fpp, d = 88, 149, 4 * conf.baseSize
    h = jnp.asarray(rng.normal(size=(n, tp, fpp, d)), dtype or jnp.float32)
    for enabled in [("F", "T"), ("F",), ("T",)]:
        blk = BasicBlock(
            size=d, num_heads=conf.nHead, hidden_factor=2.0,
            hidden_factor_attn=1.0, enabled=enabled, dropout=0.0, dtype=dtype,
        )
        pb = blk.init(jax.random.PRNGKey(0), h, True)
        fb = jax.jit(lambda pp, hh: blk.apply(pp, hh, True))
        report[f"block_{''.join(enabled)}_ms"] = round(timeit(lambda: fb(pb, h)), 2)

    # bare MHA at the F-attention shape: [N*T', F'+P, D]
    seq = h.reshape(n * tp, fpp, d)
    mha = MultiHeadAttention(
        embed_dim=d, num_heads=conf.nHead, hidden_factor=1.0, dtype=dtype
    )
    pm = mha.init(jax.random.PRNGKey(0), seq)
    fm = jax.jit(lambda pp, ss: mha.apply(pp, ss))
    report["mha_F_shape_ms"] = round(timeit(lambda: fm(pm, seq)), 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
