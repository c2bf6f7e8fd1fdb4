"""Per-component train-step breakdown at flagship shape (slope-timed through
the tunnel: chain N dispatches, one host fetch, slope between two chain
lengths cancels the fixed ~27 ms RTT).

Components measured separately:
  frontend+backbone fwd | score emission fwd | logZ kernels fwd |
  logZ fwd+bwd (kernels + XLA marginal pass) | emission fwd+bwd (einsum VJP) |
  backbone fwd+bwd (remat recompute) | eval_path | attribute heads
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from transkun_tpu.utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from transkun_tpu.models import TransKun
    from transkun_tpu.models.config import load_default_conf
    from transkun_tpu.models.transkun import (
        TransKunModule,
        _pad_to,
        _track_pad,
        target_midi_pitches,
    )
    from transkun_tpu.ops import frontend, semicrf
    from transkun_tpu.ops import semicrf_pallas as sp

    _, conf = load_default_conf()
    dtype = jnp.bfloat16 if args.bf16 else None
    model = TransKun(conf, compute_dtype=dtype)

    n = args.batch
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(n, int(16.0 * conf.fs), 1)) * 0.1).astype(np.float32)
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, conf.hopSize, conf.windowSize)
    t = frames.shape[2]
    t_pad, p_pad = _pad_to(t, 8), _track_pad(n, 90)
    nbp = n * p_pad
    print(f"T={t} Tp={t_pad} lanes={nbp} (real {n * 90})")

    params = model.init(jax.random.PRNGKey(0), n_frames=t)
    pitches = jnp.asarray(target_midi_pitches(), jnp.float32)

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

    report = {"batch": n, "bf16": args.bf16}

    # 1. frontend+backbone forward
    def fb(p, f):
        feats = model.module.apply(
            p, f, method=lambda m, fr: m.backbone(m.frontend(fr), pitches, True)
        )
        return feats

    fb_jit = jax.jit(fb)
    report["backbone_fwd_ms"] = round(timeit(lambda: fb_jit(params, frames)), 2)

    ctx = fb_jit(params, frames)
    ctx = jax.block_until_ready(ctx)

    # 2. fused score emission from ctx
    def emit(p, c):
        return model.module.apply(
            p, c, t_pad, p_pad,
            method=lambda m, cc, tp_, pp_: m.scorer.train_scores(cc, tp_, pp_),
        )

    emit_jit = jax.jit(emit)
    report["emission_fwd_ms"] = round(timeit(lambda: emit_jit(params, ctx)), 2)

    s_pad, noise_pad = emit_jit(params, ctx)
    s_pad = jax.block_until_ready(s_pad)

    # 3. logZ kernels forward (alpha + beta)
    lz_jit = jax.jit(lambda s, nz: sp.log_z_padded(t, s, nz).sum())
    report["logz_fwd_ms"] = round(timeit(lambda: lz_jit(s_pad, noise_pad)), 2)

    # 4. logZ fwd+bwd (adds the XLA marginal pass + grad materialization)
    lzg_jit = jax.jit(jax.grad(lambda s, nz: sp.log_z_padded(t, s, nz).sum()))
    report["logz_fwd_bwd_ms"] = round(timeit(lambda: lzg_jit(s_pad, noise_pad)), 2)

    # 5. emission fwd+bwd (einsum VJP wrt ctx and params); surrogate objective
    # = sum of unmasked scores (same VJP structure as the real cotangent)
    emitg_jit = jax.jit(
        jax.grad(
            lambda p, c: jnp.sum(
                jnp.where(emit(p, c)[0] > semicrf.NEG / 2, emit(p, c)[0], 0.0)
            ),
            argnums=(0, 1),
        )
    )
    report["emission_fwd_bwd_ms"] = round(
        timeit(lambda: emitg_jit(params, ctx)), 2
    )

    # 6. backbone fwd+bwd (remat recompute cost)
    fbg_jit = jax.jit(
        jax.grad(lambda p, f: jnp.sum(fb(p, f).astype(jnp.float32)))
    )
    report["backbone_fwd_bwd_ms"] = round(timeit(lambda: fbg_jit(params, frames)), 2)

    # 7. viterbi decode kernel (for reference vs training kernels); feeding
    # the alpha-layout tensor is fine for timing — same shapes and traffic
    vit_jit = jax.jit(
        lambda s, nz: sp.viterbi_backward_tables_padded(
            s, nz, jnp.zeros((t_pad, nbp), jnp.float32)
        )
    )
    report["viterbi_kernel_ms"] = round(timeit(lambda: vit_jit(s_pad, noise_pad)), 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
