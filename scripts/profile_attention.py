"""Fused Pallas attention vs XLA einsum attention at the backbone's real
shapes, fwd and fwd+bwd.  Slope-timed (ARCHITECTURE.md "Timing methodology")."""

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

    from transkun_tpu.ops import attention_pallas as ap

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

    def chain_time(fn, x, n_reps):
        t0 = time.time()
        out = x
        for _ in range(n_reps):
            out = fn(out)
        _sync(out)
        return time.time() - t0

    def timeit(fn, x, reps_lo=20, reps_hi=120):
        _sync(fn(x))
        lo = min(chain_time(fn, x, reps_lo) for _ in range(3))
        hi = min(chain_time(fn, x, reps_hi) for _ in range(3))
        return (hi - lo) / (reps_hi - reps_lo) * 1e3

    rng = np.random.default_rng(0)
    report = {}
    h, dh = 8, 32
    d = h * dh
    scale = 1.0 / np.sqrt(dh)

    for name, b, s in [
        ("F_train", 176, 149),
        ("T_train", 298, 88),
        ("F_decode", 712, 149),  # segment_batch 8: (8+... ) x T' lattice rows
    ]:
        q0 = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)
        k0 = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)
        v0 = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)

        def f_pallas(q):
            o = ap.fused_attention(q, k0, v0, h, scale)
            return o + q * 1e-6

        def f_xla(q):
            o = ap.attention_xla(q, k0, v0, h, scale)
            return o + q * 1e-6

        report[f"{name}_pallas_ms"] = round(timeit(jax.jit(f_pallas), q0), 3)
        print(name, "pallas fwd", report[f"{name}_pallas_ms"], flush=True)
        report[f"{name}_xla_ms"] = round(timeit(jax.jit(f_xla), q0), 3)
        print(name, "xla fwd", report[f"{name}_xla_ms"], flush=True)

        def g_pallas(q):
            return jax.grad(
                lambda qq: jnp.sum(ap.fused_attention(qq, k0, v0, h, scale))
            )(q) * 1e-6 + q

        def g_xla(q):
            return jax.grad(
                lambda qq: jnp.sum(ap.attention_xla(qq, k0, v0, h, scale))
            )(q) * 1e-6 + q

        report[f"{name}_grad_pallas_ms"] = round(timeit(jax.jit(g_pallas), q0), 3)
        print(name, "pallas grad", report[f"{name}_grad_pallas_ms"], flush=True)
        report[f"{name}_grad_xla_ms"] = round(timeit(jax.jit(g_xla), q0), 3)
        print(name, "xla grad", report[f"{name}_grad_xla_ms"], flush=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
