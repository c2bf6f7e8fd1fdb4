"""Measure MXU throughput for the backbone's actual GEMM shapes and candidate
restructured shapes.  Slope-timed (see ARCHITECTURE.md "Timing methodology").

Run: python scripts/profile_gemm_sweep.py
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

    def timeit(fn, x, reps_lo=5, reps_hi=25):
        _sync(fn(x))
        lo = min(chain_time(fn, x, reps_lo) for _ in range(3))
        hi = min(chain_time(fn, x, reps_hi) for _ in range(3))
        return (hi - lo) / (reps_hi - reps_lo) * 1e3

    rng = np.random.default_rng(0)
    report = {}

    # x -> x@W chained (keeps output shape == input shape via a second proj
    # back). Chain fn(x) returns same-shaped x so dispatches compose.
    def gemm_case(name, m, k, n, dtype=jnp.bfloat16):
        w1 = jnp.asarray(rng.normal(size=(k, n)) * 0.01, dtype)
        w2 = jnp.asarray(rng.normal(size=(n, k)) * 0.01, dtype)
        x0 = jnp.asarray(rng.normal(size=(m, k)), dtype)

        @jax.jit
        def f(x):
            h = x @ w1
            # elementwise op between the GEMMs so XLA cannot reassociate
            # (x@w1)@w2 -> x@(w1@w2)
            h = jnp.maximum(h, h * 0.999)
            return h @ w2

        ms = timeit(f, x0)
        flops = 2 * 2 * m * k * n
        report[name] = {"ms": round(ms, 3), "tflops": round(flops / ms / 1e9, 1)}

    M = 26224  # 2 * 88 * 149 tokens at flagship train shape
    gemm_case("ffn_26k_256_1024", M, 256, 1024)
    gemm_case("proj_26k_256_256", M, 256, 256)
    gemm_case("qkv_26k_256_768", M, 256, 768)
    gemm_case("kv4_26k_256_1024", M, 256, 1024)
    gemm_case("wide_26k_512_2048", M // 2, 512, 2048)
    gemm_case("big_4096", 4096, 4096, 4096)
    gemm_case("ffn_f32", M, 256, 1024, jnp.float32)

    # attention core at F shape: [B,H,S,dh] logits+softmax+av, XLA
    def attn_case(name, b, h, s, dh, dtype=jnp.bfloat16):
        q0 = jnp.asarray(rng.normal(size=(b, h, s, dh)), dtype)
        k0 = jnp.asarray(rng.normal(size=(b, h, s, dh)), dtype)
        v0 = jnp.asarray(rng.normal(size=(b, h, s, dh)), dtype)

        @jax.jit
        def f(q):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k0) / np.sqrt(dh)
            p = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v0)
            return q + o.astype(q.dtype) * 1e-3

        ms = timeit(f, q0)
        report[name] = {"ms": round(ms, 3)}

    attn_case("attnF_xla_176_8_149_32", 176, 8, 149, 32)
    attn_case("attnT_xla_298_8_88_32", 298, 8, 88, 32)

    # softmax alone on the logits tensor
    l0 = jnp.asarray(rng.normal(size=(176, 8, 149, 149)), jnp.bfloat16)

    @jax.jit
    def sm(x):
        return jax.nn.softmax(x, axis=-1) + x * 1e-6

    report["softmax_logitsF"] = {"ms": round(timeit(sm, l0), 3)}

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
