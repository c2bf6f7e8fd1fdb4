"""Isolate the T-attention layout question on the chip: the T block runs at
~54 TFLOPS effective vs the F block's ~85 at identical FLOPs
(ARCHITECTURE "Encoder per-op roofline").  Compare, slope-timed:

  A. shipped path: swapaxes to [N, F, T, D], attention over axis -2
     (ops.attention_pallas.attention on the flattened lead)
  B. transpose-free einsum: q/k/v projected on the [N, T, F, D] stream and
     the cores contracted directly over the T axis — XLA chooses layouts

Run ALONE on the chip (1-core host).
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from transkun_tpu.ops import attention_pallas


def main():
    N, T, F, D, H = 1, 88, 149, 256, 8
    dh = D // H
    scale = 1.0 / math.sqrt(dh)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(N, T, F, D)), dt)
    Wq, Wk, Wv, Wo = (
        jnp.asarray(rng.normal(size=(D, D)) * 0.05, dt) for _ in range(4)
    )

    @jax.jit
    def path_a(x, Wq, Wk, Wv, Wo):
        h = jnp.swapaxes(x, -3, -2)  # [N, F, T, D]
        q, k, v = h @ Wq, h @ Wk, h @ Wv
        qf = q.reshape(-1, T, D)
        out = attention_pallas.attention(
            qf, k.reshape(-1, T, D), v.reshape(-1, T, D), H, scale
        )
        out = out.reshape(N, F, T, D) @ Wo
        return jnp.swapaxes(out, -3, -2)

    @jax.jit
    def path_b(x, Wq, Wk, Wv, Wo):
        q = (x @ Wq).reshape(N, T, F, H, dh)
        k = (x @ Wk).reshape(N, T, F, H, dh)
        v = (x @ Wv).reshape(N, T, F, H, dh)
        logits = jnp.einsum("nqfhd,nkfhd->nfhqk", q, k) * scale
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m)
        out = jnp.einsum("nfhqk,nkfhd->nqfhd", p, v)
        den = jnp.sum(p, axis=-1)  # [n, f, h, q]
        out = out / jnp.moveaxis(den, -1, 1)[..., None]
        return out.reshape(N, T, F, D) @ Wo

    # parity first (f32 on CPU-equivalent math is close enough in bf16)
    ya = np.asarray(path_a(x, Wq, Wk, Wv, Wo), np.float32)
    yb = np.asarray(path_b(x, Wq, Wk, Wv, Wo), np.float32)
    err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
    print(f"rel err A vs B: {err:.2e}")

    def slope(fn, n1=100, n2=800):
        out = fn(x, Wq, Wk, Wv, Wo)
        np.asarray(out[0, 0, 0, :1])
        def chain(n):
            t0 = time.time()
            for _ in range(n):
                out = fn(x, Wq, Wk, Wv, Wo)
            np.asarray(out[0, 0, 0, :1])
            return time.time() - t0
        lo = min(chain(n1) for _ in range(3))
        hi = min(chain(n2) for _ in range(3))
        return (hi - lo) / (n2 - n1) * 1e3

    ta = slope(path_a)
    tb = slope(path_b)
    print(f"A swap+axis(-2) attention: {ta:.3f} ms")
    print(f"B transpose-free einsum : {tb:.3f} ms")


if __name__ == "__main__":
    main()
