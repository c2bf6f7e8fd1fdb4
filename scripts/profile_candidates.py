"""One-shot clean benchmark of every backbone-MFU candidate, to be run ALONE
on the chip (1-core host: any concurrent CPU load pollutes dispatch timing).

A. jax.nn.softmax vs Pallas row softmax on the F-attention logits
B. exp-trick attention (ones-column, no explicit softmax) vs standard XLA
C. separate vs fused kv / qkv projection GEMMs
D. Pallas fused-MLP (hidden stays in VMEM) vs XLA Dense-gelu-Dense
E. one encoder BasicBlock with and without the Pallas softmax

Run: python scripts/profile_candidates.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from transkun_tpu.utils.jax_setup import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

report = {}


def _sync(o):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(o)[0])[0]))


def timeit(f, x, n_lo=10, n_hi=60):
    _sync(f(x))

    def chain(n):
        t0 = time.time()
        out = x
        for _ in range(n):
            out = f(out)
        _sync(out)
        return time.time() - t0

    lo = min(chain(n_lo) for _ in range(3))
    hi = min(chain(n_hi) for _ in range(3))
    return (hi - lo) / (n_hi - n_lo) * 1e3


rng = np.random.default_rng(0)
B, S, H, DH = 176, 149, 8, 32
D = H * DH
scale = 1.0 / np.sqrt(DH)

# ---------------- A: softmax ----------------
l4 = jnp.asarray(rng.normal(size=(B, H, S, S)), jnp.bfloat16)

from transkun_tpu.ops import softmax_pallas as sp


def a_xla(x):
    return jax.nn.softmax(x, axis=-1) + x * 1e-6


def a_pallas(x):
    return sp._softmax_rows(x.reshape(-1, S)).reshape(x.shape) + x * 1e-6


report["A_softmax_xla"] = round(timeit(jax.jit(a_xla), l4), 3)
print("A xla", report["A_softmax_xla"], flush=True)
for rb in (1024, 2048, 4096):
    sp._ROW_BLOCK = rb
    report[f"A_softmax_pallas_rb{rb}"] = round(timeit(jax.jit(a_pallas), l4), 3)
    print("A pallas", rb, report[f"A_softmax_pallas_rb{rb}"], flush=True)
sp._ROW_BLOCK = 2048

# ---------------- B: attention core, standard vs exp-trick ----------------
qh = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)
kh = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)
vh = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)


def b_standard(q):
    l = jnp.einsum("bhqd,bhkd->bhqk", q, kh) * scale
    p = jax.nn.softmax(l, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return q + o * 1e-6


def b_exp_trick(q):
    l = jnp.einsum("bhqd,bhkd->bhqk", q, kh).astype(jnp.float32) * scale
    m = jnp.max(l, axis=-1, keepdims=True)
    p = jnp.exp(l - m).astype(jnp.bfloat16)
    v_ext = jnp.concatenate([vh, jnp.ones((B, H, S, 1), vh.dtype)], axis=-1)
    o_ext = jnp.einsum("bhqk,bhkd->bhqd", p, v_ext)
    o = o_ext[..., :DH] / o_ext[..., DH:]
    return q + o.astype(q.dtype) * 1e-6


def b_pallas_sm(q):
    l = jnp.einsum("bhqd,bhkd->bhqk", q, kh) * scale
    p = sp._softmax_rows(l.reshape(-1, S)).reshape(l.shape)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return q + o * 1e-6


report["B_attn_standard"] = round(timeit(jax.jit(b_standard), qh), 3)
print("B std", report["B_attn_standard"], flush=True)
report["B_attn_exp_trick"] = round(timeit(jax.jit(b_exp_trick), qh), 3)
print("B exp", report["B_attn_exp_trick"], flush=True)
report["B_attn_pallas_sm"] = round(timeit(jax.jit(b_pallas_sm), qh), 3)
print("B psm", report["B_attn_pallas_sm"], flush=True)

# ---------------- C: projection GEMM fusion ----------------
M = 26224
x0 = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
wk = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
wv = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
wq = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
wkv = jnp.concatenate([wk, wv], axis=1)
wqkv = jnp.concatenate([wq, wk, wv], axis=1)


def guard(h):
    return jnp.maximum(h, h * 0.999)


def c_two(x):
    return guard(x @ wk)[:, :D] * 1e-6 + guard(x @ wv)[:, :D] * 1e-6 + x


def c_kv(x):
    return guard(x @ wkv)[:, :D] * 1e-6 + x


def c_three(x):
    return (guard(x @ wq)[:, :D] + guard(x @ wk)[:, :D] + guard(x @ wv)[:, :D]) * 1e-6 + x


def c_qkv(x):
    return guard(x @ wqkv)[:, :D] * 1e-6 + x


for name, f in [("C_kv_two", c_two), ("C_kv_fused", c_kv),
                ("C_qkv_three", c_three), ("C_qkv_fused", c_qkv)]:
    report[name] = round(timeit(jax.jit(f), x0), 3)
    print(name, report[name], flush=True)

# ---------------- D: fused MLP ----------------
HID = 1024
w1 = jnp.asarray(rng.normal(size=(D, HID)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(HID, D)) * 0.02, jnp.bfloat16)
b1 = jnp.zeros((HID,), jnp.float32)
b2 = jnp.zeros((D,), jnp.float32)


def d_xla(x):
    h = jax.nn.gelu((x @ w1).astype(jnp.float32) + b1, approximate=False)
    return (h.astype(jnp.bfloat16) @ w2) * 1e-6 + x


def _mlp_kernel(x_ref, w1_ref, w2_ref, o_ref):
    from transkun_tpu.ops.mlp_pallas import _gelu_erf

    x = x_ref[...]
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = _gelu_erf(h).astype(x.dtype)
    o_ref[...] = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32).astype(o_ref.dtype)


def d_pallas_mk(rows):
    mpad = -(-M // rows) * rows

    def f(x):
        xp = jnp.pad(x, ((0, mpad - M), (0, 0))) if mpad != M else x
        out = pl.pallas_call(
            _mlp_kernel,
            grid=(mpad // rows,),
            in_specs=[
                pl.BlockSpec((rows, D), lambda i: (i, 0)),
                pl.BlockSpec((D, HID), lambda i: (0, 0)),
                pl.BlockSpec((HID, D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((mpad, D), x.dtype),
        )(xp, w1, w2)
        return out[:M] * 1e-6 + x

    return f


report["D_mlp_xla"] = round(timeit(jax.jit(d_xla), x0), 3)
print("D xla", report["D_mlp_xla"], flush=True)
for rows in (512, 1024, 2048):
    try:
        report[f"D_mlp_pallas_r{rows}"] = round(timeit(jax.jit(d_pallas_mk(rows)), x0), 3)
    except Exception as e:  # noqa
        report[f"D_mlp_pallas_r{rows}"] = str(e)[:120]
    print("D pallas", rows, report[f"D_mlp_pallas_r{rows}"], flush=True)

# ---------------- E: full BasicBlock with/without pallas softmax ----------
from transkun_tpu.models.layers import BasicBlock

h0 = jnp.asarray(rng.normal(size=(2, 88, 149, D)), jnp.bfloat16)
blk = BasicBlock(size=D, num_heads=H, hidden_factor=4.0, hidden_factor_attn=1.0,
                 enabled=("F", "T"), dropout=0.0, dtype=jnp.bfloat16)
pb = blk.init(jax.random.PRNGKey(0), h0, True)

os.environ.pop("TRANSKUN_TPU_FUSED_SOFTMAX", None)
fb = jax.jit(lambda hh: blk.apply(pb, hh, True) * (1 - 1e-6) + hh * 1e-6)
report["E_block_xla_sm"] = round(timeit(fb, h0), 3)
print("E xla", report["E_block_xla_sm"], flush=True)

os.environ["TRANSKUN_TPU_FUSED_SOFTMAX"] = "1"
fb2 = jax.jit(lambda hh: blk.apply(pb, hh, True) * (1 - 2e-6) + hh * 2e-6)
report["E_block_pallas_sm"] = round(timeit(fb2, h0), 3)
print("E psm", report["E_block_pallas_sm"], flush=True)
os.environ.pop("TRANSKUN_TPU_FUSED_SOFTMAX", None)

print(json.dumps(report, indent=1))
