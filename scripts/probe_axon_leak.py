"""Characterize the per-step host RSS leak seen on the axon (tunneled TPU)
platform during long training runs (round 4: ~5.8 MB/step — one float32
audio batch — up to OOM at ~125 GB; the CPU platform is clean at <10 KB/step
for the identical loop, see /tmp/leak_probe.py methodology in STATUS notes).

Runs a few isolation loops and prints RSS slope per variant:
  upload      fresh device_put of an N-MB array each iter, then del
  upload_del  same, with explicit .delete() before del
  compute     jit step on a PERSISTENT device array (no per-iter upload)
  up+compute  fresh upload + jit step (the training pattern)

Usage: python scripts/probe_axon_leak.py [--mb 5.4] [--iters 300]
(run on the axon platform; the chip must be free)
"""

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 2**20


def slope(fn, iters: int, warmup: int = 20) -> float:
    """MB/iter of RSS growth over `iters` calls of fn (after warmup)."""
    for _ in range(warmup):
        fn()
    gc.collect()
    r0 = rss_mb()
    for _ in range(iters):
        fn()
    gc.collect()
    return (rss_mb() - r0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=5.4)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args(argv)

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", flush=True)
    n = int(args.mb * 2**20 / 4)
    rng = np.random.default_rng(0)
    host = rng.standard_normal(n, dtype=np.float32)

    @jax.jit
    def step(x):
        return (x * 1.000001 + 0.5).sum()

    persistent = jax.device_put(host, dev)
    float(step(persistent))  # compile

    def upload():
        a = jax.device_put(host, dev)
        a.block_until_ready()
        del a

    def upload_del():
        a = jax.device_put(host, dev)
        a.block_until_ready()
        a.delete()

    def compute():
        float(step(persistent))

    def up_compute():
        a = jax.device_put(host, dev)
        float(step(a))
        del a

    small = host[: 64 * 1024 // 4].copy()  # 64 KB

    def upload_small():
        a = jax.device_put(small, dev)
        a.block_until_ready()
        del a

    big_dev = jax.device_put(host, dev)
    big_dev.block_until_ready()

    def fetch():
        np.asarray(big_dev)

    for name, fn in [
        ("upload", upload),
        ("upload_del", upload_del),
        ("compute", compute),
        ("up+compute", up_compute),
        ("upload_64k", upload_small),
        ("fetch", fetch),
    ]:
        s = slope(fn, args.iters)
        print(
            f"{name:12s} {s:+8.3f} MB/iter  "
            f"({s / args.mb * 100:+6.1f}% of payload)  rss={rss_mb():.0f} MB",
            flush=True,
        )
    print(f"live jax arrays: {len(jax.live_arrays())}", flush=True)


if __name__ == "__main__":
    main()
