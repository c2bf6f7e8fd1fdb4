"""Profiling / observability helpers: RTF counters (the BASELINE north-star
metric), phase timers, and jax.profiler trace capture."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class RTFMeter:
    """Tracks audio-seconds processed per wall-second (real-time factor)."""

    def __init__(self):
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0

    @contextlib.contextmanager
    def measure(self, audio_seconds: float):
        t0 = time.time()
        yield
        self.wall_seconds += time.time() - t0
        self.audio_seconds += audio_seconds

    @property
    def rtf(self) -> float:
        return self.audio_seconds / max(self.wall_seconds, 1e-9)


class PhaseTimer:
    """Accumulating named phase timer for pipeline breakdowns."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        yield
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]*1e3:.1f} ms total, "
                f"{self.totals[name]/max(self.counts[name],1)*1e3:.2f} ms/call "
                f"({self.counts[name]} calls)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block on a pytree of device arrays.  NOTE: on tunneled backends
    ``block_until_ready`` may not synchronize; fetching a scalar does."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    if leaves:
        jax.device_get(leaves[0].ravel()[0])
    return tree
