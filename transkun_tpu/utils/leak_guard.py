"""Projected-OOM warning for the tunneled-TPU host-loader path.

The axon (tunneled TPU) client retains every ``device_put`` payload for
process lifetime — measured at ~100% of uploaded bytes, per byte, with
fetches and device-resident compute clean (``scripts/probe_axon_leak.py``;
full writeup in ARCHITECTURE.md "Device-resident training corpus").  A
training run on the host-loader path therefore leaks one audio batch of
host RSS per step and eventually dies to the OOM killer (round 4 lost a
51k-step run at ~125 GB).  ``--deviceData`` removes the per-step upload
entirely; multi-host or augmented runs cannot use it, so they get this
loud, quantified warning instead (VERDICT r4 item 6).
"""

from __future__ import annotations

from typing import Optional

LEAKY_BACKENDS = ("axon",)


def _available_ram_bytes() -> Optional[int]:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024
    except Exception:
        pass
    return None


def host_loader_leak_warning(
    backend: str,
    bytes_per_step: int,
    ram_bytes: Optional[int] = None,
) -> Optional[str]:
    """Warning message when a host-loader training run starts on a backend
    whose client retains uploads, else None.

    ``bytes_per_step`` is the per-step upload payload (audio batch bytes on
    the link); the measured retention is ~100% of payload, so projected
    steps-to-OOM = RAM / bytes_per_step.
    """
    if backend not in LEAKY_BACKENDS or bytes_per_step <= 0:
        return None
    ram = ram_bytes if ram_bytes is not None else _available_ram_bytes()
    if ram:
        projection = (
            f"  projected OOM after ~{ram // bytes_per_step:,} steps "
            f"(RAM {ram / 2**30:.0f} GiB).\n"
        )
    else:
        projection = "  projected OOM horizon unknown (RAM size unreadable).\n"
    bar = "=" * 72
    return (
        f"{bar}\n"
        f"WARNING: host-loader training on the '{backend}' backend leaks "
        "host RSS:\n"
        "  the tunnel client retains ~100% of every upload "
        f"({bytes_per_step / 2**20:.1f} MB/step here);\n"
        f"{projection}"
        "  Prefer --deviceData on (no per-step upload; incompatible with\n"
        "  augmentation/multi-process), watch the rss column of the step\n"
        "  log, and keep --ckptEvery small — resume is crash-safe.\n"
        f"{bar}"
    )


__all__ = ["host_loader_leak_warning", "LEAKY_BACKENDS"]
