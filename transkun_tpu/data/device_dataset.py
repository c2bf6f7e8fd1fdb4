"""Device-resident training corpus: upload once, slice chunks on device.

Motivation (round 4): on the tunneled-chip platform every host->device
transfer's payload is retained by the client for process lifetime
(``scripts/probe_axon_leak.py``: uploads leak 100% of payload, fetches and
resident compute are clean), and the per-step audio upload is also the
training step's link bottleneck.  For corpora that fit in HBM the TPU-first
answer is to stop uploading per step entirely: pack every piece into ONE
int16 device array at startup and make each step's chunk a device-side
``dynamic_slice`` driven by two int32 scalars per batch item.

Parity with the host path (``audio.read_audio_slice`` / ref
``Data.py:380-424``):

- pieces are stored as int16 (native wav payload); the device dequantizes
  with the SAME in-jit f32 divide as the int16-link training path, so the
  two modes are bit-identical.  Vs the host slicer's
  ``np.divide(x, iinfo.max, dtype=f32)`` the only difference is XLA's
  divide lowering (reciprocal-multiply on some backends): <= 1 ulp on
  ~2.3% of int16 values, measured exhaustively (test
  ``test_device_dataset_matches_host_loader`` pins both bounds);
- chunk begins are ``floor(begin * fs)`` exactly like the host slicer;
- out-of-piece samples are zeros: pieces are separated by zero pad zones
  at least one chunk long, so a dithered chunk overhanging either edge
  reads zeros without touching a neighbor piece.

Scope: training-time chunks of ONE static length; total samples must fit
int32 indexing (~13.5 h mono / 6.7 h stereo at 44.1 kHz — the guard below
raises past that, pointing back at the host loader for bigger corpora).
Augmentation is host DSP and therefore mutually exclusive with this mode.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

__all__ = ["DeviceDataset"]


def _read_piece_int16(path: str):
    """Read a wav as ``(fs, int16 [n, C])``.  Non-int16 payloads are
    quantized with round+clip at the 32767 scale the host slicer normalizes
    by (quantization error <= 0.5/32767, ~-96 dB)."""
    from scipy.io import wavfile

    fs, data = wavfile.read(path, mmap=True)
    if data.ndim == 1:
        data = data[:, np.newaxis]
    if data.dtype == np.int16:
        return fs, np.asarray(data)
    if data.dtype.kind == "f":
        return fs, np.clip(
            np.round(np.asarray(data, np.float32) * np.float32(32767.0)),
            -32768, 32767,
        ).astype(np.int16)
    # wider ints: keep the top 16 bits (iinfo.max-normalized like the host)
    scale = 32767.0 / np.iinfo(data.dtype).max
    return fs, np.round(np.asarray(data, np.float64) * scale).astype(np.int16)


class DeviceDataset:
    """Packed on-device corpus + jitted slice-to-float kernel.

    ``starts_for(piece_idx, begins_sec)`` turns loader metadata into global
    int32 sample starts; ``slice_batch(starts)`` returns float32
    ``[B, chunk_samples, C]`` audio identical to the host slicer's output.
    """

    def __init__(
        self,
        dataset,
        chunk_samples: int,
        mesh: Optional[object] = None,
        max_bytes: int = 8 << 30,
    ):
        import jax

        self.chunk_samples = int(chunk_samples)
        pad = self.chunk_samples + 2
        read = [_read_piece_int16(dataset.get_path(i))
                for i in range(len(dataset.data))]
        pieces = [p for _, p in read]
        n_channel = pieces[0].shape[1]
        if any(p.shape[1] != n_channel for p in pieces):
            raise ValueError("device dataset requires a uniform channel count")
        if any(fs != read[0][0] for fs, _ in read):
            raise ValueError("device dataset requires a uniform sample rate")
        total = pad + sum(p.shape[0] + pad for p in pieces)
        if total * n_channel * 2 > max_bytes:
            raise ValueError(
                f"packed corpus is {total * n_channel * 2 / 2**30:.1f} GiB "
                f"(> {max_bytes / 2**30:.0f} GiB) — use the host loader"
            )
        if total >= 2**31:
            raise ValueError("corpus exceeds int32 indexing — use the host loader")
        packed = np.zeros((total, n_channel), np.int16)
        bases = np.empty(len(pieces), np.int64)
        off = pad
        for i, p in enumerate(pieces):
            bases[i] = off
            packed[off : off + p.shape[0]] = p
            off += p.shape[0] + pad
        self.fs = int(read[0][0])
        self._bases = bases
        self._lengths = np.array([p.shape[0] for p in pieces], np.int64)
        self.n_channel = n_channel
        self.nbytes = packed.nbytes

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            dp = NamedSharding(mesh, P("dp"))
            self._data = jax.device_put(packed, rep)
            self._slice = jax.jit(
                partial(_slice_dequant, n=self.chunk_samples),
                in_shardings=(rep, dp),
                out_shardings=dp,
            )
        else:
            self._data = jax.device_put(packed)
            self._slice = jax.jit(partial(_slice_dequant, n=self.chunk_samples))

    def starts_for(self, piece_idx, begins_sec) -> np.ndarray:
        """Loader metadata -> global int32 starts (host-side, exact
        ``floor(begin * fs)`` like ``read_audio_slice``)."""
        piece_idx = np.asarray(piece_idx, np.int64)
        b = np.floor(np.asarray(begins_sec, np.float64) * self.fs).astype(np.int64)
        # chunks are enumerated with at most one chunk of overhang per side;
        # clamp defensively so a pathological descriptor can't escape the
        # pad zone (reads would be zeros either way on the host path)
        b = np.clip(b, -self.chunk_samples - 1, self._lengths[piece_idx] + 1)
        return (self._bases[piece_idx] + b).astype(np.int32)

    def slice_batch(self, starts: np.ndarray):
        """``[B]`` int32 global starts -> float32 ``[B, n, C]`` on device."""
        return self._slice(self._data, starts)


def _slice_dequant(data, starts, *, n: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def one(s):
        return lax.dynamic_slice(data, (s, 0), (n, data.shape[1]))

    sl = jax.vmap(one)(starts)
    # f32 divide by iinfo.max — the exact dequantize of the int16-link
    # training path (see module docstring for the <=1 ulp story vs host)
    return sl.astype(jnp.float32) / jnp.float32(32767.0)
