"""DSP frontend: framing, windows, spectrogram, mel — pure jnp functions.

TPU-native counterpart of the reference frontend (``transkun/Util.py``).  The
whole chain (frame -> window -> rFFT -> mel matmul -> log-norm) is pure and
static-shaped so XLA fuses it with the downstream backbone into one program.
The mel filterbank is a host-side numpy constant folded into the jitted graph.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def num_frames(n_samples: int, hop_size: int) -> int:
    """Frame count convention of the reference (``Util.py:24``)."""
    return math.ceil(n_samples / hop_size) + 1


def make_frame(
    x: Array, hop_size: int, window_size: int, left_padding_half_frame: bool = True
) -> Array:
    """Slice a waveform [..., nSample] into frames [..., nFrame, windowSize].

    Matches ``Util.py:21-43``: pads half a window on the left (by default) and
    enough on the right so that ``nFrame = ceil(nSample/hop) + 1`` windows fit.
    """
    assert hop_size < window_size
    n = x.shape[-1]
    n_frame = num_frames(n, hop_size)
    if left_padding_half_frame:
        l_pad = window_size // 2
        r_pad = (n_frame - 1) * hop_size + window_size // 2 - n
    else:
        l_pad = 0
        r_pad = (n_frame - 1) * hop_size + window_size - n
    pad = [(0, 0)] * (x.ndim - 1) + [(l_pad, r_pad)]
    x = jnp.pad(x, pad)
    if window_size % hop_size == 0:
        # gather-free framing: reshape into hop blocks and stack the
        # window_size/hop shifted views — pure data movement XLA handles well
        # (the generic gather path is pathologically slow on some backends)
        k = window_size // hop_size
        blocks = x.reshape(*x.shape[:-1], -1, hop_size)  # [..., nF+k-1, hop]
        views = [blocks[..., w : w + n_frame, :] for w in range(k)]
        return jnp.concatenate(views, axis=-1)
    # gather overlapping windows: indices [nFrame, windowSize]
    idx = jnp.arange(n_frame)[:, None] * hop_size + jnp.arange(window_size)[None, :]
    return x[..., idx]


def hann_window(window_size: int, dtype=jnp.float32) -> Array:
    """Periodic Hann window (same convention as ``torch.hann_window``)."""
    n = jnp.arange(window_size, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / window_size))


def gaussian_windows_init(n: int) -> dict:
    """Initial parameters of the learnable Gaussian windows (``Util.py:47-60``):
    sigma params at -1 (sigmoid -> ~0.269), centers spread uniformly via logit.
    """
    centers = np.arange(1, n + 1) / (n + 1)
    return {
        "sigma": -np.ones(n, np.float32),
        "center": np.log(centers / (1 - centers)).astype(np.float32),
    }


def gaussian_windows(sigma: Array, center: Array, n_win: int) -> Array:
    """Evaluate n learnable Gaussian windows -> [nWin, n] (``Util.py:62-71``).

    Note the reference returns [n, nWin] then transposes at use; we return the
    stacked [nExtra, windowSize] layout directly.
    """
    s = jax.nn.sigmoid(sigma)  # [nExtra]
    c = jax.nn.sigmoid(center)
    x = jnp.arange(n_win, dtype=sigma.dtype)
    y = jnp.exp(-0.5 * ((x[None, :] - n_win * c[:, None]) / (s[:, None] * n_win / 2)) ** 2)
    return y


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """HTK-mel triangular filterbank [n_freqs, n_mels], matching the semantics
    the reference gets from its audio library (``Util.py:135-141``): linear
    frequency bins 0..sr/2, HTK mel scale, no area normalization.
    """

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dft_mel_matrices(
    window_size: int,
    fbank: np.ndarray,
) -> tuple:
    """Constants for the GEMM-native DFT mel frontend.

    On TPU the FFT has no MXU mapping (and is unimplemented on some backends);
    a band-limited DFT as two real matmuls IS the hardware-native formulation:
    the mel filterbank is zero outside [f_min, f_max], so only the frequency
    bins with any nonzero filter weight are computed.  Returns
    (cos [W, B], sin [W, B], fbank_band [B, n_mels]) with B << W//2+1.
    """
    n_freqs = fbank.shape[0]
    nz = np.nonzero(fbank.sum(axis=1) > 0)[0]
    lo = int(nz.min()) if nz.size else 0
    hi = int(nz.max()) + 1 if nz.size else n_freqs
    band = np.arange(lo, hi)
    n = np.arange(window_size)[:, None].astype(np.float64)
    k = band[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / window_size
    scale = 1.0 / math.sqrt(window_size)  # ortho normalization
    cos_m = (np.cos(ang) * scale).astype(np.float32)
    sin_m = (-np.sin(ang) * scale).astype(np.float32)
    return cos_m, sin_m, fbank[lo:hi].astype(np.float32)


def mel_spectrum_gemm(
    frames: Array,
    wins: Array,
    cos_m: Array,
    sin_m: Array,
    fbank_band: Array,
    log: bool = True,
    eps: float = 1e-5,
    to_mono: bool = False,
    compute_dtype=None,
) -> Array:
    """Log-mel via band-limited GEMM DFT — numerically equal to
    ``mel_spectrum`` (which the zero filters outside the band make exact).

    frames: [..., nFrame, windowSize]; wins [nWin, windowSize];
    returns [..., nFrame, n_mels, nWin].  ``compute_dtype=jnp.bfloat16`` runs
    the two DFT matmuls on the MXU in bf16 with fp32 accumulation.
    """
    w = frames[..., None, :] * wins  # [..., nFrame, nWin, W]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        cos_m = cos_m.astype(compute_dtype)
        sin_m = sin_m.astype(compute_dtype)
    re = jax.lax.dot_general(
        w, cos_m, (((w.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        w, sin_m, (((w.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    power = re * re + im * im  # [..., nFrame, nWin, B]
    if to_mono and power.ndim >= 4:
        power = jnp.mean(power, axis=-4, keepdims=True)
    mel = jnp.swapaxes(power @ fbank_band, -1, -2)  # [..., nFrame, n_mels, nWin]
    if log:
        mel = (jnp.log(mel + eps) - math.log(eps)) / (-math.log(eps))
    return mel


def spectrum(frames: Array, wins: Array, log: bool = False) -> Array:
    """Multi-window spectrogram (``Util.py:101-124``).

    frames: [..., nFrame, windowSize]; wins: [nWin, windowSize].
    Returns complex [..., nFrame, nFreq, nWin] (ortho-normalized rFFT).
    With ``log``, packs (magnitude, phase) into the complex parts like the
    reference's log variant (``Util.py:117-118``).
    """
    z = jnp.fft.rfft(frames[..., None, :] * wins, norm="ortho")
    if log:
        z = jax.lax.complex(jnp.abs(z), jnp.angle(z))
    return jnp.swapaxes(z, -1, -2)


def mel_spectrum(
    frames: Array,
    wins: Array,
    fbank: Array,
    log: bool = True,
    eps: float = 1e-5,
    to_mono: bool = False,
) -> Array:
    """Log-mel features (``Util.py:151-170``).

    frames: [..., nFrame, windowSize] -> [..., nFrame, n_mels, nWin].
    ``to_mono`` averages over the audio-channel axis (dim -4) when present.
    """
    z = spectrum(frames, wins)
    power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    if to_mono and power.ndim >= 4:
        power = jnp.mean(power, axis=-4, keepdims=True)
    mel = jnp.swapaxes(jnp.swapaxes(power, -1, -2) @ fbank, -1, -2)
    if log:
        mel = (jnp.log(mel + eps) - math.log(eps)) / (-math.log(eps))
    return mel
