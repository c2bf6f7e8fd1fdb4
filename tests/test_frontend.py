"""Frontend parity tests vs. the torch reference Util.py (loaded at runtime)."""

import importlib.util
import math
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import frontend

REF = "/root/reference/transkun/Util.py"


def _load_ref_util():
    """Load the reference Util.py with a torchaudio stub that delegates the
    mel filterbank to our numpy implementation (torchaudio is unavailable).
    The fbank itself is validated independently below."""
    import torch

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        func = types.ModuleType("torchaudio.functional")

        def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
            return torch.from_numpy(
                frontend.melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate)
            )

        func.melscale_fbanks = melscale_fbanks
        ta.functional = func
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = func
    spec = importlib.util.spec_from_file_location("ref_util", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")


@pytest.mark.quick
def test_melscale_fbanks_direct():
    """Independent check of the HTK filterbank against a from-first-principles
    computation at a few bins."""
    fb = frontend.melscale_fbanks(2049, 30.0, 8000.0, 229, 44100)
    assert fb.shape == (2049, 229)
    assert np.all(fb >= 0)
    # each filter is triangular: rises then falls, peak 1 at interior f_pts
    hz2mel = lambda f: 2595 * math.log10(1 + f / 700)
    mel2hz = lambda m: 700 * (10 ** (m / 2595) - 1)
    m = np.linspace(hz2mel(30), hz2mel(8000), 231)
    f_pts = np.array([mel2hz(x) for x in m])
    freqs = np.linspace(0, 22050, 2049)
    # filter k peaks at f_pts[k+1]
    for k in [0, 100, 228]:
        peak_bin = np.argmax(fb[:, k])
        assert abs(freqs[peak_bin] - f_pts[k + 1]) < (freqs[1] - freqs[0]) * 1.5
    # value at the exact center frequency must be ~1 when a bin lands there
    col = fb[:, 100]
    assert col.max() > 0.5  # triangles are wide enough at 229 mels to be sampled


@needs_ref
@pytest.mark.quick
def test_make_frame_parity(rng):
    import torch

    ref = _load_ref_util()
    for n in [44100, 70560, 705600 // 10]:
        x = rng.normal(size=(2, n)).astype(np.float32)
        ours = np.asarray(frontend.make_frame(jnp.asarray(x), 1024, 4096))
        theirs = ref.makeFrame(torch.from_numpy(x), 1024, 4096).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=0)


@needs_ref
def test_gaussian_windows_parity():
    import torch

    ref = _load_ref_util()
    gw = ref.GaussianWindows(5, 4096)
    params = frontend.gaussian_windows_init(5)
    np.testing.assert_allclose(params["sigma"], gw.sigma.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(params["center"], gw.center.detach().numpy(), atol=1e-5)
    ours = np.asarray(
        frontend.gaussian_windows(
            jnp.asarray(params["sigma"]), jnp.asarray(params["center"]), 4096
        )
    )
    theirs = gw.get().detach().numpy().T  # ref returns [n, nWin]
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@needs_ref
def test_hann_window_parity():
    import torch

    np.testing.assert_allclose(
        np.asarray(frontend.hann_window(4096)),
        torch.hann_window(4096).numpy(),
        atol=1e-6,
    )


@needs_ref
def test_mel_spectrum_parity(rng):
    import torch

    ref = _load_ref_util()
    mel_mod = ref.MelSpectrum(
        1024, f_min=30, f_max=8000, n_mels=100, fs=44100, nExtraWins=3,
        log=True, toMono=True,
    )
    mel_mod.eval()

    frames = rng.normal(size=(2, 2, 7, 1024)).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = mel_mod(torch.from_numpy(frames)).numpy()

    # ours: assemble the same window stack
    gw = mel_mod.spectrogramExtractor.winGen
    wins = np.concatenate(
        [
            frontend.hann_window(1024)[None],
            frontend.gaussian_windows(
                jnp.asarray(gw.sigma.detach().numpy()),
                jnp.asarray(gw.center.detach().numpy()),
                1024,
            ),
        ],
        axis=0,
    )
    fbank = frontend.melscale_fbanks(513, 30, 8000, 100, 44100)
    ours = np.asarray(
        frontend.mel_spectrum(
            jnp.asarray(frames), jnp.asarray(wins), jnp.asarray(fbank),
            log=True, to_mono=True,
        )
    )
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    # GEMM-DFT path must match the FFT path (band-limited exactness)
    cos_m, sin_m, fb_band = frontend.dft_mel_matrices(1024, fbank)
    ours_gemm = np.asarray(
        frontend.mel_spectrum_gemm(
            jnp.asarray(frames), jnp.asarray(wins),
            jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb_band),
            log=True, to_mono=True,
        )
    )
    assert ours_gemm.shape == theirs.shape
    np.testing.assert_allclose(ours_gemm, theirs, atol=5e-5)


def test_gemm_dft_band_limiting():
    """The band-limited DFT computes only bins carrying mel energy."""
    fbank = frontend.melscale_fbanks(2049, 30.0, 8000.0, 229, 44100)
    cos_m, sin_m, fb_band = frontend.dft_mel_matrices(4096, fbank)
    n_bins = cos_m.shape[1]
    assert n_bins < 800  # vs 2049 full bins: ~2.7x fewer
    assert cos_m.shape == (4096, n_bins)
    assert fb_band.shape == (n_bins, 229)
