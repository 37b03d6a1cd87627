"""The FFT-free (MXU DFT-matmul + direct-convolution) execution mode is
exact against the FFT path."""

import numpy as np
import jax.numpy as jnp
import pytest

from muse_psfr_tpu import GalacsiConfig
from muse_psfr_tpu.psd.model import simulate_psd
from muse_psfr_tpu.otf.psf import psf_cube
from muse_psfr_tpu.otf.convolve import convolve_final
from muse_psfr_tpu.parallel.batch import resolve_fft_mode, fft_available


def _run(cfg, lb):
    dt = cfg.dtype
    psd = simulate_psd(jnp.asarray(1.0, dt), jnp.asarray(0.7, dt),
                       jnp.asarray(25.0, dt), jnp.ones(4, dt),
                       jnp.asarray([100.0, 10000.0], dt), 12.0, 1, cfg)
    cube = psf_cube(psd, jnp.asarray(lb, dt), cfg)
    return np.asarray(convolve_final(cube, jnp.asarray(lb, dt),
                                     1.0, 0.7, 25.0, cfg))


def test_fft_free_exact_in_float64():
    lb = np.array([500.0, 700.0, 900.0])
    a = _run(GalacsiConfig(dtype="float64", use_fft=True), lb)
    b = _run(GalacsiConfig(dtype="float64", use_fft=False), lb)
    assert np.abs(a - b).max() < 1e-13


def test_fft_free_rms_in_float32():
    lb = np.linspace(490, 930, 35)
    import os
    golden = np.load(os.path.join(os.path.dirname(__file__), "data",
                                  "golden_psf_35l_s1.0_gl0.7_l025.npy"))
    out = _run(GalacsiConfig(dtype="float32", use_fft=False), lb)
    rms = np.sqrt(np.mean((out.astype(np.float64) - golden) ** 2))
    assert rms < 1e-5


def test_fft_free_requires_zoom():
    with pytest.raises(ValueError):
        _run(GalacsiConfig(dtype="float64", use_fft=False,
                           use_zoom_dft=False), np.array([700.0]))


def test_resolve_fft_mode_on_cpu():
    assert fft_available()  # CPU backend always has FFTs
    cfg = GalacsiConfig()
    assert resolve_fft_mode(cfg) is cfg
