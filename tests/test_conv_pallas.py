"""Fused Pallas final-PSF convolution chain (cfg.use_pallas_conv):
interpreter-mode correctness on CPU.

The kernel lane-packs wavelength planes in pairs and runs both 'same'
convolutions + the middle crop in one launch (ops/conv_dft.py); it must
reproduce the XLA DFT path (otf/convolve.py:_dft_convolve_same twice)
to accumulation-order rounding, for even and odd plane counts and at
non-production sizes.  Reference behaviour: convolve_final_psf,
psfrec.py:874-930.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from muse_psfr_tpu.otf.convolve import (_dft_convolve_same, _dft_spectra,
                                        _same_fft_size)
from muse_psfr_tpu.ops.conv_dft import fused_conv_chain


@pytest.mark.parametrize("n_img,nl,pack",
                         [(40, 35, 2), (40, 35, 3), (40, 35, 4),
                          (40, 4, 2), (8, 3, 2), (8, 3, 4),
                          (8, 1, 3),   # single plane, pack > nl
                          (8, 5, 3)])  # one padded plane in the group
def test_fused_conv_chain_interpret(n_img, nl, pack):
    n_ker = n_img + 1
    L = _same_fft_size(n_img, n_ker)
    rng = np.random.default_rng(1)
    planes = jnp.asarray(rng.random((nl, n_img, n_img)), jnp.float32)
    ktt = jnp.asarray(rng.random((1, n_ker, n_ker)), jnp.float32)
    ki = jnp.asarray(rng.random((nl, n_ker, n_ker)), jnp.float32)
    want = np.asarray(_dft_convolve_same(
        _dft_convolve_same(planes, ktt, n_img, n_ker), ki, n_img, n_ker))
    gtt_r, gtt_i = _dft_spectra(ktt, L)
    gi_r, gi_i = _dft_spectra(ki, L)
    got = np.asarray(fused_conv_chain(planes, gtt_r[0], gtt_i[0],
                                      gi_r, gi_i, n_img, n_ker,
                                      pack=pack, interpret=True))
    assert got.shape == want.shape
    assert_allclose(got, want, rtol=0,
                    atol=2e-6 * np.abs(want).max())


def test_convolve_final_pallas_gate(monkeypatch):
    """`convolve_final` must route through the fused chain exactly when
    the gate allows (TPU backend, float32, FFT-free, use_pallas_conv)
    and produce the same numbers as the XLA path."""
    import jax
    from muse_psfr_tpu.config import TINY_CONFIG
    from muse_psfr_tpu.otf import convolve as conv_mod

    cfg = TINY_CONFIG.with_(use_fft=False)   # the gate needs FFT-free
    rng = np.random.default_rng(2)
    nl = 3
    psf = jnp.asarray(rng.random((nl, cfg.dimpsf, cfg.dimpsf)),
                      jnp.float32)
    lb = jnp.asarray([500.0, 700.0, 900.0], jnp.float32)
    args = (psf, lb, jnp.float32(1.0), jnp.float32(0.7), jnp.float32(25.0))
    want = np.asarray(conv_mod.convolve_final(
        *args, cfg.with_(use_pallas_conv=False)))

    calls = []
    import muse_psfr_tpu.ops.conv_dft as conv_dft

    real = conv_dft.fused_conv_chain

    def spy(*a, **k):
        calls.append(1)
        assert k.get("pack") == cfg.pallas_conv_pack
        k["interpret"] = True          # CPU test backend can't run Mosaic
        return real(*a, **k)

    monkeypatch.setattr(conv_dft, "fused_conv_chain", spy)
    monkeypatch.setattr(conv_mod.jax, "default_backend", lambda: "tpu")
    got = np.asarray(conv_mod.convolve_final(*args, cfg))
    assert calls, "fused chain was not invoked despite an open gate"
    assert_allclose(got, want, rtol=0, atol=2e-6 * np.abs(want).max())

    # closed gates: x64 compat dtype or use_pallas_conv=False stay XLA
    calls.clear()
    np.asarray(conv_mod.convolve_final(
        *args, cfg.with_(use_pallas_conv=False)))
    np.asarray(conv_mod.convolve_final(
        psf.astype(jnp.float64), lb.astype(jnp.float64), *args[2:],
        cfg.with_(dtype="float64")))
    assert not calls
