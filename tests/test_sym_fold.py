"""Point-symmetry fold (config ``use_sym_fold``): folded vs unfolded
parity.

PSDs and the pupil autocorrelation are transforms of real fields, so all
OTF-side arrays satisfy G[i, j] = G[(N-i)%N, (N-j)%N]; the fold computes
only columns 0..N/2 of the structure function / OTF and doubles the
mirrored columns' weight in the final zoom contraction (see
otf/psf.py:_fold_weights).  These tests pin (a) the symmetry claim on
the actual pipeline arrays, (b) exact agreement of the folded pipeline
with the unfolded one at a dim where the fold is a real reduction
(dim=512 -> ncols=384), and (c) the gating (fold off when dim % 256 != 0
or the zoom path is off).
"""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from muse_psfr_tpu.config import GalacsiConfig, TINY_CONFIG
from muse_psfr_tpu.psd.model import (simulate_psd, simulate_psd_split,
                                     effective_wind_speed)
from muse_psfr_tpu.otf.psf import (dphi_base, dphi_base_split, pupil_otf,
                                   psf_cube_from_base, psf_cube)

H = (100, 10000)
CFG = GalacsiConfig(dim=512, dim_pup=24, dimpsf=12)


def test_fold_gating():
    assert CFG.fold_ncols == 384                  # 512/2 rounded to a tile
    assert TINY_CONFIG.fold_ncols == 256          # tiny grids: full width
    assert GalacsiConfig().fold_ncols == 768      # production 1280 -> 768
    assert CFG.with_(use_sym_fold=False).fold_ncols is None
    assert CFG.with_(use_zoom_dft=False).fold_ncols is None
    assert CFG.with_(dim=384).fold_ncols is None  # dim % 256 != 0


def _mirror(arr):
    """Point mirror about index 0: out[i, j] = arr[(N-i)%N, (N-j)%N]."""
    return np.roll(arr[..., ::-1, ::-1], (1, 1), axis=(-2, -1))


def test_pipeline_arrays_are_point_symmetric():
    """The symmetry facts the fold rests on: the raw GLAO PSD is NOT
    f -> -f symmetric (temporal transfer functions depend on f.v, and
    wind direction breaks the parity) — but the structure function and
    the pupil OTF, the arrays the zoom contraction actually consumes,
    are (the Re-part of the inverse transform symmetrises the PSD)."""
    cfg = CFG.with_(dtype="float64", use_sym_fold=False, use_fft=False)
    ws = effective_wind_speed(H, cfg)
    psd = simulate_psd(1.0, 0.7, 25.0, jnp.ones(4, jnp.float64), H, ws,
                       2, cfg)
    p = np.asarray(psd)
    assert np.abs(p - _mirror(p)).max() > 1e-5 * np.abs(p).max()

    dphi = np.asarray(dphi_base(psd.astype(cfg.dtype), cfg))
    assert_allclose(dphi, _mirror(dphi), rtol=0,
                    atol=1e-9 * np.abs(dphi).max())
    dl = np.asarray(pupil_otf(cfg))
    assert_allclose(dl, _mirror(dl), rtol=0, atol=1e-12 * dl.max())


def test_folded_pipeline_matches_unfolded():
    """Full PSF cube, folded vs unfolded, exact and split dphi paths."""
    lb = jnp.asarray([700.0, 800.0, 900.0])
    for use_split in (False, True):
        on = CFG.with_(use_fft=False, use_dphi_split=use_split)
        off = on.with_(use_sym_fold=False)
        ws = effective_wind_speed(H, on)
        mask = jnp.ones(4, on.dtype)
        if use_split:
            w, delta = simulate_psd_split(1.0, 0.7, 25.0, mask, H, ws, 2, on)
            b_on = dphi_base_split(w, delta, on)
            b_off = dphi_base_split(w, delta, off)
        else:
            psd = simulate_psd(1.0, 0.7, 25.0, mask, H, ws, 2, on)
            b_on = dphi_base(psd.astype(on.dtype), on)
            b_off = dphi_base(psd.astype(off.dtype), off)
        assert b_on.shape == (4, on.dim, 384)
        assert b_off.shape == (4, on.dim, on.dim)
        # the computed half must agree with the unfolded transform
        assert_allclose(np.asarray(b_on[..., :on.dim // 2 + 1]),
                        np.asarray(b_off[..., :on.dim // 2 + 1]),
                        rtol=0, atol=5e-5 * float(jnp.abs(b_off).max()))
        got = psf_cube_from_base(b_on, lb, on)
        want = psf_cube_from_base(b_off, lb, off)
        assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-6)


def test_folded_psf_cube_fft_dphi():
    """use_fft=True + zoom resampling: the FFT structure function is
    sliced to the fold width and the folded zoom matches the unfolded."""
    ws = effective_wind_speed(H, CFG)
    psd = simulate_psd(0.8, 0.6, 20.0, jnp.ones(4, CFG.dtype), H, ws, 1, CFG)
    lb = jnp.asarray([650.0, 930.0])
    got = psf_cube(psd, lb, CFG)
    want = psf_cube(psd, lb, CFG.with_(use_sym_fold=False))
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-6)
