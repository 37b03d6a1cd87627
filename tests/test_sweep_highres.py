"""Condition-sweep API and the high-resolution (2048^2) grid mode."""

import numpy as np
from numpy.testing import assert_allclose

from muse_psfr_tpu import GalacsiConfig, TINY_CONFIG, compute_psf
from muse_psfr_tpu.api import condition_sweep


def test_condition_sweep_grid_shape_and_consistency():
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    res = condition_sweep([0.8, 1.2], [0.5, 0.7, 0.9], [25.0],
                          lbda=[700.0, 900.0], cfg=cfg, chunk=6)
    assert res["fwhm"].shape == (2, 3, 1, 2)
    assert res["beta"].shape == (2, 3, 1, 2)
    # physics sanity: worse seeing -> wider PSF at every condition
    assert np.all(res["fwhm"][1] > res["fwhm"][0])
    # more ground-layer fraction (better GLAO correction) -> narrower PSF
    assert np.all(np.diff(res["fwhm"][:, :, 0, 0], axis=1) < 0)


def test_sweep_matches_single_compute():
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    res = condition_sweep([1.0], [0.7], [25.0], lbda=[700.0], cfg=cfg)
    tbl, _ = compute_psf([700.0], 1.0, 0.7, 25.0, cfg=cfg, verbose=False)
    assert_allclose(res["fwhm"][0, 0, 0, 0], tbl["fwhm"][0, 0], atol=1e-10)


def test_highres_2048_mode():
    """The 2048^2 PSD/OTF grid is the same code path at a larger static
    shape; the correction zone and output sampling are unchanged, so the
    Moffat parameters must be close to the 1280^2 result (the fitting-error
    spectrum just extends to higher frequencies)."""
    lbda = [700.0]
    lo = GalacsiConfig(dtype="float64", fit_dtype="float64")
    hi = lo.with_(dim=2048)
    t_lo, _ = compute_psf(lbda, 1.0, 0.7, 25.0, cfg=lo, verbose=False)
    t_hi, _ = compute_psf(lbda, 1.0, 0.7, 25.0, cfg=hi, verbose=False)
    assert abs(t_hi["fwhm"][0, 0] - t_lo["fwhm"][0, 0]) < 0.02
    assert abs(t_hi["n"][0] - t_lo["n"][0]) < 0.1
