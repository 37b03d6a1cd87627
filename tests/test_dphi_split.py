"""Linearity split of the structure function (config ``use_dphi_split``).

The per-row transform of the full-grid fitting PSD is replaced by
precomputed per-config constants (Taylor basis in u = 1/L0^2) plus a
transform of the centrally-supported correction-zone block; these tests
pin (a) the certified expansion error, (b) exact agreement of the split
with the full transform, and (c) the batch layer's host-side L0 fallback.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from muse_psfr_tpu.config import GalacsiConfig, TINY_CONFIG
from muse_psfr_tpu.core.vonkarman import (fitting_expansion_spec,
                                          fitting_expansion_max_rel_error)
from muse_psfr_tpu.psd.model import (simulate_psd, simulate_psd_split,
                                     effective_wind_speed)
from muse_psfr_tpu.otf.psf import dphi_base, dphi_base_split

H = (100, 10000)


def test_expansion_certified():
    cfg = GalacsiConfig()
    err = fitting_expansion_max_rel_error(cfg.dphi_split_l0_min,
                                          cfg.dphi_split_degree, cfg.fc)
    assert err < 1e-7          # the budget enforced by fitting_dphi_basis
    u0, binoms = fitting_expansion_spec(cfg.dphi_split_l0_min,
                                        cfg.dphi_split_degree)
    assert binoms[0] == 1.0 and binoms[1] == pytest.approx(-11.0 / 6.0)


@pytest.mark.parametrize("dtype,tol_rel", [("float64", 1e-9),
                                           ("float32", 3e-6)])
@pytest.mark.parametrize("npsflin", [1, 2])
def test_split_matches_exact(dtype, tol_rel, npsflin):
    cfg = TINY_CONFIG.with_(dtype=dtype)
    ws = effective_wind_speed(H, cfg)
    cases = [(1.0, 0.7, 25.0, 1.0), (1.3, 0.45, 9.0, 0.0),
             (0.7, 0.9, 29.5, 1.0), (2.0, 0.05, 5.05, 1.0),
             # newly-certified low-L0 range (degree 5, l0_min 2.5):
             # synthetic sweep points below the old 5 m cutoff
             (0.9, 0.6, 3.0, 1.0), (1.1, 0.4, 2.6, 1.0)]
    for s, g, l, m4 in cases:
        mask = jnp.array([1.0, 1.0, 1.0, m4], cfg.dtype)
        exact = dphi_base(
            simulate_psd(s, g, l, mask, H, ws, npsflin, cfg).astype(cfg.dtype),
            cfg)
        w, delta = simulate_psd_split(s, g, l, mask, H, ws, npsflin, cfg)
        split = dphi_base_split(w, delta, cfg)
        assert split.shape == (npsflin * npsflin, cfg.dim, cfg.dim)
        rel = float(jnp.max(jnp.abs(split - exact))
                    / jnp.max(jnp.abs(exact)))
        assert rel < tol_rel, (s, g, l, m4, rel)


def test_batch_l0_fallback_matches():
    """Rows with L0 below the certified range take the exact path (per
    row — an outlier no longer disables the split for the whole batch):
    the outlier row must match the explicit use_dphi_split=False run
    exactly, the valid row keeps the (certified) split path."""
    from muse_psfr_tpu.parallel.batch import reconstruct_batch
    cfg = TINY_CONFIG
    lbda = np.array([700.0, 900.0])
    see, gl = np.array([1.0, 1.2]), np.array([0.7, 0.5])
    l0_low = np.array([25.0, 2.0])         # one row below dphi_split_l0_min
    mask = np.ones((2, 4))
    with_gate = reconstruct_batch(see, gl, l0_low, mask, lbda, cfg=cfg)
    exact = reconstruct_batch(see, gl, l0_low, mask, lbda,
                              cfg=cfg.with_(use_dphi_split=False))
    np.testing.assert_array_equal(with_gate[1], exact[1])
    np.testing.assert_allclose(with_gate[0], exact[0], rtol=0, atol=3e-6)


def test_degree_guard():
    """An uncertifiable expansion (too low degree for the L0 range) is
    rejected at constant-build time."""
    from muse_psfr_tpu.otf.psf import fitting_dphi_basis
    bad = TINY_CONFIG.with_(dphi_split_degree=0, dphi_split_l0_min=2.0)
    with pytest.raises(ValueError, match="expansion error"):
        fitting_dphi_basis(bad)
