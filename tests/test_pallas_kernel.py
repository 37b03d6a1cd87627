"""Pallas fused direction-averaged exp+zoom kernel: interpreter-mode
correctness on CPU.

The kernel itself targets TPU; ``interpret=True`` validates the math on
the CPU test backend, including the multi-wavelength chunking and the
multi-direction accumulation (the npsflin=3 production case).  The
on-TPU numerical check is exercised by the pipeline parity path when
``use_pallas=True`` on real hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from muse_psfr_tpu.ops import zoom_dft


def _reference(dphi, dl, a2, alpha, w):
    nl = a2.shape[0]
    out = []
    for l in range(nl):
        g = sum(np.exp(alpha[l] * dphi[d].astype(np.float64)) * w[l, d]
                for d in range(dphi.shape[0])) * dl.astype(np.float64)
        out.append(a2[l].astype(np.float64) @ g)
    return np.stack(out)


@pytest.mark.parametrize("ndir,nl", [(1, 1), (1, 3), (4, 2), (9, 3)])
def test_fused_exp_zoom_interpret(ndir, nl):
    n, m2 = 256, 32
    rng = np.random.default_rng(3)
    dphi = rng.uniform(0, 40, (ndir, n, n)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, n)).astype(np.float32)
    a2 = (rng.normal(size=(nl, m2, n)) / n).astype(np.float32)
    alpha = rng.uniform(-0.3, -0.1, nl).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, ndir)).astype(np.float32)

    ref = _reference(dphi, dl, a2, alpha, w)
    for prec, atol in (("highest", 5e-7), ("high", 5e-5)):
        u = zoom_dft.fused_exp_zoom(jnp.asarray(dphi), jnp.asarray(dl),
                                    jnp.asarray(a2), alpha, w, tile_j=128,
                                    precision=prec, interpret=True)
        assert_allclose(np.asarray(u, np.float64), ref, rtol=0, atol=atol)


def test_psf_chunk_pallas_matches_xla():
    """The fused chunk path must match the XLA zoom path exactly (both
    f32) on a multi-direction structure function."""
    import jax
    from muse_psfr_tpu.config import TINY_CONFIG
    from muse_psfr_tpu.psd.model import simulate_psd, effective_wind_speed
    from muse_psfr_tpu.otf.psf import (dphi_base, psf_cube_from_base,
                                       _psf_chunk_pallas, pupil_otf,
                                       lambda_crop_size)
    cfg = TINY_CONFIG
    h = (100, 10000)
    ws = effective_wind_speed(h, cfg)
    psd = simulate_psd(1.0, 0.7, 25.0, jnp.ones(4, cfg.dtype), h, ws, 2, cfg)
    base = dphi_base(psd.astype(cfg.dtype), cfg)
    lb = jnp.asarray([700.0, 800.0, 900.0], cfg.dtype)
    want = psf_cube_from_base(base, lb, cfg)     # CPU -> XLA zoom path
    npx = lambda_crop_size(lb, cfg)
    got = _psf_chunk_pallas(base, pupil_otf(cfg), lb, npx, cfg,
                            interpret=True)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-6)


def test_pallas_vmem_chunk_gate():
    """The fused kernel's wavelength chunk shrinks with the OTF-window
    height so its VMEM footprint stays inside the ~16 MB budget (the
    dim=2048 full-window case would otherwise fail in Mosaic)."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import _pallas_lambda_chunk
    from muse_psfr_tpu.config import TINY_CONFIG
    cfg = GalacsiConfig()
    # the known-fitting production case must keep EXACTLY its chunk of 7
    # (a silent shrink would change the measured kernel shape)
    assert cfg.lambda_chunk == 7
    assert min(_pallas_lambda_chunk(cfg, cfg.dim), cfg.lambda_chunk) == 7
    # dim=2048 full window: must shrink but still fit at least one
    k2 = _pallas_lambda_chunk(GalacsiConfig(dim=2048), 2048)
    assert 1 <= k2 < 7
    # dim=2048 with its default reduced window (bucket 512 -> 1024 rows):
    # full chunk.  The 2048^2 bench row (seeing 1.0, GL 0.7, L0 25) is
    # windowable at this bucket, so it runs the fused kernel at the full
    # chunk of 7 — neither the shrunk chunk nor the XLA fallback
    # (RESULTS.md note).
    assert _pallas_lambda_chunk(GalacsiConfig(dim=2048), 1024) >= 7
    # dim=512 and TINY: full budget headroom at any window
    assert _pallas_lambda_chunk(GalacsiConfig(dim=512, dim_pup=24,
                                              dimpsf=12), 512) >= 7
    assert _pallas_lambda_chunk(TINY_CONFIG, TINY_CONFIG.dim) >= 7
    # a grid too large for even one wavelength reports 0 (callers then
    # take the XLA zoom path instead of crashing in Mosaic)
    assert _pallas_lambda_chunk(GalacsiConfig(dim=8192), 8192) == 0


def test_pallas_gate_fallback_activates(monkeypatch):
    """When the VMEM gate reports 0, ``psf_cube_from_base`` must fall
    back to the XLA zoom path — the Pallas kernel must NOT be invoked —
    and still produce the correct PSF."""
    import jax
    from muse_psfr_tpu.config import TINY_CONFIG
    from muse_psfr_tpu.otf import psf as psfmod
    from muse_psfr_tpu.psd.model import simulate_psd, effective_wind_speed

    # unique static key so the patched call is really re-traced (a cfg
    # already compiled by another test would silently reuse its cache)
    cfg = TINY_CONFIG.with_(lambda_chunk=5)
    h = (100, 10000)
    ws = effective_wind_speed(h, cfg)
    psd = simulate_psd(1.0, 0.7, 25.0, jnp.ones(4, cfg.dtype), h, ws, 1,
                       cfg)
    base = psfmod.dphi_base(psd.astype(cfg.dtype), cfg)
    lb = jnp.asarray([700.0, 900.0], cfg.dtype)
    want = np.asarray(psfmod.psf_cube_from_base(base, lb, cfg))

    def boom(*a, **k):
        raise AssertionError("Pallas kernel invoked despite gate=0")

    # pretend we are on a TPU backend (trace-time branch only; the
    # compile still targets the CPU test backend) with a zero budget
    monkeypatch.setattr(psfmod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(psfmod, "_pallas_lambda_chunk", lambda *a: 0)
    monkeypatch.setattr(psfmod, "_psf_chunk_pallas", boom)
    cfg2 = cfg.with_(lambda_chunk=4)     # fresh key -> fresh trace
    got = np.asarray(psfmod.psf_cube_from_base(base, lb, cfg2))
    assert_allclose(got, want, rtol=0, atol=1e-6)
