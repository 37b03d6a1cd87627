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


@pytest.mark.parametrize("ndir,nl", [(1, 3), (9, 3)])
def test_fused_exp_zoom_exp2_matches_exp(ndir, nl):
    """cfg.zoom_exp2 rewrites exp(alpha*D)*w as exp2(alpha*log2e*D +
    log2 w) — same math up to argument rounding.  Checked against the
    float64 reference including heavily damped pixels (where the
    absolute deviation must stay negligible) and a zero weight (log2 0
    = -inf must flush cleanly to zero, not NaN)."""
    n, m2 = 256, 32
    rng = np.random.default_rng(11)
    dphi = rng.uniform(0, 40, (ndir, n, n)).astype(np.float32)
    dphi[:, :, :64] *= 8.0                  # deep-damping band
    dl = rng.uniform(0, 1, (n, n)).astype(np.float32)
    a2 = (rng.normal(size=(nl, m2, n)) / n).astype(np.float32)
    alpha = rng.uniform(-0.3, -0.1, nl).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, ndir)).astype(np.float32)
    if ndir > 1:
        w[0, 0] = 0.0                       # masked direction

    ref = _reference(dphi, dl, a2, alpha, w)
    u = zoom_dft.fused_exp_zoom(jnp.asarray(dphi), jnp.asarray(dl),
                                jnp.asarray(a2), alpha, w, tile_j=128,
                                precision="highest", exp2=True,
                                interpret=True)
    u = np.asarray(u, np.float64)
    assert np.all(np.isfinite(u))
    assert_allclose(u, ref, rtol=0, atol=1e-6)


def test_fused_exp_zoom_anchor_interpret():
    """The anchored-Taylor kernel must match the exact per-wavelength
    exponentials within the certified analytic bound, including heavily
    damped pixels where the anchor exp underflows float32."""
    from muse_psfr_tpu.otf.psf import zoom_anchor_bound
    from math import factorial
    ndir, nl, degree = 9, 7, 8
    n, m2 = 256, 32
    rng = np.random.default_rng(7)
    # dphi such that t = -alpha*dphi spans 0..~120 (underflow regime
    # included: float32 e^-t flushes to zero past t ~ 88 where the true
    # OTF is < 1e-30 of DC)
    dphi = rng.uniform(0, 40, (ndir, n, n)).astype(np.float32)
    dphi[:, :, :32] *= 30.0
    dl = rng.uniform(0, 1, (n, n)).astype(np.float32)
    a2 = (rng.normal(size=(nl, m2, n)) / n).astype(np.float32)
    # the production-worst relative spread: MUSE's bluest chunk has
    # r = 0.161; mimic it with alphas spanning the same ratio
    alpha = (-0.1 * (1.0 + 0.38 * np.linspace(0, 1, nl))).astype(np.float32)

    astar = 0.5 * (alpha.min() + alpha.max())
    rho1 = alpha / astar - 1.0
    coef = np.stack([rho1 ** j / factorial(j) for j in range(degree + 1)],
                    axis=1).astype(np.float32)

    # exact f64 reference of what the anchor kernel approximates
    out = []
    for l in range(nl):
        g = sum(np.exp(alpha[l] * dphi[d].astype(np.float64))
                for d in range(ndir)) * dl.astype(np.float64)
        out.append(a2[l].astype(np.float64) @ g)
    ref = np.stack(out)

    r = np.max(np.abs(rho1))
    p = degree + 1
    bound = (r * p / (1.0 - r)) ** p * np.exp(-p) / factorial(p)
    # error through the contraction: ndir * bound per G pixel, times the
    # a2 row absolute sums; plus f32 rounding of the matmul itself
    row_l1 = np.abs(a2.astype(np.float64)).sum(axis=2).max()
    atol = ndir * bound * row_l1 + 1e-5

    u = zoom_dft.fused_exp_zoom_anchor(
        jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2),
        astar, coef, tile_j=128, precision="highest", degree=degree,
        interpret=True)
    assert_allclose(np.asarray(u, np.float64), ref, rtol=0, atol=atol)
    # sanity: the analytic bound must certify something meaningful here
    assert bound < 1e-6
    # and the lambda-grid helper agrees with the hand computation
    lb = 2.0 * np.pi / np.sqrt(-2.0 * alpha.astype(np.float64))
    assert np.isclose(zoom_anchor_bound(lb, nl, degree), bound, rtol=1e-6)


def test_zoom_anchor_bound_properties():
    from muse_psfr_tpu.otf.psf import zoom_anchor_bound
    muse = np.linspace(465.0, 930.0, 35)
    b8 = zoom_anchor_bound(muse, 7, 8)
    assert b8 < 1e-6            # certifies the production configuration
    assert zoom_anchor_bound(muse, 7, 9) < b8   # monotone in degree
    assert zoom_anchor_bound(muse, 6, 8) < b8   # narrower chunks help
    # pathological grids never certify (huge bound or +inf for NaN)
    assert zoom_anchor_bound([100.0, 10000.0], 2, 8) > 1.0
    assert zoom_anchor_bound([np.nan], 1, 8) == np.inf
    # empirical check of the sup-over-t bound: worst chunk of the MUSE
    # grid, dense t grid, exact truncation error must stay under it
    lb = muse[:7]
    al = -0.5 * (2 * np.pi / lb) ** 2
    astar = 0.5 * (al.min() + al.max())
    t = np.linspace(0, 200, 20001)[None, :]       # t = -astar*D
    x = -t
    from math import factorial
    rho = (al / astar)[:, None]
    exact = np.exp(rho * x)
    approx = np.exp(x) * sum(((rho - 1) * x) ** j / factorial(j)
                             for j in range(9))
    assert np.abs(approx - exact).max() <= b8 * 1.0000001


def test_resolve_zoom_anchor(monkeypatch):
    """"auto" engages only on the TPU Pallas path, for enough directions,
    within the certified budget — and resolves deterministically."""
    from muse_psfr_tpu.otf import psf as psfmod
    from muse_psfr_tpu.config import GalacsiConfig
    muse = np.linspace(465.0, 930.0, 35)
    # the DEFAULT is "off" (measured slower end-to-end, see config.py);
    # "auto" is the opt-in certify-and-engage mode under test here
    cfg = GalacsiConfig(zoom_anchor="auto")
    # CPU backend: stays "auto" (off at trace time, jit key unchanged)
    assert psfmod.resolve_zoom_anchor(cfg, muse, 9).zoom_anchor == "auto"
    monkeypatch.setattr(psfmod.jax, "default_backend", lambda: "tpu")
    assert psfmod.resolve_zoom_anchor(cfg, muse, 9).zoom_anchor == "on"
    # too few directions: the anchor exp cannot amortise
    assert psfmod.resolve_zoom_anchor(cfg, muse, 1).zoom_anchor == "auto"
    # budget violation (degree too low for the blue chunk) falls back
    lo = cfg.with_(zoom_anchor_degree=2)
    assert psfmod.resolve_zoom_anchor(lo, muse, 9).zoom_anchor == "auto"
    # explicit settings pass through untouched
    assert psfmod.resolve_zoom_anchor(
        cfg.with_(zoom_anchor="on"), muse, 1).zoom_anchor == "on"
    assert psfmod.resolve_zoom_anchor(
        cfg.with_(zoom_anchor="off"), muse, 9).zoom_anchor == "off"


def test_psf_chunk_pallas_anchor_matches_exact():
    """The anchored chunk path must match the exact fused path within the
    certified bound on a real multi-direction structure function."""
    from muse_psfr_tpu.config import TINY_CONFIG
    from muse_psfr_tpu.psd.model import simulate_psd, effective_wind_speed
    from muse_psfr_tpu.otf.psf import (dphi_base, _psf_chunk_pallas,
                                       pupil_otf, lambda_crop_size,
                                       zoom_anchor_bound)
    cfg = TINY_CONFIG
    h = (100, 10000)
    ws = effective_wind_speed(h, cfg)
    psd = simulate_psd(1.0, 0.7, 25.0, jnp.ones(4, cfg.dtype), h, ws, 2, cfg)
    base = dphi_base(psd.astype(cfg.dtype), cfg)           # ndir = 4
    # relative alpha spread ~0.10, comparable to a MUSE 7-of-35 chunk
    lb = jnp.asarray([760.0, 800.0, 840.0], cfg.dtype)
    npx = lambda_crop_size(lb, cfg)
    want = _psf_chunk_pallas(base, pupil_otf(cfg), lb, npx, cfg,
                             interpret=True)
    got = _psf_chunk_pallas(base, pupil_otf(cfg), lb, npx,
                            cfg.with_(zoom_anchor="on"), interpret=True)
    assert zoom_anchor_bound(np.asarray(lb), 3, cfg.zoom_anchor_degree) \
        < 1e-6
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-6)


@pytest.mark.parametrize("zoom_exp2", [True, False])
def test_psf_chunk_pallas_matches_xla(zoom_exp2):
    """The fused chunk path must match the XLA zoom path exactly (both
    f32) on a multi-direction structure function — with the damping
    evaluated either way (cfg.zoom_exp2)."""
    import jax
    from muse_psfr_tpu.config import TINY_CONFIG
    from muse_psfr_tpu.psd.model import simulate_psd, effective_wind_speed
    from muse_psfr_tpu.otf.psf import (dphi_base, psf_cube_from_base,
                                       _psf_chunk_pallas, pupil_otf,
                                       lambda_crop_size)
    cfg = TINY_CONFIG.with_(zoom_exp2=zoom_exp2)
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
    # (a silent shrink would change the measured kernel shape): the
    # full-window bucket is VMEM-capped below pallas_lambda_chunk=12
    assert cfg.lambda_chunk == 7 and cfg.pallas_lambda_chunk == 12
    assert min(_pallas_lambda_chunk(cfg, cfg.dim),
               cfg.pallas_lambda_chunk) == 7
    # the dim=1280 reduced-window bucket (S=320 -> 640 rows) has VMEM
    # headroom past 12: it runs the full pallas_lambda_chunk (the
    # measured 1.16x night win, config.py) — 3 launches per 35-lambda
    # cube, pad 1
    assert _pallas_lambda_chunk(cfg, 640) >= 12
    # chunk policy: the big chunk only when it fits IN FULL —
    # VMEM-clamped intermediate sizes fall back to lambda_chunk (k=9
    # measured slower than both 7 and 12 at the windowed shape).  The
    # dim=2048 reduced-window bucket (k_fit 9) therefore keeps 7.
    from muse_psfr_tpu.otf.psf import _pallas_chunk_policy
    assert _pallas_chunk_policy(cfg, 13) == 12
    assert _pallas_chunk_policy(cfg, 12) == 12
    assert _pallas_chunk_policy(cfg, 9) == 7
    cfg2k = GalacsiConfig(dim=2048)
    assert _pallas_lambda_chunk(cfg2k, 1024) == 9
    assert _pallas_chunk_policy(cfg2k, _pallas_lambda_chunk(cfg2k, 1024)) == 7
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
    monkeypatch.setattr(psfmod, "_pallas_lambda_chunk", lambda *a, **k: 0)
    monkeypatch.setattr(psfmod, "_psf_chunk_pallas", boom)
    cfg2 = cfg.with_(lambda_chunk=4)     # fresh key -> fresh trace
    got = np.asarray(psfmod.psf_cube_from_base(base, lb, cfg2))
    assert_allclose(got, want, rtol=0, atol=1e-6)


# --- diffraction-disc skip (cfg.pallas_disc_skip) ------------------------


def test_disc_block_mask_geometry_and_honesty():
    """At the production full-window geometry the mask must flag exactly
    the corner blocks outside the pupil-autocorrelation disc, every
    dead block must really hold only roundoff-level ``dl``, and windows
    fully inside the disc must yield no mask at all."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_disc_block_mask, _PUPIL_OTF_CACHE,
                                       pupil_otf)

    cfg = GalacsiConfig()                      # dim=1280, full window
    m = _disc_block_mask(cfg)
    assert m is not None and m.shape == (6, 10)
    assert int((m == 0).sum()) == 6            # 10% of the slab
    # dead blocks only in the two leftmost column tiles, symmetric rows
    assert (m[2:] == 1).all()
    np.testing.assert_array_equal(m[0], [0, 0, 1, 1, 1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 1, 1, 1, 1, 1, 1, 1, 1, 0])

    # honesty: every dead block is numerically-zero dl on the host table
    pupil_otf(cfg)
    dl = _PUPIL_OTF_CACHE[(cfg.dim, cfg.npup, cfg.occ, cfg.dtype)]
    r_lo, S = cfg.otf_window
    slab = np.abs(dl[r_lo:r_lo + 2 * S, r_lo:cfg.dim // 2 + 128])
    thresh = 1e-12 * np.abs(dl).max()
    for j in range(m.shape[0]):
        for rb in range(m.shape[1]):
            blk = slab[rb * 128:(rb + 1) * 128, j * 128:(j + 1) * 128]
            if m[j, rb] == 0:
                assert blk.max() <= thresh

    # the production windowed buckets sit fully inside the disc
    assert _disc_block_mask(cfg.with_(otf_support=384)) is None
    assert _disc_block_mask(cfg.with_(otf_support=512)) is None


def test_disc_column_groups():
    """Chord contiguity -> maximal column groups; non-contiguous or empty
    tiles fall back to full rows."""
    g = zoom_dft.disc_column_groups
    m = np.ones((3, 4), int)
    assert g(m) == [(0, 384, 0, 512)]
    m = np.array([[0, 1, 1, 0],        # rows 128..384
                  [0, 1, 1, 0],        # same range -> merged
                  [1, 1, 1, 1]])
    assert g(m) == [(0, 256, 128, 384), (256, 384, 0, 512)]
    m = np.array([[1, 0, 1, 1],        # non-contiguous -> full rows
                  [0, 0, 0, 0]])       # empty -> full rows
    assert g(m) == [(0, 256, 0, 512)]


def test_fused_exp_zoom_disc_interpret():
    """The column-split wrapper must reproduce the plain kernel exactly
    when the masked blocks hold exactly-zero dl."""
    rng = np.random.default_rng(3)
    ndir, n, ncols, nl, m2 = 3, 256, 256, 2, 8
    dphi = rng.uniform(0, 5, (ndir, n, ncols)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, ncols)).astype(np.float32)
    dl[:128, :128] = 0.0               # col tile 0: live rows [128, 256)
    a2 = rng.standard_normal((nl, m2, n)).astype(np.float32)
    alpha = -np.abs(rng.standard_normal(nl)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, ndir)).astype(np.float32)
    mask = np.ones((2, 2), np.int32)
    mask[0, 0] = 0
    for prec in ("highest", "high"):
        u0 = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision=prec, interpret=True)
        u1 = zoom_dft.fused_exp_zoom_disc(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            mask, precision=prec, interpret=True)
        assert_allclose(np.asarray(u1), np.asarray(u0), rtol=0, atol=0)


def test_psf_chunk_pallas_disc_matches_plain():
    """At a geometry with real dead blocks (dim=1024 full window) the
    disc-split chunk path must match the plain fused path to roundoff,
    and the ndir gate must keep small-ndir configs on the plain path."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_disc_block_mask, _psf_chunk_pallas,
                                       lambda_crop_size, pupil_otf)

    cfg = GalacsiConfig(dim=1024, dim_pup=32, dimpsf=16,
                        pallas_disc_skip=True)
    assert _disc_block_mask(cfg) is not None       # dead corners exist
    ndir = cfg.pallas_disc_min_ndir                # engaged
    r_lo, S = cfg.otf_window
    rng = np.random.default_rng(5)
    # synthetic outward-growing structure function (nm^2)
    rr = np.hypot(np.add.outer(np.arange(2 * S) - S, np.zeros(S + 128)),
                  np.add.outer(np.zeros(2 * S), np.arange(S + 128) - S))
    base = (2e4 * (rr / S) ** 0.8
            * (1.0 + 0.05 * rng.standard_normal((ndir, 2 * S, S + 128))))
    base = jnp.asarray(base, cfg.dtype)
    lb = jnp.asarray([700.0, 900.0], cfg.dtype)
    npx = lambda_crop_size(lb, cfg)
    dl = pupil_otf(cfg)
    want = _psf_chunk_pallas(base, dl, lb, npx,
                             cfg.with_(pallas_disc_skip=False),
                             interpret=True)
    got = _psf_chunk_pallas(base, dl, lb, npx, cfg, interpret=True)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-7)


@pytest.mark.parametrize("db", [3, 9])
def test_fused_exp_zoom_dir_block_matches(db):
    """dir_block streams several directions per grid step with LOCAL
    accumulation (db == ndir additionally drops the scratch and issues
    each wavelength's contraction immediately).  Only the direction-sum
    association order changes — a sum of positive damping terms, so the
    variants must agree to ~1 ulp of the f64 reference tolerance."""
    ndir, n, ncols, nl, m2 = 9, 256, 256, 4, 16
    rng = np.random.default_rng(17)
    dphi = rng.uniform(0, 40, (ndir, n, ncols)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, ncols)).astype(np.float32)
    a2 = (rng.standard_normal((nl, m2, n)) / n).astype(np.float32)
    alpha = rng.uniform(-0.3, -0.1, nl).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, ndir)).astype(np.float32)
    for exp2 in (False, True):
        u0 = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision="highest", exp2=exp2, interpret=True)
        u1 = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision="highest", exp2=exp2, dir_block=db, interpret=True)
        scale = float(np.abs(np.asarray(u0)).max())
        assert np.abs(np.asarray(u1) - np.asarray(u0)).max() <= 3e-6 * scale


def test_fused_exp_zoom_dir_block_validation():
    ndir, n, nl, m2 = 9, 128, 2, 8
    rng = np.random.default_rng(1)
    args = (jnp.asarray(rng.uniform(0, 5, (ndir, n, n)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (n, n)), jnp.float32),
            jnp.asarray(rng.standard_normal((nl, m2, n)), jnp.float32),
            np.float32([-0.2, -0.1]), np.ones((nl, ndir), np.float32))
    with pytest.raises(AssertionError):
        zoom_dft.fused_exp_zoom(*args, dir_block=4, interpret=True)


def test_pallas_dir_block_policy():
    """Pinned 'auto' decisions at the production geometries (the chunk
    stays primary; the block must fit the SAME VMEM budget model as
    _pallas_lambda_chunk, with the db == ndir scratch-free body on the
    anchor-calibrated lower budget — the full-window db=9 case that the
    plain model admits at 15.4M measured 16.20M in Mosaic)."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import _pallas_dir_block
    cfg = GalacsiConfig()
    # dim=1280 reduced bucket (512 rows): scratch-free full block
    assert _pallas_dir_block(cfg, 512, 9, 12) == 9
    # dim=1280 full window: stays 1 (db=3 would not fit at chunk 7, and
    # trading the chunk down for the block is a measured per-lambda wash)
    assert _pallas_dir_block(cfg, 1280, 9, 7) == 1
    # dim=2048 reduced bucket (1024 rows, chunk 7): partial block
    assert _pallas_dir_block(GalacsiConfig(dim=2048), 1024, 9, 7) == 3
    # single direction (npsflin=1): nothing to block
    assert _pallas_dir_block(cfg, 512, 1, 12) == 1
    # forced/int and off forms
    assert _pallas_dir_block(cfg.with_(pallas_dir_block=3), 512, 9, 12) == 3
    assert _pallas_dir_block(cfg.with_(pallas_dir_block=0), 512, 9, 12) == 1
    assert _pallas_dir_block(cfg.with_(pallas_dir_block=1), 512, 9, 12) == 1
    with pytest.raises(ValueError):
        _pallas_dir_block(cfg.with_(pallas_dir_block=4), 512, 9, 12)


def test_psf_chunk_pallas_dir_block_matches_plain():
    """The chunk path with a forced direction block must match the
    default path to direction-sum reassociation roundoff."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_psf_chunk_pallas,
                                       lambda_crop_size, pupil_otf)
    cfg = GalacsiConfig(dim=512, dim_pup=16, dimpsf=12)
    ndir = 9
    r_lo, S = cfg.otf_window
    rng = np.random.default_rng(5)
    rr = np.hypot(np.add.outer(np.arange(2 * S) - S, np.zeros(S + 128)),
                  np.add.outer(np.zeros(2 * S), np.arange(S + 128) - S))
    base = (2e4 * (rr / S) ** 0.8
            * (1.0 + 0.05 * rng.standard_normal((ndir, 2 * S, S + 128))))
    base = jnp.asarray(base, cfg.dtype)
    lb = jnp.asarray([700.0, 900.0], cfg.dtype)
    npx = lambda_crop_size(lb, cfg)
    dl = pupil_otf(cfg)
    want = _psf_chunk_pallas(base, dl, lb, npx, cfg, interpret=True)
    for db in (3, 9):
        got = _psf_chunk_pallas(base, dl, lb, npx, cfg, dir_block=db,
                                interpret=True)
        assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                        atol=2e-6)


def test_pallas_zoom_plan():
    """Pinned (row_splits, dir_block) plans: the rows split ONLY when
    that is what admits the scratch-free full direction block (full
    window 1280: two 640-row db=9 launches measured 1.42x the single
    db=1 launch, while db=3-with-scratch loses), never under an
    explicit pallas_dir_block, and never for ndir=1."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import _pallas_zoom_plan
    cfg = GalacsiConfig()
    assert _pallas_zoom_plan(cfg, 512, 9, 12) == (1, 9, 128)
    assert _pallas_zoom_plan(cfg, 1280, 9, 7) == (2, 9, 128)
    assert _pallas_zoom_plan(GalacsiConfig(dim=2048), 1024, 9, 7) \
        == (2, 9, 128)
    # 2048 full: a 1024-row slice still blows the budget (17M) -> 4x512
    assert _pallas_zoom_plan(GalacsiConfig(dim=2048), 2048, 9, 4) \
        == (4, 9, 128)
    # tile_j stays 128 everywhere: the 256-column tile on the
    # single-direction full grid was 1.07x in isolation but a measured
    # NIGHT-LEVEL NEGATIVE (0.981 paired, 7/10 below 1) — see the plan
    # docstring / RESULTS.md
    assert _pallas_zoom_plan(cfg, 1280, 1, 7) == (1, 1, 128)
    assert _pallas_zoom_plan(cfg, 512, 1, 12) == (1, 1, 128)
    assert _pallas_zoom_plan(GalacsiConfig(dim=2048), 2048, 1, 4) \
        == (1, 1, 128)
    assert _pallas_zoom_plan(cfg.with_(pallas_dir_block=3), 1280, 9,
                             7) == (1, 3, 128)
    assert _pallas_zoom_plan(cfg.with_(pallas_dir_block=0), 1280, 9,
                             7) == (1, 1, 128)


def test_fused_exp_zoom_ndir1_body_bit_identical():
    """At ndir=1 the scratch-free immediate-contraction body
    (_kernel_dirfull) replaces the legacy scratch body — SAME ops in
    the same order, so the outputs must be bit-identical (the
    ``ndir1_scratch=True`` escape keeps the legacy layout for A/B
    measurements, cfg.pallas_dir_block != 'auto')."""
    n, ncols, nl, m2 = 256, 128, 3, 16
    rng = np.random.default_rng(3)
    dphi = rng.uniform(0, 40, (1, n, ncols)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, ncols)).astype(np.float32)
    a2 = (rng.standard_normal((nl, m2, n)) / n).astype(np.float32)
    alpha = rng.uniform(-0.3, -0.1, nl).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, 1)).astype(np.float32)
    for exp2 in (False, True):
        legacy = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision="highest", exp2=exp2, ndir1_scratch=True,
            interpret=True)
        new = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision="highest", exp2=exp2, interpret=True)
        assert np.array_equal(np.asarray(new), np.asarray(legacy))


def test_pallas_lambda_chunk_ndir1_free():
    """Pinned scratch-free ndir=1 VMEM model (calibrated against a
    measured Mosaic compile at the dim=1280 full window): the full
    window fits the big chunk of 12 (3 launches per 35-lambda cube
    instead of 5), the reduced bucket keeps its 12, dim=2048 full stays
    VMEM-capped below 12 (policy falls back to lambda_chunk 7), and the
    8192 too-big guard still reports 0."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_pallas_chunk_policy,
                                       _pallas_lambda_chunk)
    cfg = GalacsiConfig()
    assert _pallas_lambda_chunk(cfg, 1280, ndir1_free=True) == 12
    assert _pallas_lambda_chunk(cfg, 640, ndir1_free=True) >= 12
    k2 = _pallas_lambda_chunk(GalacsiConfig(dim=2048), 2048,
                              ndir1_free=True)
    assert 7 <= k2 < 12
    assert _pallas_chunk_policy(GalacsiConfig(dim=2048), k2) == 7
    assert _pallas_lambda_chunk(GalacsiConfig(dim=8192), 8192,
                                ndir1_free=True) == 0
    # anchor path keeps its own budget model
    assert (_pallas_lambda_chunk(cfg, 1280, anchor=True, ndir1_free=True)
            == _pallas_lambda_chunk(cfg, 1280, anchor=True))


def test_ndir1_full_window_chunk_policy():
    """Pinned composition of the ndir=1 chunk policy: under
    pallas_dir_block='auto' the dim=1280 FULL-window bucket runs the
    big wavelength chunk (k_fit 12 -> policy 12, 3 launches per
    35-lambda cube), while an explicit integer pallas_dir_block keeps
    the legacy scratch model (k_fit 7 -> lambda_chunk 7, 5 launches)."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_pallas_chunk_policy,
                                       _pallas_lambda_chunk)
    cfg = GalacsiConfig()

    def k_for(cfg, nrows, ndir):
        k_fit = _pallas_lambda_chunk(
            cfg, nrows, ndir1_free=(ndir == 1
                                    and cfg.pallas_dir_block == "auto"))
        return min(_pallas_chunk_policy(cfg, k_fit), k_fit, 35)

    assert k_for(cfg, 1280, 1) == 12                      # full window
    assert k_for(cfg, 512, 1) == 12                       # reduced bucket
    assert k_for(cfg.with_(pallas_dir_block=1), 1280, 1) == 7   # legacy
    assert k_for(GalacsiConfig(dim=2048), 2048, 1) == 7   # VMEM-capped


def test_psf_chunk_pallas_ndir1_scratch_matches_auto():
    """The full chunk path at ndir=1 with the legacy scratch body
    (explicit pallas_dir_block) must match the default scratch-free
    path bit-for-bit."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_psf_chunk_pallas,
                                       lambda_crop_size, pupil_otf)
    cfg = GalacsiConfig(dim=512, dim_pup=16, dimpsf=12)
    r_lo, S = cfg.otf_window
    rng = np.random.default_rng(5)
    rr = np.hypot(np.add.outer(np.arange(2 * S) - S, np.zeros(S + 128)),
                  np.add.outer(np.zeros(2 * S), np.arange(S + 128) - S))
    base = (2e4 * (rr / S) ** 0.8
            * (1.0 + 0.05 * rng.standard_normal((1, 2 * S, S + 128))))
    base = jnp.asarray(base, cfg.dtype)
    lb = jnp.asarray([700.0, 900.0], cfg.dtype)
    npx = lambda_crop_size(lb, cfg)
    dl = pupil_otf(cfg)
    want = _psf_chunk_pallas(base, dl, lb, npx, cfg, interpret=True)
    got = _psf_chunk_pallas(base, dl, lb, npx,
                            cfg.with_(pallas_dir_block=1), interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_psf_chunk_pallas_row_split_matches_plain():
    """The row-sliced launch sum must match the single launch to the
    one extra f32 contraction reassociation."""
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import (_psf_chunk_pallas,
                                       lambda_crop_size, pupil_otf)
    cfg = GalacsiConfig(dim=512, dim_pup=16, dimpsf=12)
    ndir = 9
    r_lo, S = cfg.otf_window
    rng = np.random.default_rng(5)
    rr = np.hypot(np.add.outer(np.arange(2 * S) - S, np.zeros(S + 128)),
                  np.add.outer(np.zeros(2 * S), np.arange(S + 128) - S))
    base = (2e4 * (rr / S) ** 0.8
            * (1.0 + 0.05 * rng.standard_normal((ndir, 2 * S, S + 128))))
    base = jnp.asarray(base, cfg.dtype)
    lb = jnp.asarray([700.0, 900.0], cfg.dtype)
    npx = lambda_crop_size(lb, cfg)
    dl = pupil_otf(cfg)
    want = _psf_chunk_pallas(base, dl, lb, npx, cfg, interpret=True)
    got = _psf_chunk_pallas(base, dl, lb, npx, cfg, dir_block=9,
                            row_splits=2, interpret=True)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-6)


def test_fused_exp_zoom_row_splits_matches():
    """The in-kernel row-slice accumulation (row_splits, revisited
    output block) must match the single launch to contraction
    reassociation roundoff, and reject a non-full direction block."""
    ndir, n, ncols, nl, m2 = 9, 256, 256, 4, 16
    rng = np.random.default_rng(23)
    dphi = rng.uniform(0, 40, (ndir, n, ncols)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, ncols)).astype(np.float32)
    a2 = (rng.standard_normal((nl, m2, n)) / n).astype(np.float32)
    alpha = rng.uniform(-0.3, -0.1, nl).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (nl, ndir)).astype(np.float32)
    u0 = zoom_dft.fused_exp_zoom(
        jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
        precision="highest", interpret=True)
    for exp2 in (False, True):
        u1 = zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            precision="highest", exp2=exp2, dir_block=ndir, row_splits=2,
            interpret=True)
        scale = float(np.abs(np.asarray(u0)).max())
        assert np.abs(np.asarray(u1) - np.asarray(u0)).max() \
            <= 3e-6 * scale
    with pytest.raises(AssertionError):
        zoom_dft.fused_exp_zoom(
            jnp.asarray(dphi), jnp.asarray(dl), jnp.asarray(a2), alpha, w,
            dir_block=3, row_splits=2, interpret=True)
