"""MAP reconstructor law in the batched pipeline (``cfg.lse=False``).

The reference hardcodes LSE in its shipped pipeline (psfrec.py:96) but its
MAP path (psfrec.py:300-324) is live and callable through ``dsp4muse``;
the batched equivalent folds the prior into the traced part (only the
per-frequency inversion ``1/(D0 + Cphi^-1(r0, L0))`` depends on
telemetry).  Pinned here against a composition of the compat ``dsp4muse``
(law='MAP' — itself pinned to a literal reference transcription in
test_compat_branches) with the fitting-PSD merge of psfrec.py:138-151.
"""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

import muse_psfr as ref_api
from muse_psfr_tpu.config import TINY_CONFIG
from muse_psfr_tpu.psd.model import (simulate_psd, simulate_psd_split,
                                     effective_wind_speed)
from muse_psfr_tpu.otf.psf import dphi_base, dphi_base_split

H = (100, 10000)
CFG64 = TINY_CONFIG.with_(dtype="float64", lse=False)


def _map_want(cfg, seeing, GL, L0, three_lgs=False):
    r0ref = float(ref_api.seeing2r01(seeing, cfg.lambda_ref, 0))
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T
    poslgs = poslgs[:, :3] * cfg.sep_lgs if three_lgs else poslgs * cfg.sep_lgs
    dirperf = ref_api.direction_perf(1)
    arg_v = np.array([cfg.wind_dir_0, cfg.wind_dir_1])
    ws = effective_wind_speed(H, cfg)
    dsp = ref_api.dsp4muse(cfg.dpup, cfg.dim_pup, cfg.dimall,
                           np.array([GL, 1.0 - GL]), np.array(H, float),
                           L0, r0ref, 1, cfg.alt_dm, np.full(2, ws), arg_v,
                           "MAP", cfg.nsspup, cfg.nact, cfg.fsamp,
                           cfg.delay_ms, cfg.noise_lgs2, cfg.lambda_ref,
                           poslgs, dirperf)
    # fitting merge, transcribed from reference psfrec.py:138-151
    dspa = np.fft.fftshift(ref_api.psd_fit(cfg.dim, 2 * cfg.dpup, r0ref,
                                           L0, cfg.fc))
    out = np.resize(dspa, (1, cfg.dim, cfg.dim))
    sl = slice(cfg.dim // 2 - cfg.dim_pup, cfg.dim // 2 + cfg.dim_pup)
    out[:, sl, sl] = np.maximum(dspa[sl, sl],
                                np.fft.fftshift(dsp, axes=(1, 2)))
    return out * (cfg.lambda_ref * 1000.0 / (2 * np.pi)) ** 2


def test_batched_map_matches_reference_composition():
    ws = effective_wind_speed(H, CFG64)
    for seeing, GL, L0, m4 in [(1.0, 0.7, 25.0, 1.0), (1.3, 0.4, 12.0, 0.0)]:
        mask = jnp.array([1.0, 1.0, 1.0, m4], jnp.float64)
        got = np.asarray(simulate_psd(seeing, GL, L0, mask, H, ws, 1, CFG64))
        want = _map_want(CFG64, seeing, GL, L0, three_lgs=(m4 == 0.0))
        assert np.abs(got - want).max() / want.max() < 1e-12


def test_map_differs_from_lse_only_in_correction_zone():
    ws = effective_wind_speed(H, CFG64)
    mask = jnp.ones(4, jnp.float64)
    p_map = np.asarray(simulate_psd(1.0, 0.7, 25.0, mask, H, ws, 1, CFG64))
    p_lse = np.asarray(simulate_psd(1.0, 0.7, 25.0, mask, H, ws, 1,
                                    CFG64.with_(lse=True)))
    sl = slice(CFG64.dim // 2 - CFG64.dim_pup,
               CFG64.dim // 2 + CFG64.dim_pup)
    inner = np.zeros_like(p_map, bool)
    inner[:, sl, sl] = True
    assert np.array_equal(p_map[~inner], p_lse[~inner])
    assert np.abs(p_map[inner] - p_lse[inner]).max() > 0


def test_map_split_path_matches_exact():
    ws = effective_wind_speed(H, CFG64)
    mask = jnp.ones(4, jnp.float64)
    exact = dphi_base(simulate_psd(1.2, 0.5, 18.0, mask, H, ws, 1, CFG64),
                      CFG64)
    w, delta = simulate_psd_split(1.2, 0.5, 18.0, mask, H, ws, 1, CFG64)
    split = dphi_base_split(w, delta, CFG64)
    rel = float(jnp.max(jnp.abs(split - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 1e-9


def test_map_full_pipeline_float32():
    """End-to-end float32 MAP batch runs and stays within the precision
    budget of its float64 twin."""
    from muse_psfr_tpu.parallel.batch import reconstruct_batch
    lbda = np.array([700.0, 900.0])
    kw = dict(npsflin=1, chunk=2)
    a = reconstruct_batch([1.0], [0.7], [25.0], np.ones((1, 4)), lbda,
                          cfg=TINY_CONFIG.with_(lse=False), **kw)
    b = reconstruct_batch([1.0], [0.7], [25.0], np.ones((1, 4)), lbda,
                          cfg=CFG64.with_(fit_dtype="float64"), **kw)
    assert np.abs(a - b).max() < 1e-5


def test_wfs_pitch_uses_nsspup():
    """The WFS transfer functions use Dpup/nsspup (reference
    psfrec.py:578), NOT the DM pitch Dpup/nact (which only sets the
    fitting cutoff ``fc``; the reference reconstructor's ``pitchs_dm``
    parameter is dead).  Regression: ``cfg.nsspup`` was silently
    ignored, so nsspup != nact configs diverged from the reference."""
    cfg = CFG64.with_(nsspup=48.0)
    ws = effective_wind_speed(H, cfg)
    mask = jnp.ones(4, jnp.float64)
    got = np.asarray(simulate_psd(1.0, 0.7, 25.0, mask, H, ws, 1, cfg))
    want = _map_want(cfg, 1.0, 0.7, 25.0)
    assert np.abs(got - want).max() / want.max() < 1e-12
    # and the knob must actually bite (it used to be a silent no-op)
    got_def = np.asarray(simulate_psd(1.0, 0.7, 25.0, mask, H, ws, 1,
                                      CFG64))
    assert np.abs(got - got_def).max() > 0.0
