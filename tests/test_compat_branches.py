"""Compat-layer branch parity: tempo=False, fitting=False band cut, and
3-laser simul_psd_wfm all match literal transcriptions of the reference
expressions / the oracle."""

import numpy as np
from numpy.testing import assert_allclose

import muse_psfr as ref_api
from benchmarks import oracle_numpy as orc


def _setup():
    r0ref = float(ref_api.seeing2r01(1.0, 0.5, 0))
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T * 63 / 60
    f, f_x, f_y = orc.freq_grids(80, 8 / 40)
    with np.errstate(all="ignore"):
        t = np.where(f == 0, 0.0,
                     np.fft.fftfreq(80, 0.2)[None, :] /
                     np.fft.fftfreq(80, 0.2)[:, None])
    arg_f = np.arctan(np.where(np.isnan(t), 0, t))
    layers = orc.vk_psd(f, np.array([0.7, 0.3])[:, None, None] ** (-3 / 5)
                        * r0ref, 25.0)
    W = orc.glao_reconstructor(f, f_x, f_y, poslgs, np.ones(4), 8 / 24)
    return f, arg_f, poslgs, layers, W


def test_dsp_res_tempo_false_and_band_cut():
    f, arg_f, poslgs, layers, W = _setup()
    pitchs = np.repeat(8 / 24, 4)
    # tempo=False zeroes wind/ti/td; fitting=False applies the band cut
    res = ref_api.calc_dsp_res_glao_finale(
        f, arg_f, pitchs, poslgs, np.zeros(2), np.ones(4), layers,
        np.array([100.0, 10000.0]), 1.0, W[:, None], 99.0,
        np.full(4, 99.0), np.full((2, 2), 99.0), tempo=False, fitting=False)
    # compare against the oracle with explicitly zeroed temporal terms
    want = orc.residual_psd(*orc.freq_grids(80, 0.2), poslgs, np.zeros(2),
                            np.ones(4), layers, np.array([100.0, 10000.0]),
                            1.0, W, 0.0, np.zeros(4), np.zeros((2, 2)))
    fc = 1.5
    fr, fx, fy = orc.freq_grids(80, 0.2)
    want = np.where((fr != 0) & (abs(fx) <= fc) & (abs(fy) <= fc), want, 0)
    assert np.abs(res - want).max() < 1e-9
    # the cut really removes power beyond fc (fx = 41/16 > 1.5 at [41, 0])
    assert res[41, 0] == 0 and want[41, 0] == 0
    assert res[4, 4] > 0          # inside the pass band


def test_simul_psd_wfm_three_lgs_and_multidir():
    psd = ref_api.simul_psd_wfm([0.7, 0.3], (100, 10000), 1.0, 25.0,
                                npsflin=3, three_lgs_mode=True,
                                verbose=False)
    want = orc.simulate_psd([0.7, 0.3], (100, 10000), 1.0, 25.0,
                            npsflin=3, three_lgs_mode=True)
    assert psd.shape == (9, 1280, 1280)
    assert np.abs(psd - want).max() / want.max() < 1e-12


def test_zenith_scaling():
    """zenith only rescales r0; PSD at zenith=60deg differs accordingly."""
    p0 = ref_api.simul_psd_wfm([0.7, 0.3], (100, 10000), 1.0, 25.0,
                               verbose=False)
    p60 = ref_api.simul_psd_wfm([0.7, 0.3], (100, 10000), 1.0, 25.0,
                                zenith=60.0, verbose=False)
    # r0 smaller by cos(60)^(3/5) -> PSD larger by cos(60)^(-1) exactly
    # in the von-Karman amplitude r0^(-5/3)
    ratio = np.cos(np.deg2rad(60.0)) ** (-1.0)
    sl = slice(0, 100)  # pure fitting-error region scales exactly
    assert_allclose(p60[0, sl, sl] / p0[0, sl, sl], ratio, rtol=1e-10)


def test_simul_psd_wfm_rejects_non_two_layer_profiles():
    """The reference crashes with a broadcast error for != 2 layers (its
    wind-direction array is pinned to two IDL values); we raise clearly."""
    import pytest
    with pytest.raises(NotImplementedError):
        ref_api.simul_psd_wfm([0.5, 0.3, 0.2], (0, 5000, 10000), 1.0, 25.0,
                              verbose=False)
