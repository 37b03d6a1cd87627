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


def _psd_to_psf_ref_numpy(psd, pup, D, lbda, samp):
    """Literal float64 transcription of the reference's live sub-Nyquist
    path (psfrec.py:716-801, ``samp <= sampnum`` branch)."""
    from numpy.fft import ifft2, fft2, fftshift
    dim = psd.shape[0]
    npup = pup.shape[0]
    sampnum = dim / npup
    L = D * sampnum
    convnm = 2 * np.pi / (lbda * 1e9)
    bg = ifft2(fftshift(psd * convnm ** 2)) * (psd.size / L ** 2)
    Dphi = fftshift(2 * (bg[0, 0].real - bg.real))
    dimnum = int(np.fix(dim * (samp / sampnum) / 2)) * 2
    sampout = dimnum / npup
    ns = sampout * npup / 2
    sl = slice(int(dim / 2 - ns), int(dim / 2 + ns))
    Dphi2 = Dphi[sl, sl]
    tab = np.zeros((dimnum, dimnum), complex)
    tab[:npup, :npup] = pup
    dl_fto = fftshift(np.abs(fft2(np.abs(ifft2(tab)) ** 2)) / pup.sum())
    sys_fto = fftshift(np.exp(-Dphi2 / 2) * dl_fto)
    psf = fftshift(ifft2(sys_fto).real)
    return psf / psf.sum(), sampout


def test_psd_to_psf_sub_nyquist():
    """samp in (0, 2): the central-crop branch of psd_to_psf
    (psfrec.py:733-736) against a literal NumPy transcription."""
    dim, npup, D = 256, 64, 8.0
    L = D * dim / npup
    c = (dim - 1) / 2.0
    fx = (np.arange(dim) - c)[:, None] / L
    fr = np.hypot(fx, fx.T)
    psd = 0.0229 * 0.15 ** (-5 / 3) * (fr ** 2 + 1 / 625) ** (-11 / 6)
    psd *= (500.0 / (2 * np.pi)) ** 2          # rad^2 -> nm^2-ish scale
    pup = np.asarray(ref_api.pupil_mask(npup / 2, npup, oc=0.14), float)

    # samp below npup^2/dim makes the OTF grid smaller than the pupil and
    # crashes in the reference too (tab[:npup, :npup] = pup broadcast)
    for samp in (1.5, 1.25, 1.0):
        got, sampout, fov = ref_api.psd_to_psf(psd, pup, D, 600e-9,
                                               samp=samp, return_all=True)
        want, sampout_ref = _psd_to_psf_ref_numpy(psd, pup, D, 600e-9, samp)
        assert float(sampout) == sampout_ref
        assert got.shape == want.shape == (int(sampout_ref * npup),) * 2
        assert np.abs(np.asarray(got) - want).max() < 1e-12


def _recon_ref_numpy(f, arg_f, pitchs, poslgs, sigr, dsp_recons, h_recons,
                     LSE):
    """Literal transcription of the reference reconstructor with per-WFS
    pitches (psfrec.py:232-363, nb_h_recons == 1)."""
    f_x = f * np.cos(arg_f)
    f_y = f * np.sin(arg_f)
    s = f.shape[0]
    p = pitchs[:, None, None]
    wfs = 2 * np.pi * 1j * f * np.sinc(p * f_x) * np.sinc(p * f_y)
    fc = 1 / (2 * p)
    wfs[(f != 0) & (np.abs(f_x) >= fc) | (np.abs(f_y) >= fc)] = 0.0
    nb_gs = poslgs.shape[1]
    Mr = np.zeros((nb_gs, s, s), complex)
    for j in range(nb_gs):
        ff = (f_x * poslgs[0, j] + f_y * poslgs[1, j]) * h_recons * 60 / 206265
        Mr[j] = wfs[j] * np.exp(1j * 2 * np.pi * ff)
    res_tmp = Mr.conj() / sigr[:, None, None]
    MAP = np.einsum("gxy,gxy->xy", res_tmp, Mr)
    if not LSE:
        cphi_inv = 1.0 / dsp_recons
        cphi_inv[0, 0] = 0.0
        MAP = MAP + cphi_inv
    inv = np.zeros_like(MAP)
    for j in range(s):                      # the reference's per-pixel loop
        for i in range(s):
            if MAP[i, j] != 0 and not (i == 0 and j == 0):
                inv[i, j] = 1.0 / MAP[i, j]
    return inv[None] * res_tmp              # W1[gs, s, s]


def test_reconstructor_unequal_pitches():
    """Per-WFS heterogeneous pitches through the general reconstructor
    path (psfrec.py:232-257: pitchs_wfs broadcast to (nb_gs, s, s) with
    per-WFS cutoffs), LSE and MAP, vs a literal transcription."""
    s = 64
    f, f_x, f_y = orc.freq_grids(s, 8 / 40)
    with np.errstate(all="ignore"):
        t = np.where(f == 0, 0.0, f_y / f_x)
    arg_f = np.arctan(t)
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T * 63 / 60
    pitchs = np.array([8 / 24, 8 / 24, 8 / 32, 8 / 16])
    sigr = np.array([1.0, 2.0, 0.5, 1.0])
    dsp_recons = orc.vk_psd(f, 0.15, 25.0)

    for lse in (True, False):
        got = ref_api.calc_mat_rec_glao_finale(
            f, arg_f, pitchs, pitchs, poslgs, sigr, dsp_recons[None],
            np.array([1.0]), LSE=lse)[:, 0]
        want = _recon_ref_numpy(f, arg_f, pitchs, poslgs, sigr,
                                dsp_recons.copy(), 1.0, lse)
        assert np.abs(np.asarray(got) - want).max() < 1e-10
        # the differing cutoffs really bite: the wide-pitch WFS (8/16 m,
        # fc = 1 m^-1) is masked at frequencies the fine one still sees
        assert np.any((np.asarray(got)[3] == 0) & (np.asarray(got)[2] != 0))


def test_residual_psd_unequal_pitches():
    """Residual PSD with per-WFS pitches (psfrec.py:429-435 general
    broadcast) vs a literal transcription of psfrec.py:437-525."""
    s = 64
    f, f_x, f_y = orc.freq_grids(s, 8 / 40)
    with np.errstate(all="ignore"):
        t = np.where(f == 0, 0.0, f_y / f_x)
    arg_f = np.arctan(t)
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T * 63 / 60
    pitchs = np.array([8 / 24, 8 / 24, 8 / 32, 8 / 16])
    sigr = np.ones(4)
    h_vrai = np.array([100.0, 10000.0])
    layers = orc.vk_psd(f, np.array([0.7, 0.3])[:, None, None] ** (-3 / 5)
                        * 0.15, 25.0)
    wind = np.stack([12.0 * np.cos([0.6, -0.3]), 12.0 * np.sin([0.6, -0.3])])
    ti = np.full(4, 1e-3)
    td = 2.5e-3
    beta = np.array([0.1, -0.2])
    W = _recon_ref_numpy(f, arg_f, pitchs, poslgs, sigr,
                         orc.vk_psd(f, 0.15, 25.0), 1.0, True)

    got = ref_api.calc_dsp_res_glao_finale(
        f, arg_f, pitchs, poslgs, beta, sigr, layers, h_vrai, 1.0,
        W[:, None], td, ti, wind, tempo=True, fitting=True)

    # literal transcription (reference psfrec.py:429-525)
    p = pitchs[:, None, None]
    wfs = 2 * np.pi * 1j * f * np.sinc(p * f_x) * np.sinc(p * f_y)
    fc = 1 / (2 * p)
    wfs[(f != 0) & (np.abs(f_x) > fc) | (np.abs(f_y) > fc)] = 0.0
    Mv = np.zeros((2, 4, s, s), complex)
    for i in range(2):
        for j in range(4):
            ff = (f_x * poslgs[0, j] + f_y * poslgs[1, j]) * h_vrai[i] * 60 / 206265
            www = np.sinc(wind[0, i] * ti[j] * f_x + wind[1, i] * ti[j] * f_y)
            Mv[i, j] = www * wfs[j] * np.exp(1j * 2 * np.pi * ff)
    dT = ti.max() + td
    proj_beta = np.stack([
        np.exp(1j * 2 * np.pi * (hv * 60 / 206265 *
                                 (beta[0] * f_x + beta[1] * f_y)
                                 - (wind[0, i] * dT * f_x
                                    + wind[1, i] * dT * f_y)))
        for i, hv in enumerate(h_vrai)])
    p_dm = np.exp(1j * 2 * np.pi * 1.0 * 60 / 206265 *
                  (beta[0] * f_x + beta[1] * f_y))
    proj_tmp = p_dm[None] * W
    proj = proj_beta - np.einsum("gxy,lgxy->lxy", proj_tmp, Mv)
    err_recons = np.sum(proj * layers * proj.conj(), axis=0).real
    err_recons[0, 0] = 0.0
    err_noise = np.sum(np.abs(proj_tmp) ** 2 * sigr[:, None, None], axis=0)
    err_noise[0, 0] = 0.0
    want = err_recons + err_noise
    assert np.abs(np.asarray(got) - want).max() < 1e-10


def test_residual_psd_multi_dm_layers():
    """Multiple DM layers: the reference sums the per-DM phasor against
    Wmap ('sum on nb_h_dm', psfrec.py:460-471, with numpy broadcasting
    when the Wmap DM axis is 1).  The shim folds that sum into an
    effective per-GS reconstructor; checked against a literal
    transcription for both a true 2-DM Wmap and the broadcast case."""
    s = 64
    f, f_x, f_y = orc.freq_grids(s, 8 / 40)
    with np.errstate(all="ignore"):
        t = np.where(f == 0, 0.0, f_y / f_x)
    arg_f = np.arctan(t)
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T * 63 / 60
    pitchs = np.array([8 / 24, 8 / 24, 8 / 32, 8 / 16])
    sigr = np.ones(4)
    h_vrai = np.array([100.0, 10000.0])
    layers = orc.vk_psd(f, np.array([0.7, 0.3])[:, None, None] ** (-3 / 5)
                        * 0.15, 25.0)
    wind = np.stack([12.0 * np.cos([0.6, -0.3]), 12.0 * np.sin([0.6, -0.3])])
    ti = np.full(4, 1e-3)
    td = 2.5e-3
    beta = np.array([0.1, -0.2])
    h_dm = np.array([1.0, 10000.0])
    W = _recon_ref_numpy(f, arg_f, pitchs, poslgs, sigr,
                         orc.vk_psd(f, 0.15, 25.0), 1.0, True)

    # shared transcription pieces (psfrec.py:429-525)
    p = pitchs[:, None, None]
    wfs = 2 * np.pi * 1j * f * np.sinc(p * f_x) * np.sinc(p * f_y)
    fc = 1 / (2 * p)
    wfs[(f != 0) & (np.abs(f_x) > fc) | (np.abs(f_y) > fc)] = 0.0
    Mv = np.zeros((2, 4, s, s), complex)
    for i in range(2):
        for j in range(4):
            ff = (f_x * poslgs[0, j] + f_y * poslgs[1, j]) \
                * h_vrai[i] * 60 / 206265
            www = np.sinc(wind[0, i] * ti[j] * f_x + wind[1, i] * ti[j] * f_y)
            Mv[i, j] = www * wfs[j] * np.exp(1j * 2 * np.pi * ff)
    dT = ti.max() + td
    proj_beta = np.stack([
        np.exp(1j * 2 * np.pi * (hv * 60 / 206265 *
                                 (beta[0] * f_x + beta[1] * f_y)
                                 - (wind[0, i] * dT * f_x
                                    + wind[1, i] * dT * f_y)))
        for i, hv in enumerate(h_vrai)])
    p_dm = np.stack([np.exp(1j * 2 * np.pi * h * 60 / 206265 *
                            (beta[0] * f_x + beta[1] * f_y)) for h in h_dm])

    def want_for(wmap4):
        proj_tmp = np.einsum("dxy,gdxy->gxy", p_dm,
                             np.broadcast_to(wmap4, (4, 2, s, s)))
        proj = proj_beta - np.einsum("gxy,lgxy->lxy", proj_tmp, Mv)
        err_recons = np.sum(proj * layers * proj.conj(), axis=0).real
        err_recons[0, 0] = 0.0
        err_noise = np.sum(np.abs(proj_tmp) ** 2 * sigr[:, None, None],
                           axis=0)
        err_noise[0, 0] = 0.0
        return err_recons + err_noise

    # true 2-DM Wmap (nb_gs, 2, s, s)
    wmap2 = np.stack([0.6 * W, 0.4 * W], axis=1)
    got = ref_api.calc_dsp_res_glao_finale(
        f, arg_f, pitchs, poslgs, beta, sigr, layers, h_vrai, h_dm,
        wmap2, td, ti, wind, tempo=True, fitting=True)
    assert np.abs(np.asarray(got) - want_for(wmap2)).max() < 1e-10

    # broadcast case: single-DM Wmap against two h_dm values
    got_b = ref_api.calc_dsp_res_glao_finale(
        f, arg_f, pitchs, poslgs, beta, sigr, layers, h_vrai, h_dm,
        W[:, None], td, ti, wind, tempo=True, fitting=True)
    assert np.abs(np.asarray(got_b) - want_for(W[:, None])).max() < 1e-10


def test_simul_psd_wfm_rejects_non_two_layer_profiles():
    """The reference crashes with a broadcast error for != 2 layers (its
    wind-direction array is pinned to two IDL values); we raise clearly."""
    import pytest
    with pytest.raises(NotImplementedError):
        ref_api.simul_psd_wfm([0.5, 0.3, 0.2], (0, 5000, 10000), 1.0, 25.0,
                              verbose=False)
