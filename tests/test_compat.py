"""The ``muse_psfr`` drop-in shim: reference-named API behaves like the
reference (validated against the float64 oracle and reference semantics)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import muse_psfr as ref_api
from benchmarks import oracle_numpy as orc


def test_seeing2r01_and_pupil_mask():
    assert_allclose(ref_api.seeing2r01(1.0, 0.5, 0.0),
                    0.976 * 0.5 / 1.0 / 4.85, rtol=1e-12)
    m = ref_api.pupil_mask(5, 20, oc=0.2, inverse=False)
    assert m.dtype.kind == "i"
    assert m[9, 9] == 0 and m[9, 13] == 1   # centre blocked by obscuration


def test_simul_psd_wfm_matches_oracle():
    psd = ref_api.simul_psd_wfm([0.7, 0.3], (100, 10000), 1.0, 25.0,
                                npsflin=1, dim=1280)
    ref = orc.simulate_psd([0.7, 0.3], (100, 10000), 1.0, 25.0)
    assert psd.shape == (1, 1280, 1280)
    assert np.abs(psd - ref).max() / ref.max() < 1e-12


def test_dsp4muse_and_reconstructor_roundtrip():
    """dsp4muse through the compat wrappers == the oracle's 80x80 stage."""
    r0ref = float(ref_api.seeing2r01(1.0, 0.5, 0))
    poslgs = np.array([[1, 1], [-1, -1], [-1, 1], [1, -1]], float).T * 63
    dirperf = ref_api.direction_perf(1)
    arg_v = np.array([0.628163, -0.326497])
    dsp = ref_api.dsp4muse(8.0, 40, 80, np.array([0.7, 0.3]),
                           np.array([100.0, 10000.0]), 25.0, r0ref, 1, 1.0,
                           np.full(2, 12.0), arg_v, "LSE", 24.0, 24.0,
                           1000.0, 2.5, 1.0, 0.5, poslgs, dirperf)
    f, f_x, f_y = orc.freq_grids(80, 8 / 40)
    W = orc.glao_reconstructor(f, f_x, f_y, poslgs / 60, np.ones(4), 8 / 24)
    layers = orc.vk_psd(f, np.array([0.7, 0.3])[:, None, None] ** (-3 / 5)
                        * r0ref, 25.0)
    wind = np.stack([12.0 * np.cos(arg_v), 12.0 * np.sin(arg_v)])
    want = orc.residual_psd(f, f_x, f_y, poslgs / 60, np.zeros(2),
                            np.ones(4), layers, np.array([100.0, 10000.0]),
                            1.0, W, 2.5e-3, np.full(4, 1e-3), wind).T
    assert np.abs(dsp[0] - want).max() < 1e-9


def test_psd_to_psf_general():
    """The standalone forward model matches the oracle on the live branch
    and rejects the reference's crashing branches."""
    psd = orc.simulate_psd([0.7, 0.3], (100, 10000), 1.0, 25.0)[0]
    pup = orc.pupil(1280 / 4, 640, oc=0.14)
    got = np.asarray(ref_api.psd_to_psf(psd, pup, 8.0, 500e-9, samp=2))
    want = orc.psd_to_psf(psd, pup, 500e-9)
    assert np.abs(got - want).max() < 1e-12

    with pytest.raises(NotImplementedError):
        ref_api.psd_to_psf(psd, pup, 8.0, 500e-9, samp=3)
    with pytest.raises(NotImplementedError):
        ref_api.psd_to_psf(psd, pup, 8.0, 500e-9, samp=2, FoV=99.0)
    with pytest.raises(NotImplementedError):
        ref_api.interpolate(np.zeros((4, 4)), np.zeros((2, 2, 2)),
                            method="cubic")


def test_psd_to_psf_return_all_and_static_phase():
    psd = orc.simulate_psd([0.7, 0.3], (100, 10000), 1.0, 25.0)[0]
    pup = orc.pupil(1280 / 4, 640, oc=0.14)
    psf, sampout, fov = ref_api.psd_to_psf(psd, pup, 8.0, 700e-9, samp=2,
                                           return_all=True)
    assert sampout == 2.0
    assert np.isclose(fov, 700e-9 / (2 * 8) * 1280 / 4.85e-6)
    phase = np.zeros((640, 640))
    psf2 = np.asarray(ref_api.psd_to_psf(psd, pup, 8.0, 700e-9, samp=2,
                                         phase_static=phase))
    assert_allclose(psf2, np.asarray(psf), atol=1e-12)


def test_convolve_and_fit_cube_compat():
    lb = np.array([500.0, 700.0, 900.0])
    psd = orc.simulate_psd([0.7, 0.3], (100, 10000), 1.0, 25.0)
    cube = ref_api.psf_muse(psd[0], lb)
    final = ref_api.convolve_final_psf(lb, 1.0, 0.7, 25.0, cube)
    want = orc.convolve_tt_and_instrument(
        orc.psf_cube_from_psd(psd[0], lb), lb, 1.0, 0.7, 25.0)
    assert np.abs(final - want).max() < 1e-12

    tbl = ref_api.fit_psf_cube(lb, final)
    assert_allclose(tbl["fwhm"][:, 0], [0.847, 0.730, 0.621], atol=1e-3)
    assert_allclose(tbl["center"], 20, atol=1e-4)


def test_psd_fit_and_var():
    r0 = 0.1
    out = ref_api.psd_fit(256, 16.0, r0, 25.0, 1.5)
    # FFT-ordered: DC (inside fc) is zero, Nyquist corner region nonzero
    assert out[0, 0] == 0.0
    assert out[128, 128] > 0.0
    v = ref_api.calc_var_from_psd(out, 1.0 / 16, 8.0)
    assert v > 0


def test_shim_is_float64_without_global_x64(monkeypatch):
    """The drop-in shim must deliver reference (float64) precision even
    when the caller never enabled jax_enable_x64 globally: the compat
    layer scopes x64 locally on CPU backends."""
    import subprocess, sys, os
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, sys\n"
        "sys.path.insert(0, %r)\n"
        "import muse_psfr\n"
        "psd = muse_psfr.simul_psd_wfm([0.7,0.3],(100,10000),1.0,25.0,"
        "verbose=False)\n"
        "from benchmarks import oracle_numpy as orc\n"
        "ref = orc.simulate_psd([0.7,0.3],(100,10000),1.0,25.0)\n"
        "rel = np.abs(psd-ref).max()/ref.max()\n"
        "assert rel < 1e-12, rel\n"
        "assert not jax.config.jax_enable_x64\n"  # no global leakage
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
