"""API edge cases: row skipping/bookkeeping, explicit wavelength arrays,
input forms, and sweep FITS output."""

import io
import os

import numpy as np
from numpy.testing import assert_allclose

from muse_psfr_tpu import (compute_psf_from_sparta, create_sparta_table,
                           fits_open, FitTable, HDUList, TINY_CONFIG)
from muse_psfr_tpu.api import condition_sweep, save_sweep


def test_mixed_valid_invalid_rows(tmp_path, caplog):
    """Middle row fully invalid: it is skipped, and row_idx counts the
    *work items*, matching the reference bookkeeping (psfrec.py:1090)."""
    hdu = create_sparta_table(nlines=3)
    hdu.data["LGS1_L0"][1] = 1000.0
    hdu.data["LGS2_L0"][1] = 1000.0
    hdu.data["LGS3_L0"][1] = 1000.0
    hdu.data["LGS4_L0"][1] = 1000.0
    res = compute_psf_from_sparta(HDUList([hdu]), lmin=600, lmax=900, nl=2)
    fit = FitTable.from_hdu(res["FIT_ROWS"])
    assert sorted(set(fit["row_idx"])) == [1, 2]
    assert any("2/3 : No valid values, skipping this row" == r.message
               for r in caplog.records)


def test_explicit_lbda_array():
    hdul = HDUList([create_sparta_table()])
    res = compute_psf_from_sparta(hdul, lbda=np.array([600.0, 800.0]))
    fit = FitTable.from_hdu(res["FIT_ROWS"])
    assert_allclose(fit["lbda"], [600.0, 800.0])
    assert res["PSF_MEAN"].data.shape[0] == 2


def test_bytesio_input_roundtrip():
    buf = io.BytesIO()
    create_sparta_table(outfile=buf)
    buf.seek(0)
    res = compute_psf_from_sparta(buf, lmin=700, lmax=900, nl=2)
    assert [h.name for h in res] == ["PRIMARY", "SPARTA_ATM_DATA",
                                     "FIT_ROWS", "FIT_MEAN", "PSF_MEAN"]


def test_save_sweep_roundtrip(tmp_path):
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    res = condition_sweep([0.8, 1.2], [0.7], [25.0], lbda=[700.0, 900.0],
                          cfg=cfg)
    path = str(tmp_path / "sweep.fits")
    save_sweep(res, path)
    back = fits_open(path)
    assert_allclose(back["FWHM"].data, res["fwhm"])
    assert_allclose(back["BETA"].data, res["beta"])
    grid = back["GRID"].data
    assert_allclose(grid["SEEING"][0][:2], [0.8, 1.2])


def test_sweep_checkpoint(tmp_path):
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ckpt = str(tmp_path / "sweep_ckpt.npy")
    res = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                          cfg=cfg, chunk=2, checkpoint=ckpt)
    import numpy as _np
    packed = _np.load(ckpt)
    assert packed.shape[0] == 3            # all chunks checkpointed
    assert _np.allclose(packed[..., 10].reshape(res["beta"].shape),
                        res["beta"])


def test_sweep_resume_recomputes_only_missing_rows(tmp_path, monkeypatch,
                                                   caplog):
    """resume=True must load a compatible checkpoint and recompute ONLY
    the grid points still NaN there; an incompatible checkpoint is
    ignored with a warning."""
    import logging
    import muse_psfr_tpu.api as api
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ckpt = str(tmp_path / "sweep_ckpt.npy")
    full = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                           cfg=cfg, chunk=2, checkpoint=ckpt)

    # emulate an interrupted run: grid point 1 never completed
    import json
    arr = np.load(ckpt)
    arr[1] = np.nan
    np.save(ckpt, arr)
    side = ckpt + ".meta.json"
    m = json.load(open(side))
    m["done"] = [0, 2]
    json.dump(m, open(side, "w"))

    seen = {}
    real = api.process_batch

    def spy(seeing, *a, **k):
        seen["B"] = np.atleast_1d(np.asarray(seeing)).shape[0]
        return real(seeing, *a, **k)

    monkeypatch.setattr(api, "process_batch", spy)
    res = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                          cfg=cfg, chunk=2, checkpoint=ckpt, resume=True)
    assert seen["B"] == 1                  # only the missing point
    # cross-executable LM accept/reject paths differ at ~1e-9
    assert_allclose(res["beta"], full["beta"], rtol=0, atol=1e-6)
    assert_allclose(res["fwhm"], full["fwhm"], rtol=0, atol=1e-6)
    assert not np.isnan(np.load(ckpt)).any()   # checkpoint completed
    assert json.load(open(side))["done"] == [0, 1, 2]

    # checkpoint from a sweep over DIFFERENT conditions (same shape):
    # the sidecar mismatch must prevent silent reuse
    seen.clear()
    with caplog.at_level(logging.WARNING, logger="muse_psfr.api"):
        condition_sweep([0.8, 1.0, 1.2], [0.7], [20.0], lbda=[800.0],
                        cfg=cfg, chunk=2, checkpoint=str(tmp_path / "x.npy"))
        import shutil
        shutil.copy(str(tmp_path / "x.npy"), ckpt)
        # keep OUR sidecar: content mismatch (L0 differs) is in x's meta
        shutil.copy(str(tmp_path / "x.npy") + ".meta.json", side)
        res_m = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0],
                                lbda=[800.0], cfg=cfg, chunk=2,
                                checkpoint=ckpt, resume=True)
    assert seen["B"] == 3                  # full recompute
    assert any("different parameters" in r.message for r in caplog.records)
    assert_allclose(res_m["beta"], full["beta"], rtol=0, atol=1e-6)

    # missing sidecar -> NaN-based fallback with a warning
    import os
    os.remove(side)
    seen.clear()
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="muse_psfr.api"):
        condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                        cfg=cfg, chunk=2, checkpoint=ckpt, resume=True)
    assert any("no provenance sidecar" in r.message
               for r in caplog.records)

    # incompatible checkpoint (wrong packed width / ndim) -> warn +
    # recompute all, never crash
    np.save(ckpt, arr[..., :5])
    seen.clear()
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="muse_psfr.api"):
        res2 = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0],
                               lbda=[800.0], cfg=cfg, chunk=2,
                               checkpoint=ckpt, resume=True)
    assert seen["B"] == 3
    assert any("incompatible" in r.message for r in caplog.records)
    assert_allclose(res2["beta"], full["beta"], rtol=0, atol=1e-6)
    np.save(ckpt, np.zeros(3))             # 1-D file: must not IndexError
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="muse_psfr.api"):
        condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                        cfg=cfg, chunk=2, checkpoint=ckpt, resume=True)
    assert any("incompatible" in r.message for r in caplog.records)


def test_scalar_inputs_accepted():
    """Scalar telemetry AND a scalar wavelength must work: lbda used to
    reach the pipeline as a 0-d device array and crash with an obscure
    IndexError deep in psf_cube_from_base."""
    from muse_psfr_tpu.parallel.batch import reconstruct_batch
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    out = reconstruct_batch(1.0, 0.7, 25.0, [[1, 1, 1, 1]], 650.0, cfg=cfg)
    assert out.shape == (1, 1, cfg.dimpsf, cfg.dimpsf)
    assert np.isfinite(out).all()


def test_empty_batch_raises_clearly():
    """B=0 must fail with a clear validation error, not the obscure
    'Need at least one array to stack' from the mean reduction (and
    reconstruct_batch must not silently return None)."""
    import pytest
    from muse_psfr_tpu.parallel.batch import process_batch, \
        reconstruct_batch
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    with pytest.raises(ValueError, match="empty batch"):
        process_batch(np.array([]), np.array([]), np.array([]),
                      np.zeros((0, 4)), [650.0], cfg=cfg)
    with pytest.raises(ValueError, match="empty batch"):
        reconstruct_batch(np.array([]), np.array([]), np.array([]),
                          np.zeros((0, 4)), [650.0], cfg=cfg)
    with pytest.raises(ValueError, match="empty wavelength"):
        process_batch([1.0], [0.7], [25.0], [[1, 1, 1, 1]],
                      np.array([]), cfg=cfg)


def test_extreme_conditions_do_not_poison_batch():
    """A garbage row in a batch must not affect the other rows."""
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    from muse_psfr_tpu import reconstruct_batch
    lbda = np.array([800.0])
    good = reconstruct_batch([1.0], [0.7], [25.0], np.ones((1, 4)), lbda,
                             cfg=cfg)
    mixed = reconstruct_batch([1.0, 3.5], [0.7, 0.999], [25.0, 9.1],
                              np.ones((2, 4)), lbda, cfg=cfg, chunk=2)
    assert_allclose(mixed[0], good[0], atol=1e-12)
    assert np.all(np.isfinite(mixed))


def test_too_blue_wavelength_raises():
    """A wavelength whose crop exceeds the PSD grid fails with a clear
    message (the reference fails there with an opaque shape error)."""
    import pytest
    from muse_psfr_tpu import reconstruct_batch, GalacsiConfig
    with pytest.raises(ValueError, match="crop"):
        reconstruct_batch([1.0], [0.7], [25.0], np.ones((1, 4)),
                          np.array([450.0]),
                          cfg=GalacsiConfig(dtype="float64"))


def test_crash_before_guard_resolution_never_marks_done(tmp_path,
                                                        monkeypatch):
    """A crash between an on_chunk delivery and the night's guard
    resolution must leave a checkpoint whose sidecar marks NOTHING
    done: on_chunk deliveries are provisional (the window guard is only
    known at the final pull), so resume must recompute them.  Also pins
    that the sidecar exists from the FIRST delivery — without it the
    NaN-based fallback would trust the provisional values."""
    import json
    import muse_psfr_tpu.api as api
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ckpt = str(tmp_path / "crash_ckpt.npy")
    side = ckpt + ".meta.json"

    real = api.process_batch

    class Boom(RuntimeError):
        pass

    def crash_after_first_chunk(*a, **k):
        inner = k.get("on_chunk")
        calls = []

        def wrapped(idx, packed):
            inner(idx, packed)
            calls.append(1)
            raise Boom()                     # process dies mid-night

        k["on_chunk"] = wrapped
        return real(*a, **k)

    monkeypatch.setattr(api, "process_batch", crash_after_first_chunk)
    import pytest
    with pytest.raises(Boom):
        condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                        cfg=cfg, chunk=2, checkpoint=ckpt)
    monkeypatch.setattr(api, "process_batch", real)

    # the crash left values but NO done rows — the delivered chunk's
    # guard was never resolved
    assert os.path.exists(ckpt) and os.path.exists(side)
    assert json.load(open(side))["done"] == []
    vals = np.load(ckpt)
    assert not np.isnan(vals).all()          # provisional values exist

    # resume recomputes EVERY grid point (nothing trusted)
    seen = {}

    def spy(seeing, *a, **k):
        seen["B"] = np.atleast_1d(np.asarray(seeing)).shape[0]
        return real(seeing, *a, **k)

    monkeypatch.setattr(api, "process_batch", spy)
    res = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                          cfg=cfg, chunk=2, checkpoint=ckpt, resume=True)
    assert seen["B"] == 3
    assert json.load(open(side))["done"] == [0, 1, 2]
    assert np.isfinite(res["beta"]).all()


def test_resume_after_crash_skips_guard_free_chunks(tmp_path, monkeypatch):
    """Guard-free chunks (no OTF-support window => the guard is
    structurally +inf) are FINAL at delivery: a crash later in the night
    must leave them marked done, so resume recomputes only the rest —
    not the whole sweep."""
    import json
    import muse_psfr_tpu.api as api
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ckpt = str(tmp_path / "eager_ckpt.npy")
    side = ckpt + ".meta.json"

    real = api.process_batch

    class Boom(RuntimeError):
        pass

    def crash_at_second_chunk(*a, **k):
        inner = k.get("on_chunk")
        calls = []

        def wrapped(idx, packed):
            if calls:
                raise Boom()          # dies before the 2nd delivery
            inner(idx, packed)
            calls.append(1)

        k["on_chunk"] = wrapped
        return real(*a, **k)

    monkeypatch.setattr(api, "process_batch", crash_at_second_chunk)
    import pytest
    with pytest.raises(Boom):
        condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                        cfg=cfg, chunk=2, checkpoint=ckpt)

    # the first (guard-free) chunk's rows were final'd at delivery
    assert json.load(open(side))["done"] == [0, 1]

    # resume recomputes ONLY the missing grid point
    seen = {}

    def spy(seeing, *a, **k):
        seen["B"] = np.atleast_1d(np.asarray(seeing)).shape[0]
        return real(seeing, *a, **k)

    monkeypatch.setattr(api, "process_batch", spy)
    res = condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                          cfg=cfg, chunk=2, checkpoint=ckpt, resume=True)
    assert seen["B"] == 1
    assert json.load(open(side))["done"] == [0, 1, 2]
    assert np.isfinite(res["beta"]).all()


def test_checkpoint_path_without_npy_suffix(tmp_path):
    """A suffix-less checkpoint path must still resume: np.save silently
    appends '.npy', so without normalisation the resume lookup misses
    the file it wrote and silently recomputes the full grid."""
    import json
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ck = str(tmp_path / "noext_ckpt")          # no .npy suffix
    condition_sweep([0.8, 1.0], [0.7], [25.0], lbda=[800.0],
                    cfg=cfg, chunk=2, checkpoint=ck)
    assert os.path.exists(ck + ".npy")
    assert json.load(open(ck + ".npy.meta.json"))["done"] == [0, 1]
    # resume with the same suffix-less path finds the checkpoint
    import muse_psfr_tpu.api as api
    seen = {}
    real = api.process_batch

    def spy(seeing, *a, **k):
        seen["called"] = True
        return real(seeing, *a, **k)

    import unittest.mock as mock
    with mock.patch.object(api, "process_batch", spy):
        res = condition_sweep([0.8, 1.0], [0.7], [25.0], lbda=[800.0],
                              cfg=cfg, chunk=2, checkpoint=ck, resume=True)
    assert "called" not in seen                # nothing left to compute
    assert np.isfinite(res["beta"]).all()


def test_sidecar_on_disk_before_first_npy_write(tmp_path, monkeypatch):
    """The provenance sidecar must hit the disk BEFORE the first .npy
    checkpoint write: a crash after a sidecar-less np.save would send
    resume down the NaN-based fallback, which trusts provisional
    (guard-unvalidated) values."""
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    ckpt = str(tmp_path / "order_ckpt.npy")
    side = ckpt + ".meta.json"
    orig_replace = os.replace
    sidecar_present = []

    def spy_replace(src, dst, *a, **k):
        # the checkpoint lands via the atomic tmp -> os.replace rename;
        # at that instant the sidecar must already exist on disk
        if str(dst) == ckpt:
            sidecar_present.append(os.path.exists(side))
        return orig_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", spy_replace)
    condition_sweep([0.8, 1.0, 1.2], [0.7], [25.0], lbda=[800.0],
                    cfg=cfg, chunk=2, checkpoint=ckpt)
    assert sidecar_present and all(sidecar_present)
