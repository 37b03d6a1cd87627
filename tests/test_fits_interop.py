"""Cross-library FITS interop (VERDICT r4 item 2/8).

Two directions:

* third-party -> codec: ``tests/data/thirdparty_stsci_tables.fits`` is
  a REAL foreign-written FITS binary table (ORIGIN
  'STScI-STSDAS/TABLES', 1999; vendored from numpy's test suite, BSD
  license, where np.rec.fromfile pins its payload).  The codec must
  read it and reproduce the exact values numpy's own test asserts.

* codec <-> astropy: round-trip tests that run wherever astropy is
  installed (the optional ``interop`` CI job; skipped locally when
  astropy is absent).  A codec-written full result file must be
  readable by astropy with the same HDU names/columns/values, and an
  astropy-written SPARTA table must drive the pipeline.
"""

import os

import numpy as np
import pytest

from muse_psfr_tpu.io.fits import fits_open

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def test_codec_reads_third_party_written_table():
    hdul = fits_open(os.path.join(DATA, "thirdparty_stsci_tables.fits"))
    assert hdul[0].header["ORIGIN"].startswith("STScI")
    d = hdul[1].data
    # ground truth from numpy/_core/tests/test_records.py (rec.fromfile
    # of the same bytes: formats f8,i4,S5, big-endian, 3 rows)
    assert d.shape == (3,)
    np.testing.assert_allclose(d["a"], [5.1, 5.2, 5.3])
    np.testing.assert_array_equal(d["b"], [61, 62, 63])
    assert [s.strip() for s in d["c"].astype("U5").tolist()] == \
        ["abcde", "fghij", "kl"]


@pytest.fixture()
def small_result_file(tmp_path):
    """A FULL result file (PRIMARY/SPARTA_ATM_DATA/FIT_ROWS/FIT_MEAN/
    PSF_MEAN) computed at a small grid so the fixture stays fast."""
    from muse_psfr_tpu.api import compute_psf_from_sparta
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.io.sparta import create_sparta_table
    cfg = GalacsiConfig(dim=512, dim_pup=16, dimpsf=12, lambda_chunk=2)
    sp = tmp_path / "sparta.fits"
    create_sparta_table(nlines=2, outfile=str(sp))
    res = compute_psf_from_sparta(str(sp), nl=3, cfg=cfg, chunk=2,
                                  verbose=False)
    out = tmp_path / "result.fits"
    res.writeto(str(out), overwrite=True)
    return str(out)


def test_astropy_reads_codec_written_result(small_result_file):
    fits = pytest.importorskip("astropy.io.fits")
    with fits.open(small_result_file) as h:
        assert [x.name for x in h] == ["PRIMARY", "SPARTA_ATM_DATA",
                                       "FIT_ROWS", "FIT_MEAN", "PSF_MEAN"]
        ours = fits_open(small_result_file)
        for name in ("FIT_ROWS", "FIT_MEAN"):
            a, b = h[name].data, ours[name].data
            assert a.dtype.names == b.dtype.names
            for col in a.dtype.names:
                np.testing.assert_array_equal(a[col], b[col])
        np.testing.assert_array_equal(h["PSF_MEAN"].data,
                                      ours["PSF_MEAN"].data)
        # header keyword contract (median SEEING/GL/L0 on FIT_MEAN)
        for key in ("SEEING", "GL", "L0"):
            assert key in h["FIT_MEAN"].header


def test_codec_reads_astropy_written_sparta(tmp_path):
    fits = pytest.importorskip("astropy.io.fits")
    from muse_psfr_tpu.io.sparta import read_sparta_values
    n = 3
    cols = []
    rng = np.random.default_rng(0)
    for k in range(1, 5):
        cols += [
            fits.Column(name=f"LGS{k}_SEEING", format="E",
                        array=rng.uniform(0.8, 1.2, n).astype("f4")),
            fits.Column(name=f"LGS{k}_TUR_GND", format="E",
                        array=rng.uniform(0.4, 0.8, n).astype("f4")),
            fits.Column(name=f"LGS{k}_L0", format="E",
                        array=rng.uniform(10, 28, n).astype("f4")),
        ]
    hdu = fits.BinTableHDU.from_columns(cols, name="SPARTA_ATM_DATA")
    path = tmp_path / "astropy_sparta.fits"
    fits.HDUList([fits.PrimaryHDU(), hdu]).writeto(str(path))
    values, hdul = read_sparta_values(str(path), "SPARTA_ATM_DATA")
    assert values.shape == (n, 4, 3)
    got = hdul["SPARTA_ATM_DATA"].data
    with fits.open(str(path)) as ref:
        for col in ref["SPARTA_ATM_DATA"].data.dtype.names:
            np.testing.assert_allclose(got[col],
                                       ref["SPARTA_ATM_DATA"].data[col])
