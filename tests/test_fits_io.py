"""FITS codec and table round-trip tests."""

import io

import numpy as np
from numpy.testing import assert_allclose, assert_array_equal

from muse_psfr_tpu.io.fits import (HDUList, PrimaryHDU, ImageHDU,
                                   BinTableHDU, Header, fits_open,
                                   fits_getheader)
from muse_psfr_tpu.io.table import FitTable
from muse_psfr_tpu.io.sparta import create_sparta_table, read_sparta_values


def _roundtrip(hdul):
    buf = io.BytesIO()
    hdul.writeto(buf)
    buf.seek(0)
    return fits_open(buf)


def test_header_values_roundtrip():
    h = Header()
    h["SEEING"] = 1.25
    h["GL"] = 0.7
    h["NVAL"] = 42
    h["FLAG"] = True
    h["NAME"] = "it's a test"
    hdul = _roundtrip(HDUList([PrimaryHDU(header=h)]))
    hh = hdul[0].header
    assert hh["SEEING"] == 1.25
    assert hh["GL"] == 0.7
    assert hh["NVAL"] == 42
    assert hh["FLAG"] is True
    assert hh["NAME"] == "it's a test"


def test_image_hdu_roundtrip():
    rng = np.random.default_rng(0)
    cube = rng.normal(size=(3, 7, 5))
    hdul = _roundtrip(HDUList([PrimaryHDU(),
                               ImageHDU(data=cube, name="PSF_MEAN")]))
    assert hdul["PSF_MEAN"].data.shape == (3, 7, 5)
    assert_allclose(hdul["PSF_MEAN"].data, cube)


def test_bintable_vector_columns_roundtrip():
    t = FitTable()
    t["lbda"] = np.array([500.0, 700.0])
    t["fwhm"] = np.array([[4.1, 4.1], [3.2, 3.2]])
    t["row_idx"] = np.array([1, 2], dtype=np.int64)
    t.meta["SEEING"] = 1.0
    hdul = _roundtrip(HDUList([PrimaryHDU(), t.to_hdu("FIT_ROWS")]))
    t2 = FitTable.from_hdu(hdul["FIT_ROWS"])
    assert_allclose(t2["lbda"], t["lbda"])
    assert_allclose(t2["fwhm"], t["fwhm"])
    assert_array_equal(t2["row_idx"], t["row_idx"])
    assert t2.meta["SEEING"] == 1.0


def test_reads_idl_written_reference_data():
    """The codec must read the IDL-written coeffL0 table from 2018."""
    hdul = fits_open("/root/reference/muse_psfr/coeffL0.fits")
    data = hdul[0].data
    assert data.shape == (2, 200)
    assert_allclose(data[0][:3], [1, 2, 3])
    assert abs(data[1][-1] - 1.0423263) < 1e-6


def test_sparta_table_and_reader(tmp_path):
    path = str(tmp_path / "sparta.fits")
    create_sparta_table(nlines=3, seeing=0.9, GL=0.6, L0=22, bad_l0=True,
                        outfile=path)
    values, hdul = read_sparta_values(path)
    assert values.shape == (3, 4, 3)
    assert_allclose(values[:, 0, :], [[0.9, 0.6, 22]] * 3)
    assert_allclose(values[:, 3, 2], 150)
    # header access used by the CLI raw path
    hdr = fits_getheader(path)
    assert hdr.get("HIERARCH ESO OBS NAME") is None


def test_hierarch_header_roundtrip():
    h = Header()
    h["HIERARCH ESO OBS NAME".replace("HIERARCH ", "")] = "obs1"
    h["ESO TEL AIRM START"] = 1.13
    hdul = _roundtrip(HDUList([PrimaryHDU(header=h)]))
    hh = hdul[0].header
    assert hh.get("ESO OBS NAME") == "obs1"
    assert hh.get("ESO TEL AIRM START") == 1.13
