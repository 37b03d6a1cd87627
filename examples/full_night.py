"""Reconstruct a full night of SPARTA telemetry and write the results.

Usage: python examples/full_night.py [sparta.fits] [out.fits]
Without arguments a synthetic 100-row night is generated.
"""

import os
import sys
import time

import numpy as np

from muse_psfr_tpu import (compute_psf_from_sparta, create_sparta_table,
                           HDUList, FitTable, fit_psf_with_polynom)
from muse_psfr_tpu.config import DEFAULT_CONFIG, TINY_CONFIG

# MUSE_PSFR_TINY=1 runs the same code path on the tiny test grids (used
# by the example smoke test; also handy on CPU-only machines)
TINY = bool(os.environ.get("MUSE_PSFR_TINY"))
CFG = TINY_CONFIG if TINY else DEFAULT_CONFIG


def synthetic_night(nrows=4 if TINY else 100, seed=0):
    rng = np.random.default_rng(seed)
    hdu = create_sparta_table(nlines=nrows)
    for k in range(1, 5):
        hdu.data["LGS%d_SEEING" % k] = rng.uniform(0.6, 1.6, nrows)
        hdu.data["LGS%d_TUR_GND" % k] = rng.uniform(0.3, 0.9, nrows)
        hdu.data["LGS%d_L0" % k] = rng.uniform(9, 29, nrows)
    return HDUList([hdu])


def main():
    source = sys.argv[1] if len(sys.argv) > 1 else synthetic_night()
    outfile = sys.argv[2] if len(sys.argv) > 2 else "night_psf.fits"

    t0 = time.perf_counter()
    res = compute_psf_from_sparta(source, cfg=CFG, nl=9 if TINY else 35)
    print(f"reconstructed in {time.perf_counter() - t0:.2f}s")

    fit = FitTable.from_hdu(res["FIT_MEAN"])
    pol = fit_psf_with_polynom(fit["lbda"], fit["fwhm"][:, 0], fit["n"])
    print("FWHM(lambda) poly:", np.round(pol["fwhm_pol"], 4))
    print("beta(lambda) poly:", np.round(pol["beta_pol"], 4))
    res.writeto(outfile)
    print("wrote", outfile)


if __name__ == "__main__":
    main()
