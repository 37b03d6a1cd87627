"""Public API: PSF reconstruction from atmospheric telemetry.

Drop-in equivalents of the reference package's public functions
(``compute_psf``, ``compute_psf_from_sparta``; reference psfrec.py:933-1120)
with identical FITS output layout (PRIMARY / SPARTA_ATM_DATA copy /
FIT_ROWS / FIT_MEAN / PSF_MEAN), identical telemetry-validation semantics
and log-message contract, and batched TPU execution replacing the joblib
process pool.
"""

import numpy as np

from .config import GalacsiConfig, DEFAULT_CONFIG
from .fit.moffat_fit import fit_moffat_cube
from .fit.polynom import fit_psf_with_polynom, norm_lbda  # noqa: F401
from .io.fits import HDUList, PrimaryHDU, ImageHDU, fits_open
from .io.sparta import create_sparta_table, read_sparta_values  # noqa: F401
from .io.table import FitTable
from .parallel.batch import reconstruct_batch, process_batch
from .utils.log import get_logger

logger = get_logger("api")

MIN_L0 = 8    # minimum valid outer scale [m] (psfrec.py:30)
MAX_L0 = 30   # maximum valid outer scale [m] (psfrec.py:31)

#: column order of the per-wavelength Moffat fit tables
_FIT_COLUMNS = ("center", "flux", "fwhm", "n", "peak", "err_center",
                "err_flux", "err_fwhm", "err_n", "err_peak")


def fit_table_from_arrays(lbda, fit, pixscale=0.2):
    """Moffat-fit arrays (leading axis = wavelength) -> FitTable.

    FWHM converted px -> arcsec (reference psfrec.py:868-869).
    """
    t = FitTable()
    t["lbda"] = np.asarray(lbda, float)
    for k in _FIT_COLUMNS:
        v = np.asarray(fit[k], float)
        if k in ("fwhm", "err_fwhm"):
            v = v * pixscale
        t[k] = v
    return t


def compute_psf(lbda, seeing, GL, L0, npsflin=1, h=(100, 10000),
                three_lgs_mode=False, verbose=True, cfg=DEFAULT_CONFIG):
    """Reconstruct a PSF cube from one (seeing, GL, L0) condition.

    Returns ``(FitTable, psf ndarray (nl, dimpsf, dimpsf))`` — same contract
    as the reference ``compute_psf`` (psfrec.py:933-978).
    """
    if verbose:
        logger.info("Compute PSF with seeing=%.2f GL=%.2f L0=%.2f",
                    seeing, GL, L0)
        if three_lgs_mode:
            logger.info("Using three lasers mode")
    lbda = np.atleast_1d(np.asarray(lbda, float))
    gs_mask = np.array([[1.0, 1.0, 1.0, 0.0 if three_lgs_mode else 1.0]])
    psf = reconstruct_batch([seeing], [GL], [L0], gs_mask, lbda, h=h,
                            npsflin=npsflin, cfg=cfg)[0]
    fit = fit_moffat_cube(psf, dtype=cfg.fit_dtype)
    fit = {k: np.asarray(v) for k, v in fit.items()}
    res = fit_table_from_arrays(lbda, fit, cfg.pixscale)
    res.meta.update({"SEEING": seeing, "GL": GL, "L0": L0})
    res["SEEING"] = seeing
    res["GL"] = GL
    res["L0"] = L0
    return res, psf


def compute_psf_from_sparta(filename, extname="SPARTA_ATM_DATA", npsflin=1,
                            lmin=490, lmax=930, nl=35, lbda=None,
                            h=(100, 10000), n_jobs=-1, plot=False,
                            mean_of_lgs=True, verbose=True,
                            cfg=DEFAULT_CONFIG):
    """Reconstruct PSFs for every row of a SPARTA telemetry table.

    Same contract as the reference (psfrec.py:981-1120): returns an
    ``HDUList`` [PRIMARY, SPARTA_ATM_DATA (copy), FIT_ROWS, FIT_MEAN,
    PSF_MEAN], or ``None`` if no row has valid telemetry.  ``n_jobs`` is
    accepted for API compatibility; parallelism is the on-device batch.
    """
    values, hdul = read_sparta_values(filename, extname)
    out = HDUList([PrimaryHDU(), hdul[extname].copy()])

    nrows = values.shape[0]
    if nrows == 1:
        n_jobs = 1
    if lbda is None:
        lbda = np.linspace(lmin, lmax, nl)
    lbda = np.asarray(lbda, float)

    if verbose:
        logger.info("Processing SPARTA table with %d values, njobs=%d ...",
                    nrows, n_jobs)

    # --- telemetry validation / work-item assembly (psfrec.py:1041-1076) --
    items = []           # (seeing, GL, L0, three_lgs_mode, lgs_idx)
    for irow in range(1, nrows + 1):
        vals = values[irow - 1]                       # (4 lasers, 3)
        valid = ((vals[:, 1] > 0) &                   # GL > 0
                 (vals[:, 2] < MAX_L0) &
                 (vals[:, 2] > MIN_L0))
        nb_gs = int(valid.sum())
        three = nb_gs < 4
        if nb_gs == 0:
            if verbose:
                logger.info("%d/%d : No valid values, skipping this row",
                            irow, nrows)
                logger.debug("Values: %s", vals.tolist())
            continue
        elif nb_gs < 4:
            if verbose:
                logger.info("%d/%d : Using only %d values out of 4 after "
                            "outliers rejection", irow, nrows, nb_gs)
        if mean_of_lgs:
            seeing, GL, L0 = vals[valid].mean(axis=0)
            items.append((seeing, GL, L0, three, -1))
        else:
            for i in np.where(valid)[0]:
                seeing, GL, L0 = vals[i]
                items.append((seeing, GL, L0, three, i + 1))

    if not items:
        logger.warning("No valid values")
        return None

    # per-item compute log lines, in order (parity with the reference's
    # sequential worker logs)
    if verbose:
        for seeing, GL, L0, three, _ in items:
            logger.info("Compute PSF with seeing=%.2f GL=%.2f L0=%.2f",
                        seeing, GL, L0)
            if three:
                logger.info("Using three lasers mode")

    seeing = np.array([it[0] for it in items])
    GL = np.array([it[1] for it in items])
    L0 = np.array([it[2] for it in items])
    gs_mask = np.array([[1.0, 1.0, 1.0, 0.0 if it[3] else 1.0]
                        for it in items])
    lgs_idx = np.array([it[4] for it in items])

    # --- batched reconstruction + batched fit (device resident; only the
    # packed fit parameters and the mean PSF cross the device->host link) --
    from .fit.moffat_fit import unpack_fit
    fit_d, psf_mean_d, fit_mean_d = process_batch(
        seeing, GL, L0, gs_mask, lbda, h=h, npsflin=npsflin, cfg=cfg)
    fit = unpack_fit(fit_d)

    tables = []
    for b in range(len(items)):
        t = fit_table_from_arrays(lbda, {k: v[b] for k, v in fit.items()},
                                  cfg.pixscale)
        t["SEEING"] = seeing[b]
        t["GL"] = GL[b]
        t["L0"] = L0[b]
        t["row_idx"] = b + 1
        t["lgs_idx"] = lgs_idx[b]
        tables.append(t)

    big = FitTable.vstack(tables)
    hdu = big.to_hdu(name="FIT_ROWS")
    out.append(hdu)

    # --- mean PSF over work items + refit (psfrec.py:1103-1113) -----------
    psf_mean = np.asarray(psf_mean_d)
    fit_m = unpack_fit(fit_mean_d)
    res = fit_table_from_arrays(lbda, fit_m, cfg.pixscale)
    med = np.median(np.stack([seeing, GL, L0], axis=1), axis=0)
    res.meta.update({"SEEING": med[0], "GL": med[1], "L0": med[2]})
    out.append(res.to_hdu(name="FIT_MEAN"))
    out.append(ImageHDU(data=psf_mean.astype(np.float64), name="PSF_MEAN"))

    if plot:
        import matplotlib.pyplot as plt
        from .plotting import plot_psf
        plot_psf(out, npsflin=npsflin)
        plt.show()

    return out
