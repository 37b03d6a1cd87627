"""float64-oracle certification of the asymptote-split OTF windowing.

For the bench night's NON-windowable ("full bucket") rows the damping
factor ``exp(-Dphi/2)`` is nearly constant beyond a few hundred px
(spread ~1e-8, see measure_asymptote_split.py): the residual-phase
correlation has decayed, leaving the coherent core ``A * dl_otf`` with
``A = exp(-convnm^2 * bg00)`` — and ``bg00`` is the plain PSD integral,
available without evaluating any grid tail.

Asymptote split: compute the OTF exactly inside the centred inf-norm
window ``S`` and replace it by ``A * dl_otf`` outside.  Linearity of
the PSF transform then lets the implementation reuse the WINDOWED
executable plus a row-independent per-lambda correction vector
``A * (Z_full[dl] - Z_win[dl])`` — no new kernel.  This script
certifies the replacement end-to-end in float64: exact reference-path
PSF (oracle) vs the split PSF through the same psf_muse pipeline
(per-lambda crop, direction average, renorm, 40x40 regrid), reporting
the worst abs/rms error over wavelengths per row.  Budget: 1e-5 abs on
the normalized PSF (BASELINE.md); the pipeline's own f32 noise is
~3e-8 rms.

Usage: python benchmarks/measure_asym_oracle.py [n_rows] [npsflin] [S ...]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_numpy import (DPUP, OCC, fftshift, ifft2, fft2, pupil,
                          simulate_psd, bilinear_regrid)


def psf_planes(psd_dirs, lbda_nm, S=None, dimpsf=40, pixscale=0.2):
    """psf_muse pipeline (oracle), optionally asymptote-split at S."""
    ndir, dim = psd_dirs.shape[0], psd_dirs.shape[1]
    pup = pupil(dim / 4, dim // 2, oc=OCC)
    npup = pup.shape[0]
    L = DPUP * (dim / npup)
    tab = np.zeros((dim, dim), dtype=complex)
    tab[:npup, :npup] = pup
    dl_otf = fftshift(np.abs(fft2(np.abs(ifft2(tab)) ** 2)) / pup.sum())
    c = dim // 2
    if S is not None:
        yy, xx = np.meshgrid(np.arange(dim) - c, np.arange(dim) - c,
                             indexing="ij")
        inside = np.maximum(np.abs(yy), np.abs(xx)) < S
    npixc = (np.round((dimpsf * pixscale * 2 * DPUP * 4.85 * 1000 /
                       np.asarray(lbda_nm)) / 2) * 2).astype(int)
    out = np.empty((len(lbda_nm), dimpsf, dimpsf))
    for i, lb in enumerate(lbda_nm):
        convnm = 2 * np.pi / lb
        acc = np.zeros((npixc[i], npixc[i]))
        for j in range(ndir):
            bg = ifft2(fftshift(psd_dirs[j] * convnm ** 2)) * (
                psd_dirs[j].size / L ** 2)
            dphi = fftshift(2 * (bg[0, 0].real - bg.real))
            damp = np.exp(-dphi / 2)
            if S is not None:
                A = np.exp(-convnm ** 2 *
                           (psd_dirs[j].sum() / L ** 2))
                damp = np.where(inside, damp, A)
            sys_otf = fftshift(damp * dl_otf)
            p = np.real(fftshift(ifft2(sys_otf)))
            p /= p.sum()
            acc += p[c - npixc[i] // 2:c + npixc[i] // 2,
                     c - npixc[i] // 2:c + npixc[i] // 2]
        acc /= ndir
        acc /= acc.sum()
        np.maximum(acc, 0, out=acc)
        out[i] = bilinear_regrid(acc, npixc[i] / dimpsf, dimpsf)
    return out / out.sum(axis=(1, 2))[:, None, None]


def main():
    from bench import build_rows
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import rows_windowable

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    npsflin = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    S_list = [int(s) for s in sys.argv[3:]] or [256, 384]
    cfg = GalacsiConfig()
    seeing, GL, L0, mask = build_rows(400)
    win = rows_windowable(seeing, GL, L0, mask, 930.0, cfg, 256,
                          npsflin=npsflin)
    full_idx = np.nonzero(~win)[0]
    # worst cases first: best seeing (largest coherent core / biggest A)
    order = np.argsort(seeing[full_idx])
    full_idx = full_idx[order][:n_rows]
    lbda = np.linspace(490, 930, 35)
    report = []
    for ri in full_idx:
        psd = simulate_psd([GL[ri], 1 - GL[ri]], [100, 10000],
                           seeing[ri], L0[ri], npsflin=npsflin)
        psd = np.asarray(psd)
        exact = psf_planes(psd, lbda)
        row = {"row": int(ri), "seeing": round(float(seeing[ri]), 3),
               "GL": round(float(GL[ri]), 3),
               "L0": round(float(L0[ri]), 2)}
        for S in S_list:
            approx = psf_planes(psd, lbda, S=S)
            err = np.abs(approx - exact)
            row[f"S{S}"] = {
                "max_abs": float(err.max()),
                "worst_lambda_nm": float(lbda[int(err.max(axis=(1, 2)).argmax())]),
                "rms": float(np.sqrt((err ** 2).mean()))}
        report.append(row)
        print(json.dumps(row), flush=True)
    for S in S_list:
        worst = max(r[f"S{S}"]["max_abs"] for r in report)
        print(json.dumps({"summary_S": S, "worst_max_abs": worst,
                          "budget": 1e-5, "rows": len(report)}))


if __name__ == "__main__":
    main()
