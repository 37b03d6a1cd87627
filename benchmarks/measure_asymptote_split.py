"""Host-side feasibility check: asymptote-split windowing of FULL rows.

Idea: the damping factor ``exp(alpha*D(r))`` tends to the constant
``A = exp(alpha*D_inf)`` as the phase correlation ``C(r)`` decays
(``D(r) = D_inf - 2 C(r)``).  Writing ``exp(alpha*D) = A +
A*(exp(2*alpha*C) - 1)`` makes the zoom-DFT of the first term a
row-independent per-lambda precompute, and the second term windowable
by the magnitude of ``A*(exp(2*alpha*C)-1)`` instead of the full OTF
magnitude — which could admit a window even for the good-seeing
high-GL rows whose OTF keeps an O(1e-3) coherent core across the grid.

Feasibility hinges on how fast ``C`` decays: GLAO residuals contain
uncorrected free-atmosphere von Karman layers whose correlation decays
on the outer scale L0 (~25 m), which may exceed the grid half-width.
This script measures, for the bench night's NON-windowable rows, a
LOWER BOUND on the deviation term at each candidate sub-window radius:
``dev(S) = |exp(alpha*D(S-1)) - exp(alpha*D(edge))|`` (using the edge
value as a stand-in for the true asymptote underestimates the
deviation).  If even this lower bound is orders above the 1e-12
admission threshold, the decomposition cannot window these rows and
the idea is closed.

Usage: python benchmarks/measure_asymptote_split.py [rows] [npsflin]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from bench import build_rows
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import (_ring_damping,
                                              rows_windowable)

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    npsflin = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cfg = GalacsiConfig()
    seeing, GL, L0, mask = build_rows(rows)
    lb_max = 930.0
    # the rows the current (OTF-magnitude) criterion cannot window at
    # the largest production bucket
    win = rows_windowable(seeing, GL, L0, mask, lb_max, cfg, 256,
                          npsflin=npsflin)
    from muse_psfr_tpu.psd.model import effective_wind_speed
    h_t = (100.0, 10000.0)
    wind = float(effective_wind_speed(h_t, cfg))
    idx, d_tot, r_of_pt = _ring_damping(
        np.asarray(seeing, np.float64), np.asarray(GL, np.float64),
        np.asarray(L0, np.float64), np.atleast_2d(np.asarray(mask, np.float64)),
        cfg, h_t, wind, npsflin)
    full = ~win[idx]
    d_full = d_tot[full]                     # (Rf, ndir, npts)
    alpha = -0.5 * (2.0 * np.pi / lb_max) ** 2
    # edge value as asymptote stand-in (underestimates the deviation)
    edge = r_of_pt.max()
    d_edge = d_full[:, :, r_of_pt == edge].min(axis=2)   # (Rf, ndir)
    out = {"rows": rows, "npsflin": npsflin,
           "full_rows": int(full.sum()), "of_valid": int(full.size)}
    for S in (256, 384, 512):
        sel = r_of_pt >= S - 1
        ds = d_full[:, :, sel]
        dev = np.abs(np.exp(alpha * ds)
                     - np.exp(alpha * d_edge)[:, :, None])
        # worst deviation past the candidate boundary, per row
        per_row = dev.max(axis=(1, 2))
        out[f"S{S}"] = {
            "dev_lower_bound_median": float(np.median(per_row)),
            "dev_lower_bound_min": float(per_row.min()),
            "admitted_at_1e-12": int((per_row <= 1e-12).sum()),
            "admitted_at_1e-9": int((per_row <= 1e-9).sum()),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
