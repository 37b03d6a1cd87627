"""Alternating A/B of the widened dphi-split certification range.

The 3-axis condition sweep includes low-L0 grid points; under the
former defaults (degree 3, l0_min 5 m) every row with L0 < 5 spilled
into the exact-transform executable (full per-row transform of the
fitting PSD, no OTF-support bucketing), while the widened certification
(degree 5, l0_min 2.5 m — error 8.9e-9 vs the 1e-7 gate at fc=1.5)
keeps them on the precomputed split path at the cost of two extra
basis-plane fmas per row.  This measures the night-level effect on the
EXACT grid the old defaults penalised: 16x16 (seeing, GL) x
[3.5, 4.5, 8, 11, 14, 18, 23, 29] m — 512 of 2048 points below 5 m.

Both variants are warmed (each config set is its own jit static key,
so the old variant compiles the exact-transform executable too), then
timed alternating in one process.

Usage: python benchmarks/measure_split_range.py [reps] [chunk]
Defaults: 6 reps, chunk 64.  Writes measure_split_range.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.api import condition_sweep

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    sv = np.linspace(0.6, 1.6, 16)
    gv = np.linspace(0.3, 0.9, 16)
    lv = np.array([3.5, 4.5, 8.0, 11.0, 14.0, 18.0, 23.0, 29.0])
    lb = np.linspace(490, 930, 35)

    new = GalacsiConfig()               # degree 5, l0_min 2.5
    old = new.with_(dphi_split_degree=3, dphi_split_l0_min=5.0)
    variants = {"new_range": new, "old_range": old}

    def run(cfg):
        t0 = time.perf_counter()
        condition_sweep(sv, gv, lv, lbda=lb, cfg=cfg, chunk=chunk)
        return time.perf_counter() - t0

    for name, cfg in variants.items():
        t = run(cfg)                    # warm-up incl. compiles
        print(f"warm {name}: {t:.3f} s", flush=True)

    times = {k: [] for k in variants}
    for r in range(reps):
        for name, cfg in variants.items():
            t = run(cfg)
            times[name].append(t)
            print(f"rep {r} {name}: {t:.3f} s "
                  f"({2048 / t:.1f} points/s)", flush=True)

    n_pts = sv.size * gv.size * lv.size
    summary = {}
    for name, ts in times.items():
        summary[name] = {"times_s": ts, "best_s": min(ts),
                         "median_s": float(np.median(ts)),
                         "best_points_per_s": n_pts / min(ts)}
    pairs = [times["old_range"][i] / times["new_range"][i]
             for i in range(reps)]
    summary["paired_ratio_old_over_new"] = {
        "pairs": pairs, "median": float(np.median(pairs)),
        "n_above_1": int(sum(p > 1 for p in pairs)), "reps": reps}
    print(json.dumps(summary, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "measure_split_range.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
