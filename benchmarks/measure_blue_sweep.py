"""Condition-sweep A/B of the blue-segment OTF window split.

Same method as ``measure_blue_split.py`` but over ``condition_sweep``
grids (the run_all table's 32x32 and 16x16x8 rows): alternating reps in
one process — the blue and plain group configs are distinct jit keys so
both executable sets stay warm — toggled via the ``MUSE_PSFR_NO_BLUE``
kill switch, which `_blue_split_plan` reads at plan time.

Usage: python benchmarks/measure_blue_sweep.py 2d [reps]   # 32x32
       python benchmarks/measure_blue_sweep.py 3d [reps]   # 16x16x8
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from muse_psfr_tpu.api import condition_sweep

    grid = sys.argv[1] if len(sys.argv) > 1 else "2d"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    lb35 = np.linspace(490, 930, 35)
    if grid == "2d":
        sv = np.linspace(0.6, 1.6, 32)
        gv = np.linspace(0.3, 0.9, 32)
        lv = [25.0]
    else:
        sv = np.linspace(0.6, 1.6, 16)
        gv = np.linspace(0.3, 0.9, 16)
        lv = np.array([2.0, 4.5, 8.0, 11.0, 14.0, 18.0, 23.0, 29.0])
    n_pts = len(sv) * len(gv) * len(lv)

    def run(blue):
        if blue:
            os.environ.pop("MUSE_PSFR_NO_BLUE", None)
        else:
            os.environ["MUSE_PSFR_NO_BLUE"] = "1"
        t0 = time.perf_counter()
        condition_sweep(sv, gv, lv, lbda=lb35, chunk=64)
        return time.perf_counter() - t0

    times = {"blue": [], "plain": []}
    for name, blue in (("blue", True), ("plain", False)):
        print(json.dumps({"warmup": name, "s": round(run(blue), 1)}),
              flush=True)
    for rep in range(reps):
        for name, blue in (("blue", True), ("plain", False)):
            dt = run(blue)
            times[name].append(dt)
            print(json.dumps({"rep": rep, "variant": name,
                              "t_s": round(dt, 4),
                              "pts_per_sec": round(n_pts / dt, 1)}),
                  flush=True)
    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "grid": grid, "points": n_pts, "reps": reps,
        "device": str(jax.devices()[0]),
        "median_pts_per_sec": {k: round(n_pts / m, 1)
                               for k, m in med.items()},
        "best_pts_per_sec": {k: round(n_pts / min(v), 1)
                             for k, v in times.items()},
        "speedup_median": round(med["plain"] / med["blue"], 3),
        "paired_ratios": [round(p / b, 3) for b, p in
                          zip(times["blue"], times["plain"])],
    }, indent=1))


if __name__ == "__main__":
    main()
