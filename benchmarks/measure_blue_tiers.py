"""Night-level A/B of the blue-split TIER LADDER (cfg.blue_tiers).

Admission into the half-bucket blue window is graded in the segment
length nb (measure_perlambda_window.py: 72% of full-window bench-night
rows admit S=256 out to 658.2 nm but 47% admit it out to 748.8 nm;
85% of S=256-bucket rows admit S=128 out to 748.8 nm vs 100% at
658.2 nm), so a single blue subgroup per bucket forfeits the deeper
saving of the strong admitters.  ``blue_tiers=2`` lets the planner
form a two-tier ladder (e.g. full bucket: nb=21 for the strong
admitters, nb=14 for the rest) at the cost of one more compiled
executable per tiered bucket.

Protocol: alternating reps in ONE process — tiers=1 and tiers=2 group
configs are distinct jit keys only where the plans differ, so both
executable sets stay warm after the warm-up pair; the tier count is
toggled via MUSE_PSFR_BLUE_TIERS at plan time (cfg untouched, so
shared executables share their cache entry).

Usage: python benchmarks/measure_blue_tiers.py plan  [rows] [npsflin] [chunk]
       python benchmarks/measure_blue_tiers.py night [rows] [chunk] [reps] [npsflin]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rows(n):
    from bench import build_rows
    return build_rows(n)


def plan():
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import _plan_batch
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    npsflin = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    seeing, GL, L0, mask = _rows(rows)
    lbda = np.linspace(490, 930, 35)
    for tiers in (1, 2):
        os.environ["MUSE_PSFR_BLUE_TIERS"] = str(tiers)
        groups = _plan_batch(seeing, GL, L0, mask, lbda, (100, 10000),
                             npsflin, GalacsiConfig(), chunk, None)[1]
        for gcfg, gidx in groups:
            print(json.dumps({
                "tiers": tiers,
                "otf_support": gcfg.otf_support,
                "otf_blue": gcfg.otf_blue,
                "rows": int(gidx.size),
                "share_pct": round(100.0 * gidx.size / rows, 1)}),
                flush=True)


def night():
    from muse_psfr_tpu.parallel.batch import process_batch
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    npsflin = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    # optional: the two tier counts to compare (default 2 vs 1)
    tiers_a = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    tiers_b = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    lbda = np.linspace(490, 930, 35)
    seeing, GL, L0, mask = _rows(rows)

    def run(tiers):
        os.environ["MUSE_PSFR_BLUE_TIERS"] = str(tiers)
        t0 = time.perf_counter()
        process_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                      chunk=chunk)
        return time.perf_counter() - t0

    ab = ((f"t{tiers_a}", tiers_a), (f"t{tiers_b}", tiers_b))
    for name, tiers in ab:
        print(json.dumps({"warmup": name, "s": round(run(tiers), 1)}),
              flush=True)
    na, nb = ab[0][0], ab[1][0]
    times = {na: [], nb: []}
    pairs = []
    for rep in range(reps):
        for name, tiers in ab:
            dt = run(tiers)
            times[name].append(dt)
            print(json.dumps({"rep": rep, "which": name,
                              "s": round(dt, 4),
                              "rows_per_s": round(rows / dt, 1)}),
                  flush=True)
        pairs.append(times[nb][-1] / times[na][-1])
    print(json.dumps({
        "rows": rows, "chunk": chunk, "npsflin": npsflin, "reps": reps,
        f"{nb}_median_s": round(float(np.median(times[nb])), 4),
        f"{na}_median_s": round(float(np.median(times[na])), 4),
        f"{nb}_rows_per_s": round(rows / float(np.median(times[nb])), 1),
        f"{na}_rows_per_s": round(rows / float(np.median(times[na])), 1),
        "paired_speedup_median": round(float(np.median(pairs)), 3),
        "paired_speedups": [round(p, 3) for p in pairs]}, ),
        flush=True)


if __name__ == "__main__":
    {"plan": plan, "night": night}[sys.argv[1]]()
