"""A/B: concurrent executable warm-up vs lazy serial compiles (first night).

The first night of a process pays one multi-minute remote compile per
executable (reduced-window bucket, full-window bucket, tail sizes).  The
warm-up (`parallel/batch.py::_warm_programs`) compiles them CONCURRENTLY
before the first dispatch — the axon remote-compile service runs
concurrent requests concurrently (measured: six mid-size programs 9.5 s
serial vs 2.8-3.5 s threaded), so the night pays ~max instead of ~sum.

Each rep runs a FRESH python subprocess (compiles are per-process on this
deployment: the jax persistent cache is incompatible with axon remote
compile) and times the first `process_batch` call, compile-inclusive.
Alternates variants to ride out the service's large day-to-day variance
(70-520 s measured for the same two pipeline variants).

Usage: python benchmarks/measure_warmup.py [rows] [chunk] [reps_per_variant]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time
sys.path.insert(0, {root!r})
import numpy as np
from bench import build_rows          # realistic full-night telemetry
from muse_psfr_tpu.parallel.batch import process_batch

rows = int(sys.argv[1]); chunk = int(sys.argv[2])
seeing, GL, L0, mask = build_rows(rows)
lbda = np.linspace(490, 930, 35)
t0 = time.perf_counter()
fit, mean, fitm = process_batch(seeing, GL, L0, mask, lbda, chunk=chunk)
t1 = time.perf_counter()
assert np.isfinite(fit).all()
print("FIRST_NIGHT_S", t1 - t0, flush=True)
"""


def run_child(rows, chunk, no_warm):
    env = dict(os.environ)
    if no_warm:
        env["MUSE_PSFR_NO_WARM"] = "1"
        env.pop("MUSE_PSFR_WARM", None)
    else:
        # force-on: the default is OFF on the axon remote-compile tunnel
        # (measured load-dependent; RESULTS.md warm-up note)
        env["MUSE_PSFR_WARM"] = "1"
        env.pop("MUSE_PSFR_NO_WARM", None)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(root=ROOT), str(rows),
         str(chunk)],
        capture_output=True, text=True, env=env, cwd=ROOT)
    wall = time.perf_counter() - t0
    first = None
    for line in out.stdout.splitlines():
        if line.startswith("FIRST_NIGHT_S"):
            first = float(line.split()[1])
    if first is None:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError("child failed")
    return first, wall


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    results = {"warm": [], "no_warm": []}
    for r in range(reps):
        for label, flag in (("warm", False), ("no_warm", True)):
            first, wall = run_child(rows, chunk, flag)
            results[label].append(first)
            print(f"rep {r} {label:8s} first_night={first:8.1f} s "
                  f"(proc wall {wall:.1f} s)", flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    pairs = [n / w for w, n in zip(results["warm"], results["no_warm"])]
    print(json.dumps({
        "rows": rows, "chunk": chunk,
        "warm_runs_s": results["warm"], "no_warm_runs_s": results["no_warm"],
        "median_warm_s": med["warm"], "median_no_warm_s": med["no_warm"],
        "paired_speedup": sorted(pairs)[len(pairs) // 2],
    }))


if __name__ == "__main__":
    main()
