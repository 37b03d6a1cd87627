"""Timed npsflin=3 (9-direction) night with guard-trip visibility.

Round 2 measured the 9-direction 100-row night at 277 rows/s while the
stage profiles predicted ~3x more; hypothesis: a single window-guard
trip re-ran the ENTIRE night full-window (the round-2 redo semantics).
This script logs any guard warning and times the night under the
round-3 surgical redo.

Usage: python benchmarks/measure_npsflin3.py [rows] [chunk] [reps]
"""

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 44  # one unpadded full-bucket chunk; 1.34x over 22 after the dir-block/row-split kernels (RESULTS.md)
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
NPSFLIN = int(os.environ.get("MUSE_PSFR_NPSFLIN", "3"))
NL = 35


class TripCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.trips = []

    def emit(self, record):
        if "guard tripped" in record.getMessage():
            self.trips.append(record.getMessage())


def main():
    import jax
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import process_batch, \
        rows_windowable, default_support_bucket
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_rows

    counter = TripCounter()
    logging.getLogger("muse_psfr.batch").addHandler(counter)

    cfg = GalacsiConfig()
    # A/B knob: MUSE_PSFR_ANCHOR=1 engages the anchored-Taylor kernel
    # (cfg.zoom_anchor="auto"); the default is the exact per-wavelength
    # exp kernel (the anchor measured SLOWER end-to-end, 228 vs 268
    # rows/s, 2026-08-17 — see RESULTS.md)
    if os.environ.get("MUSE_PSFR_ANCHOR") == "1":
        cfg = cfg.with_(zoom_anchor="auto")
    elif os.environ.get("MUSE_PSFR_ANCHOR") == "0":
        cfg = cfg.with_(zoom_anchor="off")
    # A/B knob: MUSE_PSFR_LAMBDA_CHUNK overrides the fused-kernel
    # wavelength chunk (cfg.pallas_lambda_chunk, default 12; VMEM still
    # caps the full bucket at 7)
    if os.environ.get("MUSE_PSFR_LAMBDA_CHUNK"):
        cfg = cfg.with_(pallas_lambda_chunk=int(
            os.environ["MUSE_PSFR_LAMBDA_CHUNK"]))
    lbda = np.linspace(490, 930, NL)
    seeing, GL, L0, mask = build_rows(ROWS)
    okw = rows_windowable(seeing, GL, L0, mask, float(lbda.max()), cfg,
                          default_support_bucket(cfg), npsflin=NPSFLIN)
    print(json.dumps({"windowable_rows": int(okw.sum()), "rows": ROWS}),
          flush=True)

    def run():
        return process_batch(seeing, GL, L0, mask, lbda, npsflin=NPSFLIN,
                             cfg=cfg, chunk=CHUNK)

    t0 = time.perf_counter()
    run()
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1),
                      "warmup_trips": len(counter.trips)}), flush=True)

    times = []
    for rep in range(REPS):
        counter.trips.clear()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(json.dumps({"rep": rep, "t_s": round(dt, 4),
                          "rows_per_sec": round(ROWS / dt, 1),
                          "trips": counter.trips}), flush=True)

    best = min(times)
    print(json.dumps({
        "rows": ROWS, "chunk": CHUNK, "npsflin": NPSFLIN,
        "device": str(jax.devices()[0]),
        "best_s": round(best, 4), "median_s": round(float(np.median(times)), 4),
        "best_rows_per_sec": round(ROWS / best, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
