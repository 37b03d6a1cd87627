"""Measure the merged-executable claim (docs/usage.md "Why not one
merged executable with a masked window").

The docs argue that replacing the two bucketed pipeline executables
(reduced-window + full-window) with ONE full-window executable that
masks afterwards would cost ~1.6x steady state, because the ~60% of
rows that are windowable would pay full-window device time.  This was
derived from per-stage profiles, never measured.  Here we measure it
directly: the same night is timed (a) under the production bucketing
and (b) with every row forced into the full-window bucket — exactly the
device-time cost a merged executable would pay (a real merged program
would additionally pay the masking select, so (b) is a LOWER bound on
its steady-state cost).

CPU at the dim=512 test config (the documented stand-in for production
shape ratios); run on TPU for the production number.

Usage: python benchmarks/measure_merged_executable.py [rows] [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NL = 7


def main():
    import jax
    if os.environ.get("MUSE_PSFR_MERGED_TPU") != "1":
        # default to CPU even under the axon plugin (which overrides the
        # JAX_PLATFORMS env var): at dim=512 the TPU run is pure
        # dispatch latency over the tunnel (~0.5 ms device compute per
        # chunk vs ~10 ms round trip), which measures the number of
        # dispatches, not the windowed/full compute ratio the
        # merged-executable claim is about
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)  # match tests/conftest.py
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu import parallel
    from muse_psfr_tpu.parallel import batch as batch_mod
    from bench import build_rows

    cfg = GalacsiConfig(dim=512, dim_pup=24, dimpsf=12)
    lbda = np.linspace(490, 930, NL)
    seeing, GL, L0, mask = build_rows(ROWS)
    okw = batch_mod.rows_windowable(
        seeing, GL, L0, mask, float(lbda.max()), cfg,
        batch_mod.default_support_bucket(cfg), npsflin=1)
    print(json.dumps({"rows": ROWS, "windowable_rows": int(okw.sum()),
                      "backend": jax.default_backend()}), flush=True)

    def night():
        return batch_mod.process_batch(seeing, GL, L0, mask, lbda,
                                       npsflin=1, cfg=cfg, chunk=10)

    def timed(label):
        t0 = time.perf_counter()
        night()
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            night()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(json.dumps({"variant": label, "warmup_s": round(warm, 2),
                          "best_s": round(best, 4),
                          "rows_per_sec": round(ROWS / best, 1)}),
              flush=True)
        return best

    t_bucketed = timed("bucketed (production)")

    # force every row into the full-window bucket: the device-time cost a
    # merged (mask-after) executable would pay for the whole night
    real = batch_mod.rows_windowable
    batch_mod.rows_windowable = lambda *a, **k: np.zeros(
        np.shape(a[0])[0], bool)
    try:
        t_merged = timed("all-full (merged-executable cost)")
    finally:
        batch_mod.rows_windowable = real

    print(json.dumps({"merged_over_bucketed": round(t_merged / t_bucketed, 3),
                      "docs_claim": 1.6}), flush=True)


if __name__ == "__main__":
    main()
