"""Direct kernel A/B: fused_exp_zoom vs the diffraction-disc column
split (cfg.pallas_disc_skip).

The full-window production slab (1280 x 768 under the fold) has 6 of
its 60 (128, 128) blocks entirely outside the pupil-autocorrelation
disc where ``dl`` is numerically zero (otf/psf.py:_disc_block_mask):
``fused_exp_zoom_disc`` splits the call into column groups whose
live-row chord is statically sliced, skipping the dead blocks' damping
exponentials AND their share of the contraction.  This script
slope-times both at the production full-bucket shape (the only shape
whose mask has dead blocks).

Two in-kernel variants were measured SLOWER than the plain kernel
despite the 10% dead work (2026-08-17, TPU v5 lite, this harness):
a third row-block grid dimension with per-block skip cost ~16% in
per-grid-step overhead (450 vs 45 steps at ndir=9, k=7: exact 34.9 us
per lambda, masked 40.5, all-live control 40.7); a static in-kernel
unrolled row-block loop with pl.when predication cost ~23% with the
predication itself (exact 32.3, masked 35.1, all-live control 39.6).
The column split keeps the plain kernel bit-identical and wins by
doing strictly less work per call.

Usage: python benchmarks/measure_disc_skip.py [reps]
       python benchmarks/measure_disc_skip.py night [rows] [chunk] [reps]

The ``night`` mode times the full npsflin=3 pipeline with the disc
split on vs off in ONE process with alternating reps (both executables
warmed first), the only way a ~2% effect can be read against the 5-8%
run-to-run chip spread.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = (int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1] != "night" else 5)
DIMPSF = 40
M2 = 4 * DIMPSF
LOOP = 32


def slope_time(fn, n_lo=1, n_hi=4, reps=REPS):
    """Per-call seconds via the slope method (see measure_anchor_kernel)."""
    fn()

    def run_n(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(out))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(reps):
        slopes.append((run_n(n_hi) - run_n(n_lo)) / (n_hi - n_lo))
    return float(np.median(slopes))


def main():
    import jax
    import jax.numpy as jnp
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.otf.psf import _disc_block_mask
    from muse_psfr_tpu.ops.zoom_dft import (disc_column_groups,
                                            fused_exp_zoom,
                                            fused_exp_zoom_disc)

    # the carry consumes a FULL reduction of the kernel output: reducing
    # a single element would let XLA dead-code-eliminate the column
    # groups that do not produce it (measured: an [0, 0, 0] probe showed
    # the split "8x faster" because only 1 of its 3 calls survived DCE)
    @partial(jax.jit, static_argnames=())
    def exact_sum(dphi, dl, a2, al, w):
        def body(_, s):
            out = fused_exp_zoom(dphi * (1.0 + 1e-12 * s), dl, a2, al, w,
                                 precision="high")
            return s + 1e-30 * jnp.sum(out)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    def make_disc_sum(mask_np):
        @jax.jit
        def disc_sum(dphi, dl, a2, al, w):
            def body(_, s):
                out = fused_exp_zoom_disc(dphi * (1.0 + 1e-12 * s), dl,
                                          a2, al, w, mask_np,
                                          precision="high")
                return s + 1e-30 * jnp.sum(out)
            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))
        return disc_sum

    rng = np.random.default_rng(7)
    n, ncols = 1280, 768
    mask_np = _disc_block_mask(GalacsiConfig())        # (6, 10), 6 dead
    assert mask_np is not None
    n_dead = int((mask_np == 0).sum())
    print(json.dumps({"groups": disc_column_groups(mask_np)}), flush=True)

    r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
          + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
    dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)

    results = []
    for ndir in (9, 1):
        dphi_np = (2e-2 * r2**0.4
                   * (1.0 + 0.05 * rng.standard_normal((ndir, n, ncols))))
        dphi = jnp.asarray(dphi_np, jnp.float32)
        for k in (7, 5):
            lb = np.linspace(490, 930, 35)[:k]
            alpha = -0.5 * (2 * np.pi / lb) ** 2
            a2 = jnp.asarray(rng.standard_normal((k, M2, n)) * 1e-3,
                             jnp.float32)
            al = jnp.asarray(alpha, jnp.float32)
            w = jnp.asarray(np.full((k, ndir), 1.0 / ndir), jnp.float32)
            disc_sum = make_disc_sum(mask_np)
            for label, fn in [
                ("exact", lambda: exact_sum(dphi, dl, a2, al, w)),
                ("disc_split", lambda: disc_sum(dphi, dl, a2, al, w)),
            ]:
                t = slope_time(fn)
                results.append({
                    "kernel": label, "ndir": ndir, "k": k,
                    "dead_blocks": (n_dead if label == "disc_split" else 0),
                    "t_ms": round(1e3 * t / LOOP, 3),
                    "t_per_lambda_us": round(1e6 * t / LOOP / k, 2)})
                print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_results": len(results)}))


def night():
    import jax
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import process_batch
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_rows

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    lbda = np.linspace(490, 930, 35)
    seeing, GL, L0, mask = build_rows(rows)
    cfgs = {"disc_on": GalacsiConfig(pallas_disc_skip=True),
            "disc_off": GalacsiConfig(pallas_disc_skip=False)}
    times = {k: [] for k in cfgs}
    for name, cfg in cfgs.items():
        t0 = time.perf_counter()
        process_batch(seeing, GL, L0, mask, lbda, npsflin=3, cfg=cfg,
                      chunk=chunk)
        print(json.dumps({"warmup": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    for rep in range(reps):
        for name, cfg in cfgs.items():
            t0 = time.perf_counter()
            process_batch(seeing, GL, L0, mask, lbda, npsflin=3, cfg=cfg,
                          chunk=chunk)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(json.dumps({"rep": rep, "cfg": name, "t_s": round(dt, 4),
                              "rows_per_sec": round(rows / dt, 1)}),
                  flush=True)
    print(json.dumps({
        "rows": rows, "chunk": chunk, "npsflin": 3,
        "device": str(jax.devices()[0]),
        **{f"{k}_best_rows_per_sec": round(rows / min(v), 1)
           for k, v in times.items()},
        **{f"{k}_median_rows_per_sec":
           round(rows / float(np.median(v)), 1) for k, v in times.items()},
    }, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "night":
        night()
    else:
        main()
