"""Kernel A/B: joint (lambda chunk k, row_splits) ladder for the FULL
window ndir=9 fused zoom (the rowacc kernel).

The committed full-window plan is (k=7, splits=2, db=9).  The round-4
closure note recorded splits=10@k7 as a heavy loss and k=12@splits=2 as
a VMEM compile failure — but missed splits=5 (h=256, a legal multiple
of 128 at n=1280), whose VMEM model admits k up to 18.  The interesting
accounting: each launch reads the full Dphi (9 x 1280 x 768 f32 =
35.4 MB) once, so a 35-lambda cube pays ceil(35/k) Dphi reads — k=18
halves them (2 vs 5) while keeping the TOTAL grid-step count equal to
the committed plan (2 launches x 30 steps vs 5 x 12), so the known
per-step overhead that sank splits=10 does not grow.

Measures per-lambda kernel time (slope method) for the committed plan
and the missed (k, splits) points, on the production full-window shape.

Usage: python benchmarks/measure_rowacc_k.py [reps]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
DIMPSF = 40
M2 = 4 * DIMPSF


def slope_time(fn, n_lo=1, n_hi=6, reps=REPS):
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
    from muse_psfr_tpu.ops.zoom_dft import fused_exp_zoom

    def make_sum(loop, db, rs):
        @jax.jit
        def s(dphi, dl, a2, al, w):
            def body(_, acc):
                out = fused_exp_zoom(dphi * (1.0 + 1e-12 * acc), dl,
                                     a2, al, w, precision="high",
                                     exp2=True, dir_block=db,
                                     row_splits=rs)
                return acc + 1e-30 * jnp.sum(out)
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        return s

    rng = np.random.default_rng(7)
    ndir, n, ncols = 9, 1280, 768
    r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
          + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
    dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)
    dphi_np = (2e-2 * r2**0.4
               * (1.0 + 0.05 * rng.standard_normal((ndir, n, ncols))))
    dphi = jnp.asarray(dphi_np, jnp.float32)

    # (k, row_splits); db=9 throughout (the committed full direction
    # block).  35-lambda-cube accounting rides per-lambda time plus the
    # launch count 35/k.
    cases = [(7, 2), (12, 5), (18, 5), (18, 10), (12, 2)]
    results = []
    refs = {}
    for (k, rs) in cases:
        lb = np.linspace(490, 930, 35)[:k]
        alpha = -0.5 * (2 * np.pi / (lb * 10.0)) ** 2 * 1e-4
        rng_k = np.random.default_rng((n, k))
        a2 = jnp.asarray(rng_k.standard_normal((k, M2, n)) * 1e-3,
                         jnp.float32)
        w_np = np.abs(rng_k.random((k, ndir))) / ndir + 1e-3
        al = jnp.asarray(alpha, jnp.float32)
        w = jnp.asarray(w_np, jnp.float32)

        try:
            ua = np.asarray(fused_exp_zoom(dphi, dl, a2, al, w,
                                           precision="high", exp2=True,
                                           dir_block=9, row_splits=rs))
        except Exception as err:  # noqa: BLE001 — Mosaic VMEM rejections
            results.append({"k": k, "rs": rs,
                            "error": str(err).splitlines()[0][:160]})
            print(json.dumps(results[-1]), flush=True)
            continue
        if k not in refs:
            refs[k] = ua
        dev = float(np.abs(ua - refs[k]).max() / np.abs(refs[k]).max())

        est_ms = 0.03 * k * ndir * (n * ncols) / (1280 * 768)
        loop = max(32, min(2048, int(50.0 / max(est_ms, 1e-3))))
        fn = make_sum(loop, 9, rs)
        t = slope_time(lambda: fn(dphi, dl, a2, al, w))
        per_lambda_us = 1e6 * t / loop / k
        launches = -(-35 // k)
        results.append({
            "k": k, "rs": rs, "loop": loop,
            "t_per_lambda_us": round(per_lambda_us, 2),
            "cube_est_us": round(per_lambda_us * 35, 1),
            "launches_per_cube": launches,
            "max_rel_dev_vs_same_k": dev})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_results": len(results)}))


if __name__ == "__main__":
    main()
