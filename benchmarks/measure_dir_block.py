"""Direct kernel A/B: fused_exp_zoom's direction-block variants.

The npsflin=3 (ndir=9) fused kernel measures ~9 VPU lane-cycles per
exponential while the ndir=1 case achieves ~5.5 on the same kernel
(benchmarks/RESULTS.md): with one direction per grid step, 8 of the 9
steps pay a VMEM scratch read-modify-write per (wavelength, element)
on top of the exp, and every matmul is serialized onto the last step.
``dir_block=db`` streams db directions per step and accumulates
locally (db-fold fewer RMWs); ``db == ndir`` drops the scratch and
issues each wavelength's MXU contraction right after its exponentials
(VPU/MXU overlap).  The cost is db-fold dphi pipeline VMEM, which at
the FULL window forces a smaller wavelength chunk (7 -> 5 at db=3) —
both sides of that trade are measured here.

Usage: python benchmarks/measure_dir_block.py [reps]
       python benchmarks/measure_dir_block.py night [rows] [chunk] [reps]

The ``night`` mode times the full npsflin=3 pipeline with
pallas_dir_block "auto" vs 1 in ONE process with alternating reps
(both executables warmed first).  MUSE_PSFR_NPSFLIN=1 measures the
1-direction night instead (expected: no effect — ndir=1 never blocks).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = (int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1] != "night" else 5)
DIMPSF = 40
M2 = 4 * DIMPSF


def slope_time(fn, n_lo=1, n_hi=6, reps=REPS):
    """Per-call seconds via the slope method (see measure_exp2_kernel)."""
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

    def make_sum(loop, db):
        @jax.jit
        def s(dphi, dl, a2, al, w):
            def body(_, acc):
                out = fused_exp_zoom(dphi * (1.0 + 1e-12 * acc), dl,
                                     a2, al, w, precision="high",
                                     exp2=True, dir_block=db)
                return acc + 1e-30 * jnp.sum(out)
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        return s

    rng = np.random.default_rng(7)
    ndir = 9
    results = []
    # (label, n, ncols, [(k, db), ...]) — production shapes; the full
    # window's db=3 only fits VMEM at a smaller wavelength chunk, so the
    # night-relevant comparison there is db=1@k7 (5 launches/35-lambda)
    # vs db=3@k5 (7 launches) at equal per-lambda cost accounting
    cases = [
        ("windowed_s256", 512, 384, [(12, 1), (12, 3), (12, 9)]),
        ("full", 1280, 768, [(7, 1), (5, 1), (5, 3)]),
        # db=9 at the FULL window is infeasible: even at k=2 Mosaic
        # reports 16.20M > the 16M scoped-vmem limit (measured 2026-08-18)
    ]
    for (label, n, ncols, kdbs) in cases:
        r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
              + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
        dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)
        dphi_np = (2e-2 * r2**0.4
                   * (1.0 + 0.05 * rng.standard_normal((ndir, n, ncols))))
        dphi = jnp.asarray(dphi_np, jnp.float32)
        refs = {}
        for (k, db) in kdbs:
            lb = np.linspace(490, 930, 35)[:k]
            alpha = -0.5 * (2 * np.pi / (lb * 10.0)) ** 2 * 1e-4
            # operands seeded per (shape, k) so that same-k dir-block
            # variants compare against the SAME db=1 reference output
            rng_k = np.random.default_rng((n, k))
            a2 = jnp.asarray(rng_k.standard_normal((k, M2, n)) * 1e-3,
                             jnp.float32)
            w_np = np.abs(rng_k.random((k, ndir))) / ndir + 1e-3
            al = jnp.asarray(alpha, jnp.float32)
            w = jnp.asarray(w_np, jnp.float32)

            ua = np.asarray(fused_exp_zoom(dphi, dl, a2, al, w,
                                           precision="high", exp2=True,
                                           dir_block=db))
            if db == 1:
                refs[k] = ua
            ref = refs.get(k)
            dev = (float(np.abs(ua - ref).max() / np.abs(ref).max())
                   if ref is not None else None)

            est_ms = 0.03 * k * ndir * (n * ncols) / (1280 * 768)
            loop = max(32, min(2048, int(50.0 / max(est_ms, 1e-3))))
            fn = make_sum(loop, db)
            t = slope_time(lambda: fn(dphi, dl, a2, al, w))
            results.append({
                "shape": label, "k": k, "db": db, "loop": loop,
                "t_ms": round(1e3 * t / loop, 4),
                "t_per_lambda_us": round(1e6 * t / loop / k, 2),
                "max_rel_dev_vs_db1": dev})
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_results": len(results)}))


def night():
    import jax
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import process_batch
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_rows

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    npsflin = int(os.environ.get("MUSE_PSFR_NPSFLIN", "3"))
    chunk = (int(sys.argv[3]) if len(sys.argv) > 3
             else (22 if npsflin == 3 else 50))
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    lbda = np.linspace(490, 930, 35)
    seeing, GL, L0, mask = build_rows(rows)

    variants = {"db_auto": GalacsiConfig().with_(pallas_dir_block="auto"),
                "db_1": GalacsiConfig().with_(pallas_dir_block=1)}
    times = {k: [] for k in variants}

    for name, cfg in variants.items():
        t0 = time.perf_counter()
        process_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                      cfg=cfg, chunk=chunk)
        print(json.dumps({"warmup": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    for rep in range(reps):
        for name, cfg in variants.items():
            t0 = time.perf_counter()
            process_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                          cfg=cfg, chunk=chunk)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(json.dumps({"rep": rep, "variant": name,
                              "t_s": round(dt, 4),
                              "rows_per_sec": round(rows / dt, 1)}),
                  flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "rows": rows, "chunk": chunk, "npsflin": npsflin, "reps": reps,
        "device": str(jax.devices()[0]),
        "median_rows_per_sec": {k: round(rows / m, 1)
                                for k, m in med.items()},
        "best_rows_per_sec": {k: round(rows / b, 1)
                              for k, b in best.items()},
        "speedup_median": round(med["db_1"] / med["db_auto"], 3),
        "paired_ratios": [round(b / a, 3) for a, b in
                          zip(times["db_auto"], times["db_1"])],
    }, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "night":
        night()
    else:
        main()
