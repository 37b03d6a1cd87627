"""Kernel A/B: scratch vs scratch-free body for the ndir=1 fused zoom.

Until round 4, ``fused_exp_zoom`` selected the direction-accumulating
``_kernel`` body whenever ``dir_block == 1`` — including ``ndir == 1``
(the default npsflin=1 production config), where there is nothing to
accumulate: each wavelength's damping plane took a pointless
(nl, n, tile_j) VMEM scratch round trip (write in the d==0 branch, read
back for the matmul) plus two predicated blocks per grid step.  The
scratch-free ``_kernel_dirfull`` body (the round-4 ``db == ndir`` kernel
that measured 1.52x at the windowed ndir=9 shape) applies verbatim at
ndir=1 and is bit-identical math.

This measures both bodies at the two ndir=1 production shapes
(full-window (1, 1280, 768) k=7 and reduced-window (1, 512, 384) k=12,
dim=1280 dimpsf=40) via the slope method, checks bit-identity, and
writes benchmarks/measure_ndir1_body.json.

Usage: python benchmarks/measure_ndir1_body.py [reps]
       python benchmarks/measure_ndir1_body.py night [rows] [chunk] [reps]

``night`` mode: full npsflin=1 pipeline, alternating reps of the two
bodies in one process (both warmed), via the ``ndir1_scratch`` escape.
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

    def make_sum(loop, scratch):
        @jax.jit
        def s(dphi, dl, a2, al, w):
            def body(_, acc):
                out = fused_exp_zoom(dphi * (1.0 + 1e-12 * acc), dl,
                                     a2, al, w, precision="high",
                                     exp2=True, ndir1_scratch=scratch)
                return acc + 1e-30 * jnp.sum(out)
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        return s

    rng = np.random.default_rng(7)
    results = []
    cases = [
        ("windowed_s256", 512, 384, 12),
        ("full", 1280, 768, 7),
    ]
    for (label, n, ncols, k) in cases:
        r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
              + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
        dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)
        dphi_np = (2e-2 * r2**0.4
                   * (1.0 + 0.05 * rng.standard_normal((1, n, ncols))))
        dphi = jnp.asarray(dphi_np, jnp.float32)
        lb = np.linspace(490, 930, 35)[:k]
        alpha = -0.5 * (2 * np.pi / (lb * 10.0)) ** 2 * 1e-4
        rng_k = np.random.default_rng((n, k))
        a2 = jnp.asarray(rng_k.standard_normal((k, M2, n)) * 1e-3,
                         jnp.float32)
        w_np = np.abs(rng_k.random((k, 1))) + 1e-3
        al = jnp.asarray(alpha, jnp.float32)
        w = jnp.asarray(w_np, jnp.float32)

        ref = None
        for scratch in (True, False):
            ua = np.asarray(fused_exp_zoom(dphi, dl, a2, al, w,
                                           precision="high", exp2=True,
                                           ndir1_scratch=scratch))
            if scratch:
                ref = ua
            dev = float(np.abs(ua - ref).max() / np.abs(ref).max())

            est_ms = 0.03 * k * (n * ncols) / (1280 * 768)
            loop = max(32, min(2048, int(50.0 / max(est_ms, 1e-3))))
            fn = make_sum(loop, scratch)
            t = slope_time(lambda: fn(dphi, dl, a2, al, w))
            results.append({
                "shape": label, "k": k,
                "body": "scratch" if scratch else "dirfull",
                "loop": loop,
                "t_ms": round(1e3 * t / loop, 4),
                "t_per_lambda_us": round(1e6 * t / loop / k, 2),
                "max_rel_dev_vs_scratch": dev})
            print(json.dumps(results[-1]), flush=True)

    out = {"device": str(jax.devices()[0]), "results": results}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "measure_ndir1_body.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"device": out["device"],
                      "n_results": len(results)}))


def night():
    import jax
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import process_batch
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_rows

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    lbda = np.linspace(490, 930, 35)
    seeing, GL, L0, mask = build_rows(rows)

    # "auto" -> scratch-free ndir=1 body; an explicit pallas_dir_block
    # pins the legacy scratch layout (same A/B pattern as the ndir=9
    # direction-block night in measure_dir_block.py) — the cfg is part
    # of the pipeline jit key, so both variants coexist warmed
    variants = {"dirfull": GalacsiConfig().with_(pallas_dir_block="auto"),
                "scratch": GalacsiConfig().with_(pallas_dir_block=1)}
    times = {k: [] for k in variants}

    def run(cfg):
        t0 = time.perf_counter()
        process_batch(seeing, GL, L0, mask, lbda, npsflin=1,
                      cfg=cfg, chunk=chunk)
        return time.perf_counter() - t0

    for name, cfg in variants.items():
        print(json.dumps({"warmup": name, "s": round(run(cfg), 1)}),
              flush=True)
    for rep in range(reps):
        for name, cfg in variants.items():
            dt = run(cfg)
            times[name].append(dt)
            print(json.dumps({"rep": rep, "variant": name,
                              "t_s": round(dt, 4),
                              "rows_per_sec": round(rows / dt, 1)}),
                  flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "rows": rows, "chunk": chunk, "reps": reps,
        "device": str(jax.devices()[0]),
        "median_rows_per_sec": {k: round(rows / m, 1)
                                for k, m in med.items()},
        "best_rows_per_sec": {k: round(rows / min(v), 1)
                              for k, v in times.items()},
        "speedup_median": round(med["scratch"] / med["dirfull"], 3),
        "paired_ratios": [round(b / a, 3) for a, b in
                          zip(times["dirfull"], times["scratch"])],
    }, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "night":
        night()
    else:
        main()
