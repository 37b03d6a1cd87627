"""Direct kernel A/B: exact fused_exp_zoom vs anchored-Taylor variant.

The night-level A/B (2026-08-17, TPU v5 lite) measured the anchor path
SLOWER (227 vs 290 rows/s at npsflin=3) despite cutting transcendentals
63 -> 9 per pixel per chunk.  This script isolates the kernels from the
batch layer: slope-timed pallas_call invocations at the production
bucket shapes, per (kernel, lambda-chunk, degree), reporting
device-time per wavelength per grid column (the quantity the night
integrates).

Usage: python benchmarks/measure_anchor_kernel.py [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NDIR = 9
DIMPSF = 40
M2 = 4 * DIMPSF


def slope_time(fn, n_lo=1, n_hi=4, reps=REPS):
    """Per-call seconds via the slope method.  ``fn`` MUST return a
    scalar (reduce inside jit): pulling a full kernel output over the
    ~16 MB/s tunnel costs 100+ ms and swamps the measurement."""
    fn()                                      # compile outside the timing

    def run_n(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(out))                # one tiny sync pull
        return time.perf_counter() - t0

    slopes = []
    for _ in range(reps):
        slopes.append((run_n(n_hi) - run_n(n_lo)) / (n_hi - n_lo))
    return float(np.median(slopes))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from muse_psfr_tpu.ops.zoom_dft import (fused_exp_zoom,
                                            fused_exp_zoom_anchor)

    # 32 kernel invocations per jitted call: one call's device time
    # (~5-20 ms) then dominates the ~37 ms sync-pull latency and host
    # jitter of the tunneled link.  The carry perturbs the input each
    # iteration (1 + 1e-12 s) so XLA cannot fold the loop body.
    LOOP = 32

    @partial(jax.jit, static_argnames=())
    def exact_sum(dphi, dl, a2, al, w):
        def body(_, s):
            out = fused_exp_zoom(dphi * (1.0 + 1e-12 * s), dl, a2, al, w,
                                 precision="high")
            return s + 1e-30 * out[0, 0, 0]
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    @partial(jax.jit, static_argnames=("degree",))
    def anchor_sum(dphi, dl, a2, astar, cj, degree):
        def body(_, s):
            out = fused_exp_zoom_anchor(dphi * (1.0 + 1e-12 * s), dl, a2,
                                        astar, cj, precision="high",
                                        degree=degree)
            return s + 1e-30 * out[0, 0, 0]
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    rng = np.random.default_rng(7)
    lb_all = np.linspace(490, 930, 35)
    results = []

    # candidates per bucket: ("exact", k, None) or ("anchor", k, degree).
    # Only bound-certifiable (budget 1e-6, see otf/psf.py:zoom_anchor_bound)
    # and VMEM-feasible combinations; the first round measured degree 8
    # break-even-or-worse and degree 4 uncertifiable at useful k, so this
    # round scans the certifiable frontier (k, k-1) plus large-k exact.
    CANDIDATES = {
        ("windowed", 512, 384): [
            ("exact", 7, None), ("exact", 9, None), ("exact", 12, None),
            ("anchor", 5, 5), ("anchor", 6, 6), ("anchor", 7, 6),
            ("anchor", 7, 8), ("anchor", 9, 8),
        ],
        ("full", 1280, 768): [
            ("exact", 5, None), ("exact", 7, None),
            ("anchor", 4, 4), ("anchor", 5, 5), ("anchor", 6, 6),
        ],
    }

    from math import factorial
    for (label, n, ncols), cands in CANDIDATES.items():
        # realistic structure function: grows outward, O(1e4) nm^2
        r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
              + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
        dphi_np = (2e-2 * r2**0.4
                   * (1.0 + 0.05 * rng.standard_normal((NDIR, n, ncols))))
        dphi = jnp.asarray(dphi_np, jnp.float32)
        dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)

        for kind, k, deg in cands:
            lb = lb_all[:k]
            alpha = -0.5 * (2 * np.pi / lb) ** 2
            a2 = jnp.asarray(rng.standard_normal((k, M2, n)) * 1e-3,
                             jnp.float32)
            al = jnp.asarray(alpha, jnp.float32)
            if kind == "exact":
                w = jnp.asarray(np.full((k, NDIR), 1.0 / NDIR), jnp.float32)
                t = slope_time(lambda: exact_sum(dphi, dl, a2, al, w))
                results.append({"kernel": "exact", "bucket": label, "k": k,
                                "t_ms": round(1e3 * t / LOOP, 3),
                                "t_per_lambda_us":
                                    round(1e6 * t / LOOP / k, 2)})
            else:
                astar = 0.5 * (alpha.min() + alpha.max())
                rho1 = alpha / astar - 1.0
                coef = np.stack([rho1**j / factorial(j)
                                 for j in range(deg + 1)], 1) / NDIR
                cj = jnp.asarray(coef, jnp.float32)
                t = slope_time(lambda: anchor_sum(
                    dphi, dl, a2, astar, cj, deg))
                results.append({"kernel": "anchor", "bucket": label, "k": k,
                                "degree": deg,
                                "t_ms": round(1e3 * t / LOOP, 3),
                                "t_per_lambda_us":
                                    round(1e6 * t / LOOP / k, 2)})
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_results": len(results)}))


if __name__ == "__main__":
    main()
