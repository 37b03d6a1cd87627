"""Direct kernel A/B: fused_exp_zoom's damping evaluation spelled as
``exp(alpha*D) * w`` (mul + exp + mul per element) vs the algebraically
identical ``exp2(alpha*log2(e)*D + log2(w))`` (fma + exp2).

Motivation: the zoom stage is at the VPU exp-throughput floor
(benchmarks/RESULTS.md) — the only way down is fewer VPU ops per
element.  If the hardware exp is itself ``exp2`` after a log2(e)
argument scale, folding that scale into ``alpha`` (once per chunk on
the host side) and the per-(lambda, direction) weight into the exponent
(``w > 0`` always: it is ``1/(ndir * exp(alpha*D_c) * dl_cc)``,
otf/psf.py:667-669) removes up to two vector ops per exp.

Exactness: ``exp2(a2*D + lw)`` differs from ``exp(a*D)*w`` only in
argument rounding, relative error ~ ln2 * |a2*D + lw| * eps — at the
OTF core (value ~1) the exponent is ~0 so the error is ~eps; where the
exponent is large the OTF is absolutely negligible.  Measured against
float64 below.

Usage: python benchmarks/measure_exp2_kernel.py [reps]
       python benchmarks/measure_exp2_kernel.py night [rows] [chunk] [reps]

The ``night`` mode times the full npsflin=3 pipeline with zoom_exp2 on
vs off in ONE process with alternating reps (both executables warmed
first) — the only way a few-percent effect reads against the 5-8%
run-to-run chip spread.  MUSE_PSFR_NPSFLIN=1 measures the 1-direction
night instead.
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
    """Per-call seconds.  The kernels here are 0.01-0.2 ms while one
    tunnel sync costs ~37 ms, so each call runs LOOP iterations in-graph
    (set per shape so a call is ~50 ms of device time) and the
    inter-rep median of (run_n(6)-run_n(1))/5 reads the marginal cost."""
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

    def make_sums(loop):
        def make(exp2):
            @jax.jit
            def s(dphi, dl, a2, al, w):
                def body(_, acc):
                    out = fused_exp_zoom(dphi * (1.0 + 1e-12 * acc), dl,
                                         a2, al, w, precision="high",
                                         exp2=exp2)
                    return acc + 1e-30 * jnp.sum(out)
                return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
            return s
        return make(False), make(True)

    rng = np.random.default_rng(7)
    results = []
    for (label, n, ncols) in [("windowed_s256", 512, 384),
                              ("full", 1280, 768)]:
        r2 = (np.add.outer(np.arange(n) - n / 2, np.zeros(ncols))**2
              + np.add.outer(np.zeros(n), np.arange(ncols) - n / 2)**2)
        dl = jnp.asarray(rng.random((n, ncols)), jnp.float32)
        for ndir in (1, 9):
            dphi_np = (2e-2 * r2**0.4
                       * (1.0 + 0.05 * rng.standard_normal((ndir, n, ncols))))
            dphi = jnp.asarray(dphi_np, jnp.float32)
            ks = (7, 12) if label == "windowed_s256" else (7,)
            for k in ks:
                lb = np.linspace(490, 930, 35)[:k]
                alpha = -0.5 * (2 * np.pi / (lb * 10.0)) ** 2 * 1e-4
                a2 = jnp.asarray(rng.standard_normal((k, M2, n)) * 1e-3,
                                 jnp.float32)
                w_np = np.abs(rng.random((k, ndir))) / ndir + 1e-3
                al = jnp.asarray(alpha, jnp.float32)
                w = jnp.asarray(w_np, jnp.float32)

                # deviation of the exp2 form from the exp form (argument
                # rounding only; both sit on the same MXU contraction)
                ua = np.asarray(fused_exp_zoom(dphi, dl, a2, al, w,
                                               precision="high"))
                ub = np.asarray(fused_exp_zoom(dphi, dl, a2, al, w,
                                               precision="high", exp2=True))
                scale = max(np.abs(ua).max(), 1e-30)
                dev = float(np.abs(ua - ub).max() / scale)

                # ~50 ms of device work per timed call: the per-lambda
                # cost is roughly (n/1280)*(ncols/768)*ndir-proportional
                est_ms = 0.03 * k * ndir * (n * ncols) / (1280 * 768)
                loop = max(32, min(2048, int(50.0 / max(est_ms, 1e-3))))
                exact_sum, exp2_sum = make_sums(loop)
                for nm, fn in [
                    ("exp_mul", lambda: exact_sum(dphi, dl, a2, al, w)),
                    ("exp2_fma", lambda: exp2_sum(dphi, dl, a2, al, w)),
                ]:
                    t = slope_time(fn)
                    results.append({
                        "kernel": nm, "shape": label, "ndir": ndir, "k": k,
                        "loop": loop,
                        "t_ms": round(1e3 * t / loop, 4),
                        "t_per_lambda_us": round(1e6 * t / loop / k, 2),
                        "max_rel_dev_vs_exact": (dev if nm == "exp2_fma"
                                                 else 0.0)})
                    print(json.dumps(results[-1]), flush=True)

    import jax
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

    variants = {"exp2_on": GalacsiConfig().with_(zoom_exp2=True),
                "exp2_off": GalacsiConfig().with_(zoom_exp2=False)}
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
        "speedup_median": round(med["exp2_off"] / med["exp2_on"], 3),
        "paired_ratios": [round(b / a, 3) for a, b in
                          zip(times["exp2_on"], times["exp2_off"])],
    }, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "night":
        night()
    else:
        main()
