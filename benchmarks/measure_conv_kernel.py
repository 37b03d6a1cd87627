"""Direct A/B of the final-PSF convolution stage: XLA DFT-matmul path
vs the fused lane-packed Pallas chain (cfg.use_pallas_conv).

Measures the exact computation the pipeline performs per chunk: both
'same' convolutions of a (rows, nl, 40, 40) PSF block, per-row tip-tilt
kernel + per-wavelength intrinsic kernels, under the same row vmap the
batch layer uses.  Kernel spectra are computed identically in both arms
(XLA) — the A/B isolates the transform/pointwise/crop chain.

Usage: python benchmarks/measure_conv_kernel.py [rows] [reps]
       python benchmarks/measure_conv_kernel.py night [rows] [chunk] [reps] [npsflin]

The ``night`` mode times the full pipeline with the fused chain on vs
off in ONE process with alternating reps (both executables warmed
first) — the only way a ~10% effect can be read against the 5-8%
run-to-run chip spread.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = (int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1] != "night" else 25)
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NL = 35
N_IMG = 40
N_KER = 41
LOOP = 32


def slope_time(fn, n_lo=1, n_hi=4, reps=REPS):
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
    from muse_psfr_tpu.otf.convolve import (_dft_convolve_same,
                                            _dft_spectra, _same_fft_size)
    from muse_psfr_tpu.ops.conv_dft import fused_conv_chain

    L = _same_fft_size(N_IMG, N_KER)
    rng = np.random.default_rng(11)
    planes = jnp.asarray(rng.random((ROWS, NL, N_IMG, N_IMG)), jnp.float32)
    ktt = jnp.asarray(rng.random((ROWS, 1, N_KER, N_KER)), jnp.float32)
    ki = jnp.asarray(rng.random((NL, N_KER, N_KER)), jnp.float32)

    results = []
    for prec in ("highest",):
        @jax.jit
        def xla_sum(planes, ktt, ki):
            def one_row(p, kt):
                y = _dft_convolve_same(p, kt, N_IMG, N_KER, precision=prec)
                return _dft_convolve_same(y, ki, N_IMG, N_KER,
                                          precision=prec)

            def body(_, s):
                out = jax.vmap(one_row)(planes * (1.0 + 1e-12 * s), ktt)
                return s + 1e-30 * jnp.sum(out)
            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

        def make_pallas_sum(pack):
            @jax.jit
            def pallas_sum(planes, ktt, ki):
                gi_r, gi_i = _dft_spectra(ki, L, prec)

                def one_row(p, kt):
                    gtt_r, gtt_i = _dft_spectra(kt, L, prec)
                    return fused_conv_chain(p, gtt_r[0], gtt_i[0],
                                            gi_r, gi_i, N_IMG, N_KER,
                                            precision=prec, pack=pack)

                def body(_, s):
                    out = jax.vmap(one_row)(planes * (1.0 + 1e-12 * s),
                                            ktt)
                    return s + 1e-30 * jnp.sum(out)
                return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))
            return pallas_sum

        arms = [("xla", lambda: xla_sum(planes, ktt, ki))]
        for pack in (2, 3, 4):
            f = make_pallas_sum(pack)
            arms.append((f"pallas_p{pack}",
                         lambda f=f: f(planes, ktt, ki)))
        for label, fn in arms:
            t = slope_time(fn)
            results.append({
                "kernel": label, "precision": prec, "rows": ROWS,
                "t_ms": round(1e3 * t / LOOP, 3),
                "t_us_per_row": round(1e6 * t / LOOP / ROWS, 2)})
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_results": len(results)}))


def night():
    import jax
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import process_batch
    from bench import build_rows

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    npsflin = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    lbda = np.linspace(490, 930, 35)
    seeing, GL, L0, mask = build_rows(rows)
    cfgs = {"pallas_conv": GalacsiConfig(),
            "xla_conv": GalacsiConfig(use_pallas_conv=False)}
    times = {k: [] for k in cfgs}
    for name, cfg in cfgs.items():
        t0 = time.perf_counter()
        process_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                      cfg=cfg, chunk=chunk)
        print(json.dumps({"warmup": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    for rep in range(reps):
        for name, cfg in cfgs.items():
            t0 = time.perf_counter()
            process_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                          cfg=cfg, chunk=chunk)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(json.dumps({"rep": rep, "cfg": name,
                              "t_s": round(dt, 4),
                              "rows_per_sec": round(rows / dt, 1)}),
                  flush=True)
    print(json.dumps({
        "rows": rows, "chunk": chunk, "npsflin": npsflin,
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
