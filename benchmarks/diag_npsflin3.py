"""Decompose the npsflin=3 night: per-bucket fused-chunk device time.

Warms the production executables via process_batch, then slope-times
``_fit_chunk`` for the reduced-window and full-window buckets at the
night's real chunk size, to locate the gap between the R=4 stage
profiles and the measured night.

Usage: python benchmarks/diag_npsflin3.py [chunk] [npsflin]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 25
NPSFLIN = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NL = 35
H = (100.0, 10000.0)   # float tuple: must match _plan_batch's static key
                       # so the warmed executables are reused


def slope_time(fn, n_lo=2, n_hi=10, reps=3):
    def run_n(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(out[0]).ravel()[0])
        return time.perf_counter() - t0

    slopes = []
    for _ in range(reps):
        slopes.append((run_n(n_hi) - run_n(n_lo)) / (n_hi - n_lo))
    return float(np.median(slopes))


def main():
    import jax
    import jax.numpy as jnp
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import (process_batch, _fit_chunk,
                                              default_support_bucket,
                                              rows_windowable,
                                              resolve_fft_mode)
    from muse_psfr_tpu.psd.model import effective_wind_speed
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_rows

    cfg = resolve_fft_mode(GalacsiConfig())
    lbda = np.linspace(490, 930, NL)
    seeing, GL, L0, mask = build_rows(100)
    t0 = time.perf_counter()
    process_batch(seeing, GL, L0, mask, lbda, npsflin=NPSFLIN, cfg=cfg,
                  chunk=CHUNK)
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    okw = rows_windowable(seeing, GL, L0, mask, float(lbda.max()), cfg,
                          default_support_bucket(cfg), npsflin=NPSFLIN)
    ws = effective_wind_speed(H, cfg)
    lb = jnp.asarray(lbda, cfg.dtype)
    from muse_psfr_tpu.otf.psf import lambda_crop_size
    npixc = lambda_crop_size(np.asarray(lbda, np.float64), cfg)
    nv = jnp.asarray(CHUNK, jnp.int32)
    table = np.concatenate([seeing[:, None], GL[:, None], L0[:, None],
                            mask], axis=1)
    res = {"chunk": CHUNK, "npsflin": NPSFLIN,
           "windowable": int(okw.sum())}
    for name, sel, gcfg in (
            ("windowed", okw, cfg.with_(otf_support=default_support_bucket(cfg))),
            ("full", ~okw, cfg)):
        if not sel.any():
            print(json.dumps({name: "empty bucket, skipped"}), flush=True)
            res[name] = {"s_per_chunk": 0.0, "ms_per_row": 0.0}
            continue
        rows = table[sel][:CHUNK]
        if rows.shape[0] < CHUNK:
            rows = np.concatenate(
                [rows, np.repeat(rows[-1:], CHUNK - rows.shape[0], 0)], 0)
        t_d = jnp.asarray(rows, gcfg.dtype)
        f = lambda: _fit_chunk(t_d, nv, lb, npixc, H, float(ws),  # noqa: E731
                               NPSFLIN, gcfg, cfg.fit_dtype)
        f()                                     # ensure compiled
        per_chunk = slope_time(f)
        res[name] = {"s_per_chunk": round(per_chunk, 5),
                     "ms_per_row": round(1e3 * per_chunk / CHUNK, 4)}
        print(json.dumps({name: res[name]}), flush=True)

    n_w = int(okw.sum()) // CHUNK + (int(okw.sum()) % CHUNK > 0)
    n_f = int((~okw).sum()) // CHUNK + (int((~okw).sum()) % CHUNK > 0)
    est = n_w * res["windowed"]["s_per_chunk"] + n_f * res["full"]["s_per_chunk"]
    res["est_night_compute_s"] = round(est, 4)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
