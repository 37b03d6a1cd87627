"""Per-stage device-time profile of the steady-state night pipeline.

Times nested prefixes of the pipeline on a chunk of rows and reports the
difference between consecutive prefixes as the stage cost:

    psd    = simulate_psd                      (PSD assembly, elementwise)
    dphi   = + dphi_base                       (structure-function transform)
    zoom   = + psf_cube's OTF/zoom stage       (exp + zoom-DFT contraction)
    conv   = + convolve_final                  (tip-tilt + instrument Moffat)
    fit    = + fit_moffat_cube_packed          (batched LM)

Each prefix is reduced to one scalar inside the jit so only a scalar is
pulled; device time is measured with the slope method (time N enqueues +
one tiny sync pull, difference of two N) because ``block_until_ready``
does not measure device time reliably over the axon tunnel.

Usage:  python benchmarks/profile_stages.py [rows] [npsflin] [otf_support]
(``otf_support`` e.g. 256 profiles the reduced-window pipeline variant.)
Writes benchmarks/profile_stages_npsflin*.json, one JSON line per stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from muse_psfr_tpu.config import GalacsiConfig
from muse_psfr_tpu.parallel.batch import resolve_fft_mode
from muse_psfr_tpu.psd.model import (simulate_psd, simulate_psd_split,
                                     effective_wind_speed)
from muse_psfr_tpu.otf.psf import (dphi_base, dphi_base_split,
                                   psf_cube_from_base)
from muse_psfr_tpu.otf.convolve import convolve_final
from muse_psfr_tpu.fit.moffat_fit import fit_moffat_cube_packed

R = int(sys.argv[1]) if len(sys.argv) > 1 else 25
NPSFLIN = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SUPPORT = int(sys.argv[3]) if len(sys.argv) > 3 else 0
NL = 35
H = (100, 10000)


def build_prefixes(cfg):
    """Nested prefixes of the PRODUCTION path (reconstruct_one): with
    cfg.use_dphi_split the psd stage yields (w, delta) and the dphi stage
    is the split block transform; otherwise the exact full transform."""
    ws = effective_wind_speed(H, cfg)

    def one_base(r):
        if cfg.use_dphi_split:
            w, delta = simulate_psd_split(r[0], r[1], r[2], r[3:7], H, ws,
                                          NPSFLIN, cfg)
            return dphi_base_split(w, delta, cfg)
        return dphi_base(
            simulate_psd(r[0], r[1], r[2], r[3:7], H, ws, NPSFLIN, cfg), cfg)

    def p_psd(t, lb):
        def one(r):
            if cfg.use_dphi_split:
                w, delta = simulate_psd_split(r[0], r[1], r[2], r[3:7], H,
                                              ws, NPSFLIN, cfg)
                return jnp.sum(w) + jnp.sum(delta)
            return jnp.sum(simulate_psd(r[0], r[1], r[2], r[3:7], H, ws,
                                        NPSFLIN, cfg))
        return jnp.sum(jax.vmap(one)(t))

    def p_dphi(t, lb):
        return jnp.sum(jax.vmap(lambda r: jnp.sum(one_base(r)))(t))

    def p_zoom(t, lb):
        return jnp.sum(jax.vmap(lambda r: jnp.sum(
            psf_cube_from_base(one_base(r), lb, cfg)))(t))

    def p_conv(t, lb):
        def one(r):
            psf = psf_cube_from_base(one_base(r), lb, cfg)
            return jnp.sum(convolve_final(psf, lb, r[0], r[1], r[2], cfg))
        return jnp.sum(jax.vmap(one)(t))

    def p_fit(t, lb):
        def one(r):
            psf = psf_cube_from_base(one_base(r), lb, cfg)
            return convolve_final(psf, lb, r[0], r[1], r[2], cfg)
        cubes = jax.vmap(one)(t)
        return jnp.sum(fit_moffat_cube_packed(cubes, dtype=cfg.fit_dtype))

    return [("psd", p_psd), ("dphi", p_dphi), ("zoom", p_zoom),
            ("conv", p_conv), ("fit", p_fit)]


def slope_time(fn, args, n_lo=2, n_hi=12, reps=3):
    """Per-call seconds via the slope method (median over ``reps``)."""
    def run_n(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(out))          # one tiny sync pull
        return time.perf_counter() - t0

    slopes = []
    for _ in range(reps):
        t_lo = run_n(n_lo)
        t_hi = run_n(n_hi)
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    return float(np.median(slopes))


def main():
    cfg = resolve_fft_mode(GalacsiConfig(otf_support=SUPPORT))
    rng = np.random.default_rng(20260816)
    t = np.concatenate([
        rng.uniform(0.6, 1.6, (R, 1)), rng.uniform(0.3, 0.9, (R, 1)),
        rng.uniform(9.0, 29.0, (R, 1)), np.ones((R, 4))], axis=1)
    t = jnp.asarray(t, cfg.dtype)
    lb = jnp.asarray(np.linspace(490, 930, NL), cfg.dtype)

    results = {"rows": R, "npsflin": NPSFLIN, "nl": NL,
               "otf_support": SUPPORT,
               "device": str(jax.devices()[0]), "use_fft": cfg.use_fft,
               "use_pallas": cfg.use_pallas, "stages": {}}
    prev = 0.0
    for name, fn in build_prefixes(cfg):
        f = jax.jit(fn)
        tc0 = time.perf_counter()
        float(np.asarray(f(t, lb)))     # compile + first run
        compile_s = time.perf_counter() - tc0
        per_call = slope_time(f, (t, lb))
        stage = per_call - prev
        prev = per_call
        results["stages"][name] = {
            "cumulative_s": round(per_call, 5),
            "stage_s": round(stage, 5),
            "stage_ms_per_row": round(1e3 * stage / R, 4),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({"stage": name, **results["stages"][name]}),
              flush=True)

    total = prev
    results["total_s_per_chunk"] = round(total, 5)
    results["rows_per_sec"] = round(R / total, 1)
    tag = f"_s{SUPPORT}" if SUPPORT else ""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"profile_stages_npsflin{NPSFLIN}{tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"total_s_per_chunk": results["total_s_per_chunk"],
                      "rows_per_sec": results["rows_per_sec"]}))


if __name__ == "__main__":
    main()
