"""Ceiling analysis: would per-lambda-chunk OTF windows save real work?

The structure function ``D`` is wavelength-free; the damping exponent is
``0.5 * (2pi/lbda)^2 * D``, so BLUE planes damp harder than red ones and
the minimal safe window radius scales ~ lbda^(6/5).  Today every row's
window is sized once, by the reddest wavelength of the band
(``parallel/batch.py:default_support_bucket``).  The fused zoom kernel
already launches per lambda-chunk, so each launch COULD take a chunk-
specific static sub-window of ``base`` — inside the same executable.

This script measures the ceiling of that idea on the bench night's
telemetry with the exact host-side admission model (``rows_windowable``),
at the production thresh and the 128-lane alignment the fold requires:

  * for rows admitted at S=256 @ 930 nm (the reduced bucket): the largest
    chunk-max wavelength at which S=128 is admitted, per row;
  * for rows NOT admitted at S=256 @ 930 nm (the full bucket): whether
    any reduced S in {256, 384, 512} is admitted at blue chunk maxima.

The implied exp-work saving is then quantified against the per-chunk
window areas.  Run on CPU; ~seconds.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from muse_psfr_tpu.config import GalacsiConfig
from muse_psfr_tpu.parallel.batch import rows_windowable


def main():
    cfg = GalacsiConfig().with_(otf_support=0)
    rng = np.random.default_rng(20260816)
    n = int(os.environ.get("ROWS", "400"))
    seeing = rng.uniform(0.6, 1.6, n)
    GL = rng.uniform(0.3, 0.9, n)
    L0 = rng.uniform(9.0, 29.0, n)
    mask = np.ones((n, 4))
    mask[rng.random(n) < 0.1, 3] = 0.0

    lbda = np.linspace(490, 930, 35)
    # production lambda chunking: k=7 on the windowed bucket -> 5 chunks
    k = 7
    chunk_max = [float(lbda[min(i + k, 35) - 1]) for i in range(0, 35, k)]

    S_bucket = 256
    adm = {}
    for S in (128, 256, 384, 512):
        for lm in set(chunk_max) | {930.0}:
            adm[(S, lm)] = rows_windowable(seeing, GL, L0, mask, lm, cfg, S)

    red = adm[(S_bucket, 930.0)]
    print(f"rows: {n}   windowed bucket (S=256 @ 930nm): {red.sum()} "
          f"({100.0 * red.mean():.1f}%)")

    # --- windowed bucket: per-chunk S=128 admission ----------------------
    area = {S: (2 * S) * (S + 128) for S in (128, 256, 384, 512)}
    base_cost = len(chunk_max) * area[256]
    saved = np.zeros(n)
    print("\nwindowed bucket, per-chunk S=128 admission:")
    for lm in chunk_max:
        sub = adm[(128, lm)][red]
        print(f"  chunk max {lm:6.1f} nm: S=128 ok for {sub.sum():4d}"
              f"/{red.sum()} ({100.0 * sub.mean():5.1f}%)")
    for i in np.nonzero(red)[0]:
        cost = sum(area[128] if adm[(128, lm)][i] else area[256]
                   for lm in chunk_max)
        saved[i] = 1.0 - cost / base_cost
    if red.any():
        print(f"  exp-area saving over the bucket: mean "
              f"{100.0 * saved[red].mean():.1f}%  median "
              f"{100.0 * np.median(saved[red]):.1f}%  "
              f"p90 {100.0 * np.percentile(saved[red], 90):.1f}%")
        # bucket executable must take the max window per chunk over rows
        per_chunk_max = [128 if adm[(128, lm)][red].all() else 256
                         for lm in chunk_max]
        bucket_cost = sum(area[s] for s in per_chunk_max)
        print(f"  bucket-max per-chunk windows: {per_chunk_max} -> "
              f"saving {100.0 * (1 - bucket_cost / base_cost):.1f}% "
              f"(ALL rows of the bucket must admit the smaller window)")

    # --- full bucket: any reduced window at blue chunk maxima ------------
    full = ~red
    print(f"\nfull bucket ({full.sum()} rows): reduced-window admission "
          f"at blue chunk maxima:")
    for S in (256, 384, 512):
        for lm in chunk_max[:3]:
            sub = adm[(S, lm)][full]
            print(f"  S={S} @ {lm:6.1f} nm: {sub.sum():4d}/{full.sum()} "
                  f"({100.0 * sub.mean():5.1f}%)")


if __name__ == "__main__":
    main()
