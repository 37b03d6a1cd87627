"""Map the PSF FWHM over a (seeing, GL) condition grid and plot it.

Usage: python examples/sensitivity_sweep.py [n_grid] [out.png]
"""

import os
import sys
import time

import numpy as np

from muse_psfr_tpu.api import condition_sweep, save_sweep
from muse_psfr_tpu.config import DEFAULT_CONFIG, TINY_CONFIG

TINY = bool(os.environ.get("MUSE_PSFR_TINY"))
CFG = TINY_CONFIG if TINY else DEFAULT_CONFIG


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (3 if TINY else 16)
    out = sys.argv[2] if len(sys.argv) > 2 else "sweep.png"

    seeing = np.linspace(0.6, 1.6, n)
    gl = np.linspace(0.3, 0.9, n)
    t0 = time.perf_counter()
    res = condition_sweep(seeing, gl, [25.0], lbda=[500.0, 700.0, 900.0],
                          cfg=CFG, checkpoint="sweep_progress.npy")
    print(f"{n * n} conditions in {time.perf_counter() - t0:.2f}s")
    save_sweep(res, "sweep.fits")

    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(14, 4), sharey=True)
    for k, ax in enumerate(axes):
        im = ax.pcolormesh(seeing, gl, res["fwhm"][:, :, 0, k].T,
                           shading="auto")
        ax.set_title(f"FWHM [\"] at {int(res['lbda'][k])} nm")
        ax.set_xlabel("seeing [\"]")
        fig.colorbar(im, ax=ax)
    axes[0].set_ylabel("ground-layer fraction")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, "and sweep.fits")


if __name__ == "__main__":
    main()
