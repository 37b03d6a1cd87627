"""Pallas fused exp+zoom kernel: interpreter-mode correctness on CPU.

The kernel itself targets TPU; ``interpret=True`` validates the math on
the CPU test backend.  The on-TPU numerical check (1.6e-6 relative vs a
float64 reference) is exercised by the pipeline parity path when
``use_pallas=True`` on real hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from jax.experimental import pallas as pl
from muse_psfr_tpu.ops import zoom_dft


def test_fused_exp_zoom_interpret(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    n, m2 = 512, 32
    rng = np.random.default_rng(3)
    dphi = rng.uniform(0, 40, (n, n)).astype(np.float32)
    dl = rng.uniform(0, 1, (n, n)).astype(np.float32)
    a2 = (rng.normal(size=(m2, n)) / n).astype(np.float32)
    alpha, w = -0.2, 1.3

    u = zoom_dft.fused_exp_zoom(jnp.asarray(dphi), jnp.asarray(dl),
                                jnp.asarray(a2), alpha, w, tile_j=128)
    g = np.exp(alpha * dphi.astype(np.float64)) * dl.astype(np.float64) * w
    ref = a2.astype(np.float64) @ g
    assert_allclose(np.asarray(u, np.float64), ref, rtol=0, atol=5e-7)
