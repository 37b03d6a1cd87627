"""Pallas TPU kernel: fused scaled-exp OTF x zoom-DFT matmul.

The hot op of the pipeline is, per (row, wavelength),

    G = exp(-0.5 * convnm^2 * Dphi) * dl / norm        (the system OTF)
    U_r = Ar @ G ;  U_i = Ai @ G                        (zoom-DFT stage 1)

where Dphi is the wavelength-free structure function (N x N, N=1280), dl
the diffraction OTF, and Ar/Ai the (2*dimpsf, N) inverse-DFT row matrices
of the wavelength's crop grid.  Done naively, G is materialised in HBM and
read twice (once per matmul): ~26 MB of HBM traffic per (row, wavelength).

This kernel computes G tile-by-tile in VMEM (VPU) and immediately contracts
it against both DFT matrices (MXU), so G never exists in HBM: traffic drops
to one read of Dphi/dl per wavelength plus the small A/U arrays — about 2x
less, and the exp is overlapped with the matmuls.

Grid: one program per column tile of G.  Per step the kernel holds the full
contraction dimension (N rows) of a TJ-column slab: Dphi/dl slabs are
(N, TJ) ~ 1.3 MB each, Ar/Ai are resident in full (2*dimpsf, N) ~ 0.8 MB —
well inside VMEM.

The second zoom stage (P = U_r Ar^T - U_i Ai^T, (160, N) x (N, 160)) is
~50x smaller and stays in XLA.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, dphi_ref, dl_ref, a_ref, u_ref):
    # scale_ref: (2,) SMEM — [alpha, weight]; G = exp(alpha*Dphi)*dl*weight
    alpha = scale_ref[0]
    weight = scale_ref[1]
    g = jnp.exp(alpha * dphi_ref[:, :]) * dl_ref[:, :] * weight
    # full-f32 MXU passes: the Mosaic default is a single bfloat16 pass,
    # which costs ~3e-3 relative — far outside the accuracy budget
    u_ref[:, :] = jax.lax.dot_general(
        a_ref[:, :], g, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("tile_j",))
def fused_exp_zoom(dphi, dl, a2, alpha, weight, tile_j: int = 256):
    """U = A2 @ (exp(alpha*Dphi)*dl*weight) with G never materialised.

    dphi, dl: (N, N) float32; a2: (2M, N) float32 — the stacked [Ar; Ai]
    zoom-DFT matrices (one dot feeds the MXU better than two M-row dots);
    alpha, weight: scalars.  Returns (2M, N) float32.
    """
    n = dphi.shape[0]
    m2 = a2.shape[0]
    assert n % tile_j == 0, (n, tile_j)
    scale = jnp.stack([jnp.asarray(alpha, jnp.float32),
                       jnp.asarray(weight, jnp.float32)])

    grid = (n // tile_j,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, tile_j), lambda j, s: (0, j)),
                pl.BlockSpec((n, tile_j), lambda j, s: (0, j)),
                pl.BlockSpec((m2, n), lambda j, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m2, tile_j), lambda j, s: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m2, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # output column tiles are disjoint across grid steps
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m2 * n * n,
            bytes_accessed=2 * 4 * n * n + 2 * 4 * m2 * n,
            transcendentals=n * n,
        ),
    )(scale, dphi, dl, a2)
