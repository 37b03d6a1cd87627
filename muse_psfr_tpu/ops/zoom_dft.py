"""Pallas TPU kernel: fused direction-averaged OTF x zoom-DFT matmul.

The hot op of the pipeline is, per telemetry row and wavelength chunk,

    G_l = sum_d exp(alpha_l * Dphi_d) * w_{l,d} * dl     (system OTF,
                                                          direction-avgd)
    U_l = A2_l @ G_l                                     (zoom-DFT stage 1)

where Dphi_d is the wavelength-free structure function per evaluation
direction ((ndir, N, N), N=1280), dl the diffraction OTF, A2_l the
(2*2*dimpsf, N) stacked [Ar; Ai] inverse-DFT row matrices of wavelength
l's crop grid, and w_{l,d} the per-direction DC normalisation weights
(reference psfrec.py:667-674 computes one PSF per (lambda, direction) and
averages; the OTF-level average is exact — see otf/psf.py docstring).

Done naively, every (lambda, direction) materialises an (N, N) OTF in HBM
and reads it back (the npsflin=3 case OOMs at production batch sizes).
This kernel builds G tile-by-tile in VMEM: per column tile it accumulates
the direction average for all wavelengths of the chunk (VPU), then
contracts each against its DFT matrix (MXU).  Dphi is read ONCE per
column tile for all ``nl`` wavelengths — HBM traffic drops from
``nl * ndir`` full-grid reads per chunk to one, and nothing G-sized ever
exists in HBM.

Grid: ``(N/TJ, ndir)`` — column tiles are parallel, directions accumulate
sequentially into a VMEM scratch; the matmuls run on the last direction
step.  VMEM at the production shape (nl=7, N=1280, TJ=128):
~4.6 MB scratch + 5.7 MB A2 + ~3 MB pipelined blocks.

The second zoom stage (P_l = U_l[:m] Ar_l^T - U_l[m:] Ai_l^T) is ~16x
smaller and stays in XLA.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(alpha_ref, w_ref, dphi_ref, dl_ref, *rest, precision, exp2):
    # alpha_ref: (nl,) SMEM; w_ref: (nl, ndir) SMEM
    # dphi_ref: (1, N, TJ) — direction d's column slab
    # dl_ref: (N, TJ); then either a2 (nl, 2M, N) f32 ["highest"] or its
    # precomputed bf16 hi/lo split ["high"]; u_ref: (nl, 2M, TJ)
    # gsum_ref: (nl, N, TJ) VMEM scratch, accumulated over direction steps
    a2_ref, u_ref, gsum_ref = rest
    d = pl.program_id(1)
    ndir = pl.num_programs(1)
    nl = gsum_ref.shape[0]
    dp = dphi_ref[0]

    for l in range(nl):
        if exp2:
            # alpha_ref carries alpha*log2(e) and w_ref carries log2(w):
            # exp(alpha*D)*w == exp2(alpha*log2e*D + log2 w), one fma +
            # exp2 instead of mul + exp + mul per element (measured
            # 1.05-1.13x on the full-window ndir=9 production shape,
            # benchmarks/measure_exp2_kernel.py; argument-rounding
            # deviation ~ ln2*|x|*eps, absolutely negligible wherever
            # the OTF is non-negligible)
            contrib = jnp.exp2(alpha_ref[l] * dp + w_ref[l, d])
        else:
            contrib = jnp.exp(alpha_ref[l] * dp) * w_ref[l, d]

        @pl.when(d == 0)
        def _(l=l, contrib=contrib):
            gsum_ref[l] = contrib

        @pl.when(d > 0)
        def _(l=l, contrib=contrib):
            gsum_ref[l] = gsum_ref[l] + contrib

    @pl.when(d == ndir - 1)
    def _():
        dlt = dl_ref[:, :]
        for l in range(nl):
            u_ref[l] = _mxu_contract(a2_ref[l], gsum_ref[l] * dlt,
                                     precision)


def _kernel_dirblock(alpha_ref, w_ref, dphi_ref, dl_ref, *rest,
                     precision, exp2, db):
    """:func:`_kernel` consuming ``db`` directions per grid step: the
    per-step contribution is accumulated in a LOCAL value (one VMEM
    scratch read-modify-write per ``db`` directions instead of one per
    direction) and the two ``pl.when`` branch blocks run once per step.
    Bit-identical math up to the direction-sum association order (a sum
    of ``ndir`` positive damping terms; reassociation is ~1 ulp)."""
    a2_ref, u_ref, gsum_ref = rest
    d = pl.program_id(1)
    nsteps = pl.num_programs(1)
    nl = gsum_ref.shape[0]

    for l in range(nl):
        acc = None
        for dd in range(db):
            dp = dphi_ref[dd]
            if exp2:
                c = jnp.exp2(alpha_ref[l] * dp + w_ref[l, d * db + dd])
            else:
                c = jnp.exp(alpha_ref[l] * dp) * w_ref[l, d * db + dd]
            acc = c if acc is None else acc + c

        @pl.when(d == 0)
        def _(l=l, acc=acc):
            gsum_ref[l] = acc

        @pl.when(d > 0)
        def _(l=l, acc=acc):
            gsum_ref[l] = gsum_ref[l] + acc

    @pl.when(d == nsteps - 1)
    def _():
        dlt = dl_ref[:, :]
        for l in range(nl):
            u_ref[l] = _mxu_contract(a2_ref[l], gsum_ref[l] * dlt,
                                     precision)


def _kernel_dirfull(alpha_ref, w_ref, dphi_ref, dl_ref, a2_ref, u_ref,
                    *, precision, exp2, ndir):
    """Single-step direction-block body (``dir_block == ndir``): the
    whole direction average for wavelength ``l`` is accumulated locally
    and contracted IMMEDIATELY — no accumulation scratch, no branches,
    and wavelength ``l+1``'s exponentials are independent of wavelength
    ``l``'s matmul, so the compiler may overlap VPU and MXU work."""
    nl = u_ref.shape[0]
    dlt = dl_ref[:, :]
    for l in range(nl):
        acc = None
        for dd in range(ndir):
            dp = dphi_ref[dd]
            if exp2:
                c = jnp.exp2(alpha_ref[l] * dp + w_ref[l, dd])
            else:
                c = jnp.exp(alpha_ref[l] * dp) * w_ref[l, dd]
            acc = c if acc is None else acc + c
        u_ref[l] = _mxu_contract(a2_ref[l], acc * dlt, precision)


def _kernel_rowacc(alpha_ref, w_ref, dphi_ref, dl_ref, a2_ref, u_ref,
                   *, precision, exp2, ndir):
    """Row-sliced full-direction-block body: grid ``(J, R)`` where step
    ``r`` holds rows ``[r*h, (r+1)*h)`` of the contraction.  Each
    wavelength's PARTIAL contraction accumulates into the revisited
    output block — ``u_ref``'s index map ignores ``r``, so the block
    stays resident in VMEM across the sequential row steps and the
    partial sums never round-trip HBM (an XLA-level slice-and-add of
    two launches measured a consistent night-level LOSS from exactly
    that traffic).  Splitting the rows is what shrinks the dphi/a2
    blocks until the scratch-free full direction block fits."""
    r = pl.program_id(1)
    nl = u_ref.shape[0]
    dlt = dl_ref[:, :]
    for l in range(nl):
        acc = None
        for dd in range(ndir):
            dp = dphi_ref[dd]
            if exp2:
                c = jnp.exp2(alpha_ref[l] * dp + w_ref[l, dd])
            else:
                c = jnp.exp(alpha_ref[l] * dp) * w_ref[l, dd]
            acc = c if acc is None else acc + c
        contrib = _mxu_contract(a2_ref[l], acc * dlt, precision)

        @pl.when(r == 0)
        def _(l=l, contrib=contrib):
            u_ref[l] = contrib

        @pl.when(r > 0)
        def _(l=l, contrib=contrib):
            u_ref[l] = u_ref[l] + contrib


def _mxu_contract(a2_l, g, precision):
    """One zoom-DFT stage-1 contraction at the requested f32 scheme."""
    dims = (((1,), (0,)), ((), ()))
    if precision == "high":
        # Mosaic rejects Precision.HIGH, so the 3-pass bf16 scheme
        # (hi*hi + hi*lo + lo*hi, f32 accumulation) is spelled out: half
        # the MXU passes of HIGHEST at ~1e-6 relative (the dropped lo*lo
        # term is ~2^-16 relative).
        # PITFALL: the hi/lo split MUST happen inside the kernel (Mosaic)
        # — in XLA on TPU, `a - f32(bf16(a))` is algebraically
        # simplified to zero (the convert round trip is treated as
        # identity), which silently degrades the scheme to one bf16 pass
        # (~3e-3; measured, 2026-08)
        a_hi = a2_l.astype(jnp.bfloat16)
        a_lo = (a2_l - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x, y: jax.lax.dot_general(  # noqa: E731
            x, y, dims, preferred_element_type=jnp.float32)
        return dot(a_hi, g_hi) + dot(a_hi, g_lo) + dot(a_lo, g_hi)
    # single-bf16-pass Mosaic default costs ~3e-3 relative — far outside
    # the accuracy budget; never use "default"
    return jax.lax.dot_general(
        a2_l, g, dims, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _kernel_anchor(astar_ref, coef_ref, dphi_ref, dl_ref, *rest,
                   precision, degree):
    """Anchored-Taylor variant: ONE exp per (direction, tile) — not per
    (wavelength, direction, tile) — with every wavelength's damping
    reconstructed from shared power sums.

    Per direction d the kernel computes ``x = alpha* * Dphi_d`` and
    accumulates ``H_j = sum_d e^x x^j`` for ``j = 0..degree`` into VMEM
    scratch; on the last direction each wavelength's direction-averaged
    OTF is the per-lambda linear combination ``G_l = sum_j coef[l, j]
    H_j`` with host-certified coefficients ``coef[l, j] = w_l *
    (alpha_l/alpha* - 1)^j / j!`` (see otf/psf.py:zoom_anchor_bound for
    the error bound).  The expansion variable is the DIMENSIONLESS
    ``x = alpha* * Dphi`` — expanding in powers of Dphi itself would
    overflow float32 (Dphi ~ 1e5 nm^2, Dphi^8 ~ 1e40) while
    ``|x|^j e^x <= (j/e)^j`` stays small, and wherever ``e^x``
    underflows (x < -87) the true OTF is < 1e-30 of DC, so
    flush-to-zero is harmless.
    """
    a2_ref, u_ref, hsum_ref = rest
    d = pl.program_id(1)
    ndir = pl.num_programs(1)
    nl = u_ref.shape[0]
    x = astar_ref[0] * dphi_ref[0]
    f = jnp.exp(x)
    for j in range(degree + 1):
        @pl.when(d == 0)
        def _(j=j, f=f):
            hsum_ref[j] = f

        @pl.when(d > 0)
        def _(j=j, f=f):
            hsum_ref[j] = hsum_ref[j] + f

        if j < degree:
            f = f * x

    @pl.when(d == ndir - 1)
    def _():
        dlt = dl_ref[:, :]
        for l in range(nl):
            g = coef_ref[l, 0] * hsum_ref[0]
            for j in range(1, degree + 1):
                g = g + coef_ref[l, j] * hsum_ref[j]
            u_ref[l] = _mxu_contract(a2_ref[l], g * dlt, precision)


@partial(jax.jit, static_argnames=("tile_j", "precision", "degree",
                                  "interpret"))
def fused_exp_zoom_anchor(dphi, dl, a2, astar, coef, tile_j: int = 128,
                          precision: str = "highest", degree: int = 8,
                          interpret: bool = False):
    """U[l] = A2[l] @ ((sum_j coef[l,j] H_j) * dl), H_j = sum_d e^x x^j,
    x = astar * Dphi[d] — the anchored-Taylor form of
    :func:`fused_exp_zoom` (cfg.zoom_anchor).  ``astar``: scalar anchor
    alpha (the chunk's midpoint); ``coef``: (nl, degree+1) per-lambda
    reconstruction coefficients with any DC normalisation folded in.
    Certified error: see otf/psf.py:zoom_anchor_bound.
    """
    ndir, n, ncols = dphi.shape
    nl, m2, _ = a2.shape
    assert ncols % tile_j == 0, (ncols, tile_j)
    assert dl.shape[0] == n and dl.shape[1] >= ncols, (dl.shape, n, ncols)
    astar = jnp.asarray(astar, jnp.float32).reshape(1)
    coef = jnp.asarray(coef, jnp.float32)
    assert coef.shape == (nl, degree + 1), (coef.shape, nl, degree)
    if precision not in ("highest", "high"):
        raise ValueError(f"unsupported zoom precision {precision!r}; "
                         "'default' (1-pass bf16) is outside the accuracy "
                         "budget")

    grid = (ncols // tile_j, ndir)
    return pl.pallas_call(
        partial(_kernel_anchor, precision=precision, degree=degree),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n, tile_j), lambda j, d, a, ct: (d, 0, j)),
                pl.BlockSpec((n, tile_j), lambda j, d, a, ct: (0, j)),
                pl.BlockSpec((nl, m2, n), lambda j, d, a, ct: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nl, m2, tile_j),
                                   lambda j, d, a, ct: (0, 0, j)),
            scratch_shapes=[pltpu.VMEM((degree + 1, n, tile_j),
                                       jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nl, m2, ncols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * nl * m2 * n * ncols
                   + 2 * (ndir * (degree + 2)
                          + nl * (degree + 1)) * n * ncols),
            bytes_accessed=4 * (ndir + 1) * n * ncols + 2 * 4 * nl * m2 * n,
            transcendentals=ndir * n * ncols,
        ),
        interpret=interpret,
    )(astar, coef, dphi, dl, a2)


def disc_column_groups(block_mask, tile_j: int = 128,
                       row_block: int = 128):
    """Static column-group decomposition of a diffraction-support mask.

    ``block_mask``: (J, RB) int-like, 1 = live — per column tile the
    live row blocks must be contiguous (the disc-chord property of the
    pupil-autocorrelation support; tiles violating it are treated as
    fully live).  Returns a list of ``(col_lo, col_hi, row_lo, row_hi)``
    element ranges: maximal runs of adjacent column tiles sharing the
    same live row range.  Used by :func:`fused_exp_zoom_disc` to invoke
    the plain kernel per group on statically sliced operands.
    """
    mask = np.asarray(block_mask)
    nj, nrb = mask.shape
    ranges = []
    for j in range(nj):
        live = np.flatnonzero(mask[j])
        if live.size and live.size == live[-1] - live[0] + 1:
            ranges.append((int(live[0]), int(live[-1]) + 1))
        else:                       # empty or non-contiguous: full rows
            ranges.append((0, nrb))
    groups = []
    for j, rng in enumerate(ranges):
        if groups and groups[-1][2:] == (rng[0] * row_block,
                                         rng[1] * row_block):
            lo, hi, rlo, rhi = groups[-1]
            groups[-1] = (lo, (j + 1) * tile_j, rlo, rhi)
        else:
            groups.append((j * tile_j, (j + 1) * tile_j,
                           rng[0] * row_block, rng[1] * row_block))
    return groups


def fused_exp_zoom_disc(dphi, dl, a2, alpha, w, block_mask,
                        tile_j: int = 128, row_block: int = 128,
                        precision: str = "highest", exp2: bool = False,
                        dir_block: int = 1, interpret: bool = False):
    """:func:`fused_exp_zoom` with dead diffraction-support blocks
    skipped by a static column-group split.

    ``block_mask``: (ncols // tile_j, N // row_block) int, 1 = compute,
    0 = the (row_block, tile_j) block of ``dl`` is numerically zero
    there (outside the pupil-autocorrelation disc; see
    otf/psf.py:_disc_block_mask).  Because the dead blocks of each
    column tile sit at the top/bottom of the disc chord, adjacent
    column tiles with identical live row ranges form groups that run
    the UNMODIFIED plain kernel on statically row-sliced operands —
    skipping both the damping exponentials and the contraction FLOPs of
    the dead rows with no in-kernel branching (predicated and
    finer-grid variants measured slower than the savings,
    benchmarks/measure_disc_skip.py).  Exact up to the dropped
    ``|dl| <= 1e-12 * peak`` roundoff support.
    """
    ndir, n, ncols = dphi.shape
    mask = np.asarray(block_mask)
    assert mask.shape == (ncols // tile_j, n // row_block), (
        mask.shape, ncols // tile_j, n // row_block)
    parts = []
    for col_lo, col_hi, row_lo, row_hi in disc_column_groups(
            mask, tile_j, row_block):
        parts.append(fused_exp_zoom(
            dphi[:, row_lo:row_hi, col_lo:col_hi],
            dl[row_lo:row_hi, col_lo:col_hi],
            a2[:, :, row_lo:row_hi], alpha, w, tile_j=tile_j,
            precision=precision, exp2=exp2, dir_block=dir_block,
            interpret=interpret))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


@partial(jax.jit, static_argnames=("tile_j", "precision", "exp2",
                                   "dir_block", "row_splits",
                                   "ndir1_scratch", "interpret"))
def fused_exp_zoom(dphi, dl, a2, alpha, w, tile_j: int = 128,
                   precision: str = "highest", exp2: bool = False,
                   dir_block: int = 1, row_splits: int = 1,
                   ndir1_scratch: bool = False,
                   interpret: bool = False):
    """U[l] = A2[l] @ (sum_d exp(alpha[l]*Dphi[d]) * w[l,d] * dl).

    dphi: (ndir, N, ncols) float32 — ``ncols`` may be less than N under
    the point-symmetry fold (otf/psf.py:_fold_weights): only the first
    ncols columns of the OTF are computed, the caller folds mirrored
    columns into the second zoom stage.  dl: (N, >=ncols) float32; a2:
    (nl, 2M, N) float32 stacked per-wavelength [Ar; Ai] zoom-DFT
    matrices; alpha: (nl,) scalars; w: (nl, ndir) direction weights.
    Returns (nl, 2M, ncols) float32.  G is never materialised and Dphi
    is read once per chunk.

    ``exp2=True`` (cfg.zoom_exp2) evaluates the damping as
    ``exp2(alpha*log2(e)*D + log2 w)`` — fewer VPU ops per element, same
    math up to argument rounding.  Requires ``w >= 0`` (``w = 0`` maps
    to ``log2 0 = -inf`` and a clean flush to zero; the production
    weights ``1/(ndir*norm)`` are strictly positive).

    ``dir_block=db`` (cfg.pallas_dir_block policy) streams ``db``
    directions per grid step (``ndir % db == 0``): the per-step partial
    sum accumulates in a local value, cutting the VMEM scratch
    read-modify-writes and branch blocks ``db``-fold; at ``db == ndir``
    the scratch disappears entirely and each wavelength's MXU
    contraction issues right after its exponentials (VPU/MXU overlap).
    Costs ``db``-fold dphi pipeline VMEM — see the gate in
    otf/psf.py:_pallas_lambda_chunk.  Direction-sum reassociation only
    (~1 ulp; the terms are positive).

    ``ndir1_scratch=True`` restores the legacy direction-accumulating
    body for ``ndir == 1`` launches (which otherwise run the
    scratch-free immediate-contraction body — bit-identical, one fewer
    VMEM round trip per wavelength plane and ~4.6 MB less VMEM at the
    production full window).  Only an A/B escape; wired from an
    explicit integer ``cfg.pallas_dir_block`` in otf/psf.py.

    ``row_splits=R`` (requires ``dir_block == ndir``) adds a SEQUENTIAL
    row-slice grid dimension: step ``r`` computes rows
    ``[r*n/R, (r+1)*n/R)`` and accumulates each wavelength's partial
    contraction into the revisited VMEM-resident output block — the
    dphi/a2 blocks shrink R-fold, which is what lets window heights too
    tall for the single-launch full direction block run it anyway.  One
    extra f32 reassociation of the contraction sum (~2e-7 relative).
    """
    ndir, n, ncols = dphi.shape
    nl, m2, _ = a2.shape
    assert ncols % tile_j == 0, (ncols, tile_j)
    assert dl.shape[0] == n and dl.shape[1] >= ncols, (dl.shape, n, ncols)
    db = int(dir_block) if dir_block else 1
    assert db >= 1 and ndir % db == 0, (ndir, db)
    rs = int(row_splits) if row_splits else 1
    assert rs >= 1 and n % rs == 0 and (n // rs) % 8 == 0, (n, rs)
    alpha = jnp.asarray(alpha, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    if exp2:
        alpha = alpha * jnp.float32(np.log2(np.e))
        w = jnp.log2(w)
    if precision not in ("highest", "high"):
        raise ValueError(f"unsupported zoom precision {precision!r}; "
                         "'default' (1-pass bf16) is outside the accuracy "
                         "budget")

    if rs > 1:
        assert db == ndir, (db, ndir, rs)
        h = n // rs
        grid = (ncols // tile_j, rs)
        return pl.pallas_call(
            partial(_kernel_rowacc, precision=precision, exp2=exp2,
                    ndir=ndir),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((ndir, h, tile_j),
                                 lambda j, r, a, wt: (0, r, j)),
                    pl.BlockSpec((h, tile_j), lambda j, r, a, wt: (r, j)),
                    pl.BlockSpec((nl, m2, h), lambda j, r, a, wt: (0, 0, r)),
                ],
                # index map ignores r: the block is revisited across the
                # sequential row steps and stays resident in VMEM
                out_specs=pl.BlockSpec((nl, m2, tile_j),
                                       lambda j, r, a, wt: (0, 0, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((nl, m2, ncols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=(2 * nl * m2 * n * ncols
                       + 2 * nl * ndir * n * ncols),
                bytes_accessed=(4 * (ndir + 1) * n * ncols
                                + 2 * 4 * nl * m2 * n),
                transcendentals=nl * ndir * n * ncols,
            ),
            interpret=interpret,
        )(alpha, w, dphi, dl, a2)

    nsteps = ndir // db
    grid = (ncols // tile_j, nsteps)
    if nsteps == 1 and not (ndir1_scratch and ndir == 1):
        # db == ndir covers ndir == 1 too: a single direction needs no
        # accumulation at all, so the scratch-free immediate-contraction
        # body applies verbatim (bit-identical math) and the
        # (nl, n, tile_j) VMEM scratch round trip the original body paid
        # per launch disappears (benchmarks/measure_ndir1_body.py);
        # ``ndir1_scratch=True`` (an explicit integer
        # ``cfg.pallas_dir_block`` — see otf/psf.py) keeps the legacy
        # body for A/B measurements.
        kernel = partial(_kernel_dirfull, precision=precision, exp2=exp2,
                         ndir=ndir)
    elif db == 1:
        kernel = partial(_kernel, precision=precision, exp2=exp2)
    else:
        kernel = partial(_kernel_dirblock, precision=precision, exp2=exp2,
                         db=db)
    scratch = ([] if (nsteps == 1 and not (ndir1_scratch and ndir == 1))
               else [pltpu.VMEM((nl, n, tile_j), jnp.float32)])
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((db, n, tile_j), lambda j, d, a, wt: (d, 0, j)),
                pl.BlockSpec((n, tile_j), lambda j, d, a, wt: (0, j)),
                pl.BlockSpec((nl, m2, n), lambda j, d, a, wt: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nl, m2, tile_j),
                                   lambda j, d, a, wt: (0, 0, j)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((nl, m2, ncols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # column tiles are disjoint; directions accumulate in order
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nl * m2 * n * ncols + 2 * nl * ndir * n * ncols,
            bytes_accessed=4 * (ndir + 1) * n * ncols + 2 * 4 * nl * m2 * n,
            transcendentals=nl * ndir * n * ncols,
        ),
        interpret=interpret,
    )(alpha, w, dphi, dl, a2)
