"""Pallas TPU kernel: fused final-PSF convolution chain, lane-packed.

The final-PSF stage (reference convolve_final_psf, psfrec.py:874-930)
convolves each (dimpsf, dimpsf) plane with the residual tip-tilt Moffat
and then the MUSE-intrinsic Moffat — two 'same' linear convolutions,
each exact as a circular DFT product at the minimal alias-free size L
(otf/convolve.py:_same_fft_size; L=64 at production dimpsf=40).

On the XLA path (otf/convolve.py:_dft_convolve_same) every transform is
a batch of (L, L) @ (L, L) matmuls: at L=64 each op uses half the MXU
lanes and half its contraction depth, the left-multiplies cannot fold
their batch into the M dimension without layout transposes (measured
slower under the row vmap), and the intermediate cropped cube makes an
HBM round trip between the two convolutions.

This kernel processes wavelength planes in PAIRS packed along the lane
axis and runs the WHOLE chain (DFT, x tip-tilt spectrum, inverse,
'same' crop, DFT, x intrinsic spectrum, inverse, crop) in VMEM: the
intermediate PSF never exists in HBM, and the support structure is
compiled into trimmed transform matrices:

- the forward transform contracts only over the n=dimpsf nonzero
  rows/columns of the zero-padded planes (K = n, not L);
- the inverse transform computes only the n 'same'-window output rows
  (M = n) and only the n output columns per plane, emitted PRE-PACKED
  at lane offsets (0, n) — the crop is free and every slice the kernel
  takes is lane/sublane aligned.

With W = C - i S (symmetric) and a pair packed as x2 = [X_a | X_b]
(n, 2n), one convolution is

    AB = [C; S][:, :n] @ x2              (2L, n) @ (n, 2n)
    Fr = A @ CRc - B @ CRs               (L, 2n) @ (2n, 2L)
    Fi = -(A @ CRs + B @ CRc)            CR* = plane-block-diagonal
    H  = F * G                           (VPU, packed spectra)
    U  = [C; S][off:off+n rows] @ Hr     (2n, L) @ (L, 2L), same for Hi
    a  = U_top - V_bot,  b = V_top + U_bot          (n, 2L)
    y  = (a @ CDc - b @ CDs) / L^2       (n, 2L) @ (2L, 2n) -> packed

identical operations to the XLA path restricted to its provably-zero /
discarded entries, so the result matches it to accumulation-order
rounding.  The kernel spectra (DFTs of the Moffat kernels) stay in
XLA: the intrinsic spectra are row-independent and hoist out of the
row vmap; the tip-tilt spectrum is one kernel per row (1/nl of the
plane work).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (., K) @ (K, .) at the requested f32 scheme — shared with the zoom
# kernel (single home for the in-kernel bf16 hi/lo splitting pitfall)
from .zoom_dft import _mxu_contract as _dot


def _conv_pack(xp, gr, gi, csn_ref, crc_ref, crs_ref, csel_ref,
               cdc_ref, cds_ref, inv_l2, precision):
    """One lane-packed trimmed circular-DFT 'same' convolution.

    xp: (n, P*n) packed plane group; (gr, gi): (L, P*L) packed kernel
    spectra.  Returns the packed 'same' window (n, P*n).  (A variant
    that merged the matmul pairs into wide single ops through combined
    constant matrices measured SLOWER — the lane-concatenate copies it
    needs cost more than the saved op issues; 45.6 vs 41.2 us/row,
    2026-08-17.)
    """
    L = csn_ref.shape[0] // 2
    ab = _dot(csn_ref[...], xp, precision)              # (2L, P*n)
    a_, b_ = ab[:L], ab[L:]
    fr = _dot(a_, crc_ref[...], precision) - _dot(b_, crs_ref[...],
                                                  precision)
    fi = -(_dot(a_, crs_ref[...], precision) + _dot(b_, crc_ref[...],
                                                    precision))
    hr = fr * gr - fi * gi
    hi = fr * gi + fi * gr
    u = _dot(csel_ref[...], hr, precision)              # (2n, P*L)
    v = _dot(csel_ref[...], hi, precision)
    n = u.shape[0] // 2
    aa = u[:n] - v[n:]
    bb = v[:n] + u[n:]
    return (_dot(aa, cdc_ref[...], precision)
            - _dot(bb, cds_ref[...], precision)) * inv_l2


def _kernel(x_ref, gtt_r_ref, gtt_i_ref, gi_r_ref, gi_i_ref, csn_ref,
            crc_ref, crs_ref, csel_ref, cdc_ref, cds_ref, out_ref, *,
            n_img, pack, precision):
    L = csn_ref.shape[0] // 2
    inv_l2 = 1.0 / (L * L)
    mats = (csn_ref, crc_ref, crs_ref, csel_ref, cdc_ref, cds_ref)
    xp = jnp.concatenate([x_ref[p] for p in range(pack)], axis=1)
    y1 = _conv_pack(xp, gtt_r_ref[...], gtt_i_ref[...], *mats,
                    inv_l2, precision)
    y2 = _conv_pack(y1, gi_r_ref[0], gi_i_ref[0], *mats,
                    inv_l2, precision)
    for p in range(pack):
        out_ref[p] = y2[:, p * n_img:(p + 1) * n_img]


def _trimmed_mats(L: int, n: int, off: int, pack: int):
    """Host-side trimmed transform matrices (see module docstring).

    csn (2L, n): [C; S] columns restricted to the nonzero plane rows.
    crc/crs (P*n, P*L): per-plane block-diagonal right-multiplies of
    the forward transform (Fr = A CRc - B CRs, Fi = -(A CRs + B CRc)).
    csel (2n, L): inverse rows restricted to the 'same' window.
    cdc/cds (P*L, P*n): block-diagonal inverse right-multiplies with
    only the 'same'-window output columns, emitted pre-packed.
    """
    a = np.arange(L)
    ang = np.mod(np.outer(a, a), L) * (2.0 * np.pi / L)
    c = np.cos(ang)
    s = np.sin(ang)
    csn = np.concatenate([c[:, :n], s[:, :n]], axis=0)      # (2L, n)
    crc = np.zeros((pack * n, pack * L))
    crs = np.zeros((pack * n, pack * L))
    cdc = np.zeros((pack * L, pack * n))
    cds = np.zeros((pack * L, pack * n))
    for p in range(pack):
        crc[p * n:(p + 1) * n, p * L:(p + 1) * L] = c[:n, :]
        crs[p * n:(p + 1) * n, p * L:(p + 1) * L] = s[:n, :]
        cdc[p * L:(p + 1) * L, p * n:(p + 1) * n] = c[:, off:off + n]
        cds[p * L:(p + 1) * L, p * n:(p + 1) * n] = s[:, off:off + n]
    csel = np.concatenate([c[off:off + n, :], s[off:off + n, :]],
                          axis=0)                            # (2n, L)
    f32 = np.float32
    return (csn.astype(f32), crc.astype(f32), crs.astype(f32),
            csel.astype(f32), cdc.astype(f32), cds.astype(f32))


@partial(jax.jit, static_argnames=("n_img", "n_ker", "precision",
                                  "pack", "interpret"))
def fused_conv_chain(planes, gtt_r, gtt_i, gi_r, gi_i, n_img: int,
                     n_ker: int, precision: str = "highest",
                     pack: int = 2, interpret: bool = False):
    """Both 'same' convolutions of the final-PSF chain in one launch.

    planes: (nl, n_img, n_img) f32 (nl not divisible by ``pack`` is
    padded internally); gtt_r/gtt_i: (L, L) tip-tilt kernel spectrum
    (shared by all planes); gi_r/gi_i: (nl, L, L) per-plane intrinsic
    kernel spectra, where ``L = _same_fft_size(n_img, n_ker)``.
    ``pack``: planes processed per grid step, lane-packed (the
    block-diagonal right-multiply matrices grow with it — more planes
    per op but proportionally more structural zeros).  Returns
    (nl, n_img, n_img), numerically the XLA path ``_dft_convolve_same(
    _dft_convolve_same(planes, k_tt), k_i)`` (same operations,
    accumulation order aside).
    """
    from ..otf.convolve import _same_fft_size
    if precision not in ("highest", "high"):
        # same contract as fused_exp_zoom: _mxu_contract silently runs
        # HIGHEST for anything but "high", so an unvalidated "default"
        # would mean different numerics on the Pallas path than on the
        # XLA path (which passes the string straight to jnp.matmul)
        raise ValueError(f"unsupported conv precision {precision!r}; "
                         "the fused conv chain supports 'highest' and "
                         "'high'")
    nl = planes.shape[0]
    L = _same_fft_size(n_img, n_ker)
    off = (n_ker - 1) // 2
    assert gtt_r.shape == (L, L) and gi_r.shape == (nl, L, L), (
        gtt_r.shape, gi_r.shape, nl, L)
    mats = tuple(jnp.asarray(m)
                 for m in _trimmed_mats(L, n_img, off, pack))

    ng = -(-nl // pack)
    npad = ng * pack - nl
    if npad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((npad, n_img, n_img), planes.dtype)])
        gi_r = jnp.concatenate(
            [gi_r, jnp.zeros((npad, L, L), gi_r.dtype)])
        gi_i = jnp.concatenate(
            [gi_i, jnp.zeros((npad, L, L), gi_i.dtype)])
    # pack the per-plane intrinsic spectra groupwise along lanes (XLA,
    # row-independent -> hoisted out of the row vmap)
    gi_r2 = gi_r.reshape(ng, pack, L, L).transpose(0, 2, 1, 3) \
        .reshape(ng, L, pack * L)
    gi_i2 = gi_i.reshape(ng, pack, L, L).transpose(0, 2, 1, 3) \
        .reshape(ng, L, pack * L)
    gtt_r2 = jnp.concatenate([gtt_r] * pack, axis=1)        # (L, P*L)
    gtt_i2 = jnp.concatenate([gtt_i] * pack, axis=1)

    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        partial(_kernel, n_img=n_img, pack=pack, precision=precision),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((pack, n_img, n_img), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, pack * L), const),
            pl.BlockSpec((L, pack * L), const),
            pl.BlockSpec((1, L, pack * L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, pack * L), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * L, n_img), const),
            pl.BlockSpec((pack * n_img, pack * L), const),
            pl.BlockSpec((pack * n_img, pack * L), const),
            pl.BlockSpec((2 * n_img, L), const),
            pl.BlockSpec((pack * L, pack * n_img), const),
            pl.BlockSpec((pack * L, pack * n_img), const),
        ],
        out_specs=pl.BlockSpec((pack, n_img, n_img),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ng * pack, n_img, n_img),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * 2 * (2 * L * n_img * pack * n_img
                                + 4 * L * pack * n_img * pack * L
                                + 2 * 2 * n_img * L * pack * L
                                + 2 * n_img * pack * L * pack * n_img),
            bytes_accessed=4 * (2 * nl * n_img * n_img
                                + (ng + 1) * 2 * L * pack * L),
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes.astype(jnp.float32), gtt_r2, gtt_i2, gi_r2, gi_i2, *mats)
    return out[:nl]
