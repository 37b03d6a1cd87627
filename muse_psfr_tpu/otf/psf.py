"""PSD -> structure function -> OTF -> PSF chain (JAX, batched).

TPU-native reformulation of reference ``psd_to_psf`` (psfrec.py:689-807) and
``psf_muse`` (644-686).  Three structural optimisations over the reference,
each provably exact (validated against the float64 oracle):

1. **lambda-factored structure function**: the phase covariance is
   ``ifft2(fftshift(psd)) * convnm(lbda)^2`` — the FFT does not depend on
   the wavelength, so one base transform per direction replaces the
   reference's per-(lambda, direction) FFT (psfrec.py:718).

2. **hoisted pupil OTF**: the diffraction OTF (pupil autocorrelation,
   psfrec.py:783-790) is wavelength-independent; the reference recomputes it
   per lambda.

3. **fused direction average**: each direction's PSF is its OTF's inverse
   FFT normalised by the OTF's DC coefficient (``sum(ifft2(X)) = X[0,0]``),
   so the *average over directions of normalised PSFs* is the inverse FFT of
   the average of normalised OTFs — one inverse transform per wavelength
   regardless of the number of directions (psfrec.py:667-674 does
   ndir FFTs).

The lambda-dependent crop-and-regrid (psfrec.py:663-683) is fused into a
single bilinear gather from the full-resolution PSF with traced (dynamic)
coordinates, keeping every shape static under ``jit``.

Only the live branch of the reference is implemented: ``samp == 2 ==
dim/npup`` and ``FoV == FoVnum``.  The reference's oversampling /
extrapolation branches are unreachable in its shipped pipeline and crash if
forced (psfrec.py:738 passes a shape tuple to ``np.zeros`` incorrectly;
psfrec.py:640 raises ``NotImplementedError`` for cubic interpolation); we
reject them explicitly.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GalacsiConfig
from ..core.grids import pupil_mask
from ..utils.log import get_logger

logger = get_logger("otf")


_PUPIL_OTF_CACHE = {}


def pupil_otf(cfg: GalacsiConfig):
    """Diffraction-limited OTF: normalised pupil autocorrelation (dim, dim).

    Image-centred, real.  Matches reference psfrec.py:783-790 (computed
    there per wavelength; hoisted here — it is wavelength-independent).
    A pure function of the static configuration, so it is computed once on
    the host in float64 and becomes a program constant (also keeping the
    device path FFT-free).
    """
    key = (cfg.dim, cfg.npup, cfg.occ, cfg.dtype)
    if key not in _PUPIL_OTF_CACHE:
        c = (cfg.npup - 1) / 2.0
        y = np.arange(cfg.npup)[:, None] - c
        x = np.arange(cfg.npup)[None, :] - c
        rho = np.hypot(y, x) / (cfg.dim / 4.0)
        pup = ((rho < 1.0) & (rho >= cfg.occ)).astype(np.float64)
        tab = np.zeros((cfg.dim, cfg.dim), np.complex128)
        tab[:cfg.npup, :cfg.npup] = pup
        amp = np.abs(np.fft.ifft2(tab)) ** 2
        otf = np.abs(np.fft.fft2(amp)) / pup.sum()
        _PUPIL_OTF_CACHE[key] = np.fft.fftshift(otf).astype(cfg.dtype)
    return jnp.asarray(_PUPIL_OTF_CACHE[key])


_DISC_MASK_CACHE = {}


def _disc_block_mask(cfg: GalacsiConfig, tile_j: int = 128,
                     row_block: int = 128):
    """Live-block mask of the fused zoom kernel over the diffraction
    OTF's support (``cfg.pallas_disc_skip``).

    The system OTF is ``G * dl`` with ``dl`` the pupil autocorrelation
    (:func:`pupil_otf`), supported on the disc of radius ``dim/2``
    centred at ``(dim/2, dim/2)`` — outside it ``dl`` is FFT roundoff
    (<= ~1e-13 of the peak) and the damping exponential is wasted work.
    Under the full window the computed slab is the whole grid, whose
    corner blocks lie outside the disc: ~10% of the slab's
    (row_block=128, tile_j=128) blocks at dim=1280 (the area outside
    the disc is 1 - pi/4 of the corner regions; block quantisation
    keeps ~10 of the 17.9%).  The production windowed bucket sits fully
    inside the disc (corner distance ``S * sqrt(2) < dim/2``) — no dead
    blocks, and this returns None so that path keeps the 2-D-grid
    kernel unchanged.

    Returns an int32 (ncols // tile_j, nrows // row_block) array with
    1 = compute, 0 = dead, or None when there is nothing to skip (or
    the slab is not block-aligned).  A block is dead iff
    ``max |dl_block| <= 1e-12 * max |dl|`` measured on the float64-
    accurate host table — dropping it changes each PSF sample by at
    most ``n_dead_px * 1e-12 * max|G| * (2/dim)^2`` (~5e-13 at the
    production shape, against the pipeline's 3e-8 rms; the damping
    satisfies ``|G| <= ~1`` in DC-normalised units).
    """
    win = cfg.otf_window
    key = (cfg.dim, cfg.npup, cfg.occ, cfg.dtype, win, tile_j, row_block)
    if key in _DISC_MASK_CACHE:
        return _DISC_MASK_CACHE[key]
    pupil_otf(cfg)                       # fill the host-side cache
    dl = _PUPIL_OTF_CACHE[(cfg.dim, cfg.npup, cfg.occ, cfg.dtype)]
    if win is not None:
        r_lo, S = win
        slab = dl[r_lo:r_lo + 2 * S, r_lo:cfg.dim // 2 + 128]
    else:
        slab = dl
    nrows, ncols = slab.shape
    mask = None
    if nrows % row_block == 0 and ncols % tile_j == 0:
        blk = np.abs(slab).reshape(nrows // row_block, row_block,
                                   ncols // tile_j, tile_j)
        bmax = blk.max(axis=(1, 3))                  # (RB, J)
        live = (bmax > 1e-12 * np.abs(dl).max()).T   # (J, RB)
        if not live.all():
            mask = np.ascontiguousarray(live.astype(np.int32))
    _DISC_MASK_CACHE[key] = mask
    return mask


def _centered_idft_np(dim: int, cols=None):
    """Real/imag matrices of the shifted inverse DFT, centred in and out.

    For a real image-centred array X, ``fftshift(ifft2(fftshift(X))).real
    = C X C^T - S X S^T`` where ``C[p, g] = (-1)^(p - N/2 mod N) *
    cos(2 pi ((p - N/2) mod N) g / N) / N`` and similarly for S — the
    (-1)^k factor absorbs the inner fftshift and the row reindexing the
    outer one.  Phases are reduced mod N in int32 for float32 accuracy.

    ``cols=(lo, n)`` restricts to input columns ``lo:lo+n`` — for inputs
    supported on a central block, the transform only needs those columns
    (the block-term optimisation of :func:`dphi_base_split`).
    """
    k = np.mod(np.arange(dim) - dim // 2, dim)
    g = np.arange(dim) if cols is None else np.arange(cols[0],
                                                      cols[0] + cols[1])
    ph = np.mod(np.outer(k, g), dim).astype(np.float64)
    ang = ph * (2.0 * np.pi / dim)
    sign = np.where(k % 2 == 0, 1.0, -1.0)[:, None]
    c = sign * np.cos(ang) / dim
    s = sign * np.sin(ang) / dim
    return c, s


def _centered_idft_matrices(dim: int, dtype, cols=None):
    c, s = _centered_idft_np(dim, cols)
    return jnp.asarray(c, dtype), jnp.asarray(s, dtype)


def _mm(cfg: GalacsiConfig):
    """Matmul with the configured TPU f32 precision (see config.py)."""
    return partial(jnp.matmul,
                   precision=jax.lax.Precision(cfg.matmul_precision))


def _fold_weights(dim: int, S: int, ncw: int, dtype):
    """Column weights of the point-symmetry fold (``cfg.use_sym_fold``).

    Every OTF-side array here is the transform of a real field (PSD,
    structure function, pupil autocorrelation), hence point-symmetric:
    ``G[i, j] = G[(N-i) % N, (N-j) % N]``.  The zoom/dphi contractions'
    per-column terms are then equal in mirrored pairs ``(j, N-j)`` —
    proven from the parity of the DFT row matrices (cos rows even, sin
    rows odd under ``g -> (N-g) % N``) — so summing columns up to N/2
    with mirror weight 2 (columns 0 and N/2 are self-paired; anything
    beyond N/2 is dead tile padding) reproduces the full sum exactly up
    to float-noise asymmetry of the inputs.

    Weights for the ``ncw`` computed columns, global ``[c-S, c+128)``
    with ``c = dim//2`` (``cfg.otf_window``): local ``[0, S)`` -> 2,
    ``S`` (the self-paired centre) -> 1, the tile-pad tail -> 0; when
    the window reaches the grid edge, global column 0 is the self-paired
    Nyquist column -> 1.  Columns outside the window are dropped: under
    ``otf_support`` they hold only |G| below the support threshold.
    """
    v = np.zeros(ncw)
    v[:S] = 2.0
    v[S] = 1.0
    if dim // 2 - S == 0:
        v[0] = 1.0
    return jnp.asarray(v, dtype)


def dphi_base(psd, cfg: GalacsiConfig):
    """Wavelength-free structure function (ndir, dim, dim), image-centred
    ((ndir, dim, cfg.fold_ncols) under the point-symmetry fold — the zoom
    path reconstructs the mirrored columns' contribution exactly).

    ``Dphi(lbda) = convnm(lbda)^2 * dphi_base`` where ``convnm = 2 pi /
    lbda_nm``.  Follows reference psfrec.py:716-722 with the ``convnm``
    factor pulled out of the transform.  With ``cfg.use_fft`` unset, the
    (wavelength-free, per-row) transform runs as two MXU matmuls instead
    of an FFT — exact to rounding, and independent of the TPU runtime's
    FFT custom call.
    """
    dim = cfg.dim
    sampnum = dim / cfg.npup
    L = cfg.dpup * sampnum
    scale = dim * dim / (L * L)
    win = cfg.otf_window
    if cfg.use_fft:
        cdtype = jnp.dtype(cfg.cdtype)
        bg = jnp.fft.ifft2(
            jnp.fft.fftshift(psd, axes=(-2, -1)).astype(cdtype)) * scale
        d = 2.0 * (bg[..., :1, :1].real - bg.real)
        d = jnp.fft.fftshift(d, axes=(-2, -1)).astype(cfg.dtype)
        if win is None:
            return d
        r_lo, S = win
        return d[..., r_lo:r_lo + 2 * S, r_lo:dim // 2 + 128]

    dtype = jnp.dtype(cfg.dtype)
    c, s = _centered_idft_matrices(dim, dtype)
    x = psd.astype(dtype)
    mm = _mm(cfg)
    if win is None:
        # centred Re(bg): C X C^T - S X S^T, batched over the directions
        re_bg = mm(mm(c, x), c.T) - mm(mm(s, x), s.T)
    else:
        # point-symmetry fold (see _fold_weights).  The raw GLAO PSD is
        # NOT f -> -f symmetric (the temporal transfer functions depend
        # on f.v, and the wind direction breaks the parity) — but the
        # real part of its inverse transform equals the transform of the
        # symmetrised PSD, so symmetrising first (elementwise, O(N^2))
        # is exact; (C X_sym) is then even / (S X_sym) odd in the column
        # index and the contraction folds onto columns 0..N/2.  Output
        # restricted to the consumed window rows/cols: >=2.5x fewer
        # matmul FLOPs at dim=1280, more under otf_support
        r_lo, S = win
        r_hi, col_hi = r_lo + 2 * S, dim // 2 + 128
        nh = dim // 2 + 1
        vh = np.full(nh, 2.0)
        vh[0] = vh[-1] = 1.0
        vh = jnp.asarray(vh, dtype)
        xs = 0.5 * (x + jnp.roll(x[..., ::-1, ::-1], (1, 1),
                                 axis=(-2, -1)))
        xh = xs[..., :nh]
        re_bg = (mm(mm(c[r_lo:r_hi], xh) * vh, c[r_lo:col_hi, :nh].T)
                 - mm(mm(s[r_lo:r_hi], xh) * vh, s[r_lo:col_hi, :nh].T))
    bg00 = jnp.sum(x, axis=(-2, -1))[..., None, None] / (L * L)
    return (2.0 * (bg00 - re_bg * scale)).astype(dtype)


_DPHI_BASIS_CACHE = {}
# disk-format version of the host-cached basis tables (bump on any
# change to the formulas below; the full parameter key rides alongside)
_HOST_CACHE_FMT = 1


def _fitting_dphi_basis_np(cfg: GalacsiConfig):
    """Full-grid numpy basis in ``cfg.dtype`` (host cache fill only —
    no device transfer; see :func:`fitting_dphi_basis`)."""
    fitting_dphi_basis(cfg, _fill_only=True)
    key = (cfg.dim, cfg.npup, cfg.dpup, cfg.fc, cfg.dphi_split_degree,
           cfg.dphi_split_l0_min, cfg.dtype)
    return _DPHI_BASIS_CACHE[key]


def fitting_dphi_basis(cfg: GalacsiConfig, _fill_only=False):
    """Structure-function transforms of the fitting-PSD Taylor basis.

    The PSD decomposes as ``sum_k w_k B_k + embed(delta)`` (see
    ``psd/model.py:simulate_psd_split``); since the structure-function
    transform is linear, ``dphi_base(PSD) = sum_k w_k T_k +
    block_transform(delta)`` with ``T_k = dphi_base(B_k)`` precomputed
    here ONCE per configuration — in float64 on the host, becoming
    program constants.  This removes the reference's dominant per-row
    cost (the full-grid transform of the fitting PSD, psfrec.py:144 +
    716-722): the per-row device work drops from a (dim, dim) transform
    to a (dimall, dimall)-supported block transform (~16x fewer FLOPs at
    the production shape).

    Returns a (degree+1, dim, dim) array in the compute dtype.
    """
    from ..core.grids import centered_freq_radius
    from ..core.vonkarman import (fitting_expansion_spec,
                                  fitting_expansion_max_rel_error)
    key = (cfg.dim, cfg.npup, cfg.dpup, cfg.fc, cfg.dphi_split_degree,
           cfg.dphi_split_l0_min, cfg.dtype)
    if key not in _DPHI_BASIS_CACHE:
        err = fitting_expansion_max_rel_error(
            cfg.dphi_split_l0_min, cfg.dphi_split_degree, cfg.fc)
        if err > 1e-7:
            raise ValueError(
                f"fitting-PSD expansion error {err:.2e} exceeds the 1e-7 "
                f"budget for L0 >= {cfg.dphi_split_l0_min}; raise "
                f"dphi_split_degree or dphi_split_l0_min")
        from ..utils.compile_cache import (host_cache_load,
                                           host_cache_store)
        dkey = (_HOST_CACHE_FMT,) + key
        hit = host_cache_load("dphi_basis", dkey)
        if hit is not None:
            _DPHI_BASIS_CACHE[key] = hit["basis"]
        else:
            dim = cfg.dim
            sampnum = dim / cfg.npup
            L = cfg.dpup * sampnum
            scale = dim * dim / (L * L)
            f = centered_freq_radius(dim, 2.0 * cfg.dpup)
            mask = (f >= cfg.fc).astype(np.float64)
            u0, binoms = fitting_expansion_spec(cfg.dphi_split_l0_min,
                                                cfg.dphi_split_degree)
            f2u = f * f + u0
            ts = []
            for k in range(len(binoms)):
                b = mask * f2u ** (-11.0 / 6.0 - k)
                bg = np.fft.ifft2(np.fft.fftshift(b)).real * scale
                t = 2.0 * (bg[0, 0] - bg)
                ts.append(np.fft.fftshift(t))
            _DPHI_BASIS_CACHE[key] = np.stack(ts).astype(cfg.dtype)
            host_cache_store("dphi_basis", dkey,
                             {"basis": _DPHI_BASIS_CACHE[key]})
    if _fill_only:
        return None
    arr = _DPHI_BASIS_CACHE[key]
    win = cfg.otf_window
    if win is None:
        return jnp.asarray(arr)
    r_lo, S = win
    return jnp.asarray(arr[..., r_lo:r_lo + 2 * S,
                           r_lo:cfg.dim // 2 + 128])


_BASIS_RING_CACHE = {}


def fitting_dphi_ring_envelopes(cfg: GalacsiConfig):
    """Ring-wise min/max of the fitting structure-function basis (host).

    For each basis transform ``T_k`` (see :func:`fitting_dphi_basis`) and
    each inf-norm radius ``r = max(|i-c|, |j-c|)`` in ``0..dim/2``,
    returns float64 ``(tmin, tmax)`` of shape (degree+1, dim/2+1): the
    minimum/maximum of ``T_k`` over the ring.  Used by the host-side OTF
    support estimator (``parallel/batch.py:estimate_otf_support``) to
    lower-bound ``D_fit = sum_k w_k T_k`` over each ring regardless of
    the signs of the telemetry-dependent weights.
    """
    key = (cfg.dim, cfg.npup, cfg.dpup, cfg.fc, cfg.dphi_split_degree,
           cfg.dphi_split_l0_min)
    if key not in _BASIS_RING_CACHE:
        from ..utils.compile_cache import (host_cache_load,
                                           host_cache_store)
        dkey = (_HOST_CACHE_FMT,) + key
        hit = host_cache_load("dphi_rings", dkey)
        if hit is not None:
            _BASIS_RING_CACHE[key] = (hit["tmin"], hit["tmax"])
            return _BASIS_RING_CACHE[key]
        arr = _fitting_dphi_basis_np(cfg.with_(dtype="float64"))
        c = cfg.dim // 2
        ii = np.abs(np.arange(cfg.dim) - c)
        ring = np.maximum(ii[:, None], ii[None, :]).ravel()
        flat = arr.reshape(arr.shape[0], -1)
        # segment reductions via sort + reduceat (ufunc.at is ~100x
        # slower at these sizes); every ring 0..c is non-empty
        order = np.argsort(ring, kind="stable")
        bounds = np.searchsorted(ring[order], np.arange(c + 1))
        tmin = np.stack([np.minimum.reduceat(flat[k][order], bounds)
                         for k in range(arr.shape[0])])
        tmax = np.stack([np.maximum.reduceat(flat[k][order], bounds)
                         for k in range(arr.shape[0])])
        _BASIS_RING_CACHE[key] = (tmin, tmax)
        host_cache_store("dphi_rings", dkey, {"tmin": tmin, "tmax": tmax})
    return _BASIS_RING_CACHE[key]


def dphi_base_split(w, delta, cfg: GalacsiConfig):
    """Wavelength-free structure function from the split PSD form.

    ``w``: (degree+1,) traced fitting-basis weights; ``delta``: (ndir,
    dimall, dimall) correction-zone excess [nm^2].  Exactly equivalent
    (to the certified <=1e-7 expansion error) to
    ``dphi_base(simulate_psd(...))`` — the full-grid transform is folded
    into precomputed constants and only the centrally-supported block
    term is transformed on device, using just the relevant columns of
    the inverse-DFT matrices.
    """
    dtype = jnp.dtype(cfg.dtype)
    dim = cfg.dim
    sampnum = dim / cfg.npup
    L = cfg.dpup * sampnum
    scale = dim * dim / (L * L)

    T = fitting_dphi_basis(cfg)                 # (K+1, dim, dim or ncols)
    shared = jnp.sum(w.astype(dtype)[:, None, None] * T, axis=0)

    lo = dim // 2 - cfg.dim_pup
    s = delta.shape[-1]
    mm = _mm(cfg)
    x = delta.astype(dtype)                              # (ndir, s, s)
    bg00 = jnp.sum(x, axis=(-2, -1))[..., None, None] / (L * L)
    win = cfg.otf_window
    if win is None:
        c_blk, s_blk = _centered_idft_matrices(dim, dtype, cols=(lo, s))
        re_blk = (mm(mm(c_blk, x), c_blk.T)
                  - mm(mm(s_blk, x), s_blk.T))           # (ndir, dim, dim)
    else:
        # fold (see dphi_base): symmetrise the correction block first —
        # delta is NOT f -> -f symmetric (temporal terms), and its global
        # mirror spans [lo, lo + s], one column/row wider than the block,
        # so pad by one before folding; then emit only the window
        # rows/columns the zoom path reads (the Re-transform of the
        # unfolded path symmetrises implicitly, so this is exact)
        r_lo, S = win
        r_hi, col_hi = r_lo + 2 * S, dim // 2 + 128
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1)))
        xs = 0.5 * (xp + xp[..., ::-1, ::-1])            # (ndir, s+1, s+1)
        c_blk, s_blk = _centered_idft_matrices(dim, dtype,
                                               cols=(lo, s + 1))
        re_blk = (mm(mm(c_blk[r_lo:r_hi], xs), c_blk[r_lo:col_hi].T)
                  - mm(mm(s_blk[r_lo:r_hi], xs), s_blk[r_lo:col_hi].T))
    return (shared[None] + 2.0 * (bg00 - re_blk * scale)).astype(dtype)


def lambda_crop_size(lbda_nm, cfg: GalacsiConfig):
    """Even crop size ``npixc(lbda)`` in px (reference psfrec.py:663-664).

    QUIRK: ``np.round`` is round-half-to-even (banker's rounding); the grid
    of MUSE wavelengths lands on .5 boundaries for some ``nl``.  Parity
    therefore requires the quotient AND the rounding in float64 — a
    float32 quotient can land on the wrong side of an exact-in-f64 .5
    boundary, shifting ``npixc`` by 2 and every pixel of that plane's
    regrid.  Concrete inputs compute on the host in float64; traced
    inputs (inside jit, where TPU only has f32) keep the in-graph form —
    the production entry points precompute ``npixc`` on the host and
    pass it through (``parallel/batch.py::_plan_batch`` ->
    ``psf_cube_from_base(npixc=...)``).
    """
    scale = cfg.dimpsf * cfg.pixscale * 2.0 * cfg.dpup * 4.85 * 1000.0
    if not isinstance(lbda_nm, jax.core.Tracer):
        # stay on the HOST (numpy): wrapping in jnp here pushes to the
        # device and the planner's np.asarray pulls straight back — a
        # ~30 ms round trip per batch plan on a tunneled TPU
        raw = scale / np.asarray(lbda_nm, np.float64)
        return (np.round(raw / 2.0) * 2.0).astype(np.int32)
    raw = scale / lbda_nm
    return (jnp.round(raw / 2.0) * 2.0).astype(jnp.int32)


def _bilinear_regrid(img, start, step, nout: int):
    """out[i,j] = bilinear(img, (start + i*step, start + j*step)).

    ``start``/``step`` may be traced scalars; shapes are static.  Replaces
    the reference's crop + ``scipy.interpn`` regrid (psfrec.py:672-683) with
    one gather, exactly (the reference's in/out transposes cancel).
    """
    pos = start + jnp.arange(nout, dtype=img.dtype) * step
    i0 = jnp.floor(pos)
    t = (pos - i0).astype(img.dtype)
    i0 = jnp.clip(i0.astype(jnp.int32), 0, img.shape[0] - 2)
    rows = (jnp.take(img, i0, axis=0) * (1.0 - t)[:, None]
            + jnp.take(img, i0 + 1, axis=0) * t[:, None])
    return (jnp.take(rows, i0, axis=1) * (1.0 - t)[None, :]
            + jnp.take(rows, i0 + 1, axis=1) * t[None, :])


def _psf_plane_fft(mean_otf_centered, cfg):
    """Full-resolution PSF plane from the direction-averaged OTF (centred)."""
    sys_otf = jnp.fft.fftshift(mean_otf_centered).astype(cfg.cdtype)
    psf = jnp.fft.ifft2(sys_otf).real.astype(cfg.dtype)
    return jnp.fft.fftshift(psf)


def _zoom_dft_matrices(idx, dim: int, dtype):
    """Real/imag inverse-DFT row matrices for a set of PSF pixel indices.

    For centred PSF index p and centred OTF index g, the double-fftshifted
    inverse FFT gives  psf[p, q] = Re sum_g G[g1, g2] A[p, g1] A[q, g2]
    with A[p, g] = exp(2i pi (p - N/2)(g + N/2) / N) / N.  With G real this
    is two real matmuls:  P = Ar G Ar^T - Ai G Ai^T  — MXU work instead of
    a full N^2 inverse FFT per wavelength, exact to rounding.

    The phase is reduced mod N in int32 before the trig for full float32
    accuracy.  ``idx`` may be traced (the crop grid is wavelength-dependent).
    """
    kk = (idx.astype(jnp.int32) - dim // 2)[:, None]            # (npts, 1)
    gg = (jnp.arange(dim, dtype=jnp.int32) + dim // 2)[None, :]  # (1, N)
    ph = jnp.mod(kk * gg, dim).astype(dtype)
    ang = ph * (2.0 * np.pi / dim)
    return jnp.cos(ang) / dim, jnp.sin(ang) / dim


def _combine_bilinear(p, t, nout: int):
    """(2*nout, 2*nout) PSF node values -> (nout, nout) bilinear samples."""
    w0 = (1.0 - t)
    return (w0[:, None] * w0[None, :] * p[:nout, :nout]
            + w0[:, None] * t[None, :] * p[:nout, nout:]
            + t[:, None] * w0[None, :] * p[nout:, :nout]
            + t[:, None] * t[None, :] * p[nout:, nout:])


def _pallas_lambda_chunk(cfg: GalacsiConfig, nrows: int,
                         anchor: bool = False,
                         ndir1_free: bool = False) -> int:
    """Largest wavelength-chunk size whose fused-kernel VMEM budget
    fits: the a2 block, the accumulation scratch, and the double-
    buffered dphi/dl/u pipeline blocks (~16 MB/core on TPU).  The
    dim=1280 full-window production case (~15.2 MB at chunk 7) is known
    to fit; larger grids with the full window (e.g. dim=2048) would
    blow up — shrink the chunk instead of crashing in Mosaic, and
    report 0 when not even one wavelength fits (callers then fall back
    to the XLA zoom path).

    ``anchor``: the anchored-Taylor kernel's scratch holds the
    (degree+1) shared power sums instead of one accumulator per
    wavelength — chunk-size-independent, so it moves from the per-k
    term to the fixed budget (the dim=1280 FULL-window case then fits
    chunk 5; the windowed production case keeps 7).  The anchor budget
    is calibrated lower: Mosaic reported 16.18M > the 16M scoped-vmem
    limit for the full-window anchor kernel at chunk 6 (measured
    2026-08), i.e. ~0.8M of unmodelled overhead on top of this
    formula's blocks."""
    m2, tj = 4 * cfg.dimpsf, 128
    if ndir1_free and not anchor:
        # scratch-free single-direction body (_kernel_dirfull at
        # ndir=1): no accumulation scratch and no per-wavelength
        # scratch term — only the resident a2 block, the
        # double-buffered u output, and the dphi/dl pipeline blocks.
        # Calibrated against a measured compile: the dim=1280
        # full-window shape (nrows=1280) fits chunk 12 (~14.4 MB;
        # benchmarks/measure_ndir1_body.py) where the scratch body
        # OOMed Mosaic — this model admits exactly 12 there.
        per_k = 4 * (m2 * nrows + 2 * m2 * tj)
        fixed = 4 * 2 * 2 * nrows * tj              # dphi + dl blocks
        return max(0, (15_000_000 - fixed) // per_k)
    per_k = 4 * (m2 * nrows + nrows * tj + 2 * 2 * m2 * tj)
    fixed = 4 * 2 * 2 * nrows * tj                  # dphi + dl blocks
    budget = 15_800_000  # calibrated: the known-fitting production
    #                      exact-kernel case keeps chunk 7
    if anchor:
        per_k -= 4 * nrows * tj
        fixed += 4 * (cfg.zoom_anchor_degree + 1) * nrows * tj
        budget = 15_000_000
    return max(0, (budget - fixed) // per_k)


def _pallas_dir_block(cfg: GalacsiConfig, nrows: int, ndir: int,
                      k: int) -> int:
    """Directions per fused-kernel grid step (ops/zoom_dft.py
    ``fused_exp_zoom(dir_block=...)``): the largest divisor of ``ndir``
    whose VMEM budget fits at the ALREADY-CHOSEN wavelength chunk ``k``
    — the chunk policy stays primary because shrinking the chunk to
    admit a bigger block is a measured loss (full window: db=1@k7
    29.9 us/lambda beats db=3@k5 31.0 and db=1@k5 33.7;
    benchmarks/measure_dir_block.py).  Same block model as
    :func:`_pallas_lambda_chunk`, with the dphi pipeline blocks scaled
    by ``db``; ``db == ndir`` drops the accumulation scratch but uses
    the anchor-calibrated lower budget (Mosaic reported 16.20M > the
    16M scoped-vmem limit for the full-window db=9 case at k=2 that
    this formula would otherwise admit at 15.4M)."""
    sel = cfg.pallas_dir_block
    if not sel or sel == 1:
        return 1
    if sel != "auto":
        db = int(sel)
        if db < 1 or ndir % db:
            raise ValueError(
                f"pallas_dir_block={sel!r} must divide ndir={ndir}")
        return db
    m2, tj = 4 * cfg.dimpsf, 128
    for db in range(ndir, 0, -1):
        if ndir % db:
            continue
        single = db == ndir and db > 1          # scratch-free kernel body
        per_k = 4 * (m2 * nrows + 2 * 2 * m2 * tj)
        budget = 15_000_000 if single else 15_800_000
        if not single:
            per_k += 4 * nrows * tj             # accumulation scratch
        fixed = 4 * (2 * db + 2) * nrows * tj   # dphi + dl blocks
        if fixed + per_k * k <= budget:
            return db
    return 1


def _pallas_zoom_plan(cfg: GalacsiConfig, nrows: int, ndir: int, k: int):
    """(row_splits, dir_block, tile_j) for the fused zoom launch.

    When the scratch-free full direction block (``db == ndir``) does
    not fit at ``nrows``, the contraction rows can be SPLIT into equal
    slices — each slice is an independent launch whose partial zoom
    outputs sum exactly (one extra f32 reassociation of the
    contraction, ~2e-7 relative) — shrinking every per-row VMEM term
    until the full block fits.  Measured at the dim=1280 full-window
    production shape (9, 1280, 768) k=7: two 640-row db=9 launches run
    1.42x the single db=1 launch (29.0 -> 20.4 us/lambda) while
    db=3-with-scratch LOSES (33.7) — so the plan only ever splits for
    the full block, and only under "auto" (an explicit integer
    ``pallas_dir_block`` keeps the user's single-launch layout).

    ``tile_j``: always 128.  A 256-column tile on the single-direction
    full-grid shape measured 1.07x in ISOLATION ((1, 1280, 768) k=7:
    8.38 -> 7.80 us/lambda) but 0.981 paired median at night level
    (7/10 pairs below 1 on a clean chip) — the wide tile pipelines
    worse under the row vmap — and every ndir=9 256-column variant
    fails to compile (VMEM).  MEASURED NEGATIVE end-to-end; the
    ``tile_j`` plumbing stays for experiments (RESULTS.md)."""
    db = _pallas_dir_block(cfg, nrows, ndir, k)
    if (db == ndir or ndir == 1 or cfg.pallas_dir_block != "auto"):
        # ndir == 1 never splits or blocks, but under "auto" it still
        # runs the scratch-free body and the bigger wavelength chunk —
        # see _psf_chunk_pallas (ndir1_scratch) and _pallas_lambda_chunk
        # (ndir1_free)
        return 1, db, 128
    m2, tj = 4 * cfg.dimpsf, 128
    for splits in (2, 4):
        h = nrows // splits
        if nrows % splits or h % 128:
            continue
        # row-accumulating kernel blocks: a2 is sliced over the row
        # steps (so double-buffered, unlike the single-launch kernel's
        # one resident block), dphi carries all ndir directions, and the
        # revisited output block never leaves VMEM; anchor-calibrated
        # budget as for the scratch-free body
        per_k = 4 * (2 * m2 * h + 2 * 2 * m2 * tj)
        fixed = 4 * (2 * ndir + 2) * h * tj
        if fixed + per_k * k <= 15_000_000:
            return splits, ndir, 128
    return 1, db, 128


def _pallas_chunk_policy(cfg: GalacsiConfig, k_fit: int) -> int:
    """The wavelength-chunk CAP for the fused Pallas kernel given its
    VMEM-fit chunk ``k_fit``: ``pallas_lambda_chunk`` when that fits in
    full, else the ``lambda_chunk`` default.  Rationale in
    :func:`psf_cube_from_base` (measured k=12 fast, k=9 slow, k=7
    baseline at the dim=1280 windowed shape)."""
    cap = cfg.pallas_lambda_chunk or cfg.lambda_chunk
    return cap if k_fit >= cap else cfg.lambda_chunk


def _anchor_lambda_chunk(cfg: GalacsiConfig, nl: int, nrows: int) -> int:
    """The wavelength chunk size ``psf_cube_from_base`` will use on the
    anchored Pallas path — shared with the host-side certification
    (:func:`resolve_zoom_anchor`), which must predict the exact chunking
    the traced code performs."""
    k_fit = _pallas_lambda_chunk(cfg, nrows, anchor=True)
    if k_fit < 1:
        return 0
    return max(1, min(_pallas_chunk_policy(cfg, k_fit), k_fit, nl))


def zoom_anchor_bound(lbda_nm, k: int, degree: int) -> float:
    """Certified per-pixel OTF abs-error bound of the anchored-Taylor
    damping evaluation (cfg.zoom_anchor), maximised over wavelength
    chunks.

    Per chunk of ``k`` wavelengths, the kernel evaluates ``e^{alpha_l D}
    = e^x sum_j u^j/j!`` truncated at ``degree``, with ``x = alpha* D``
    (``alpha* = (alpha_min + alpha_max)/2`` of the chunk) and ``u =
    (alpha_l/alpha* - 1) x``.  With ``r = max_l |alpha_l/alpha* - 1|``
    and ``t = -x >= 0`` (alpha < 0, D >= 0), the truncation error is

        |e^x| * |R_degree(u)| <= e^{-t} (r t)^{p}/p! * e^{r t},  p = degree+1

    whose supremum over t >= 0 (at ``t = p/(1-r)``) is

        bound = (r p / (1 - r))^p  e^{-p} / p!

    — uniform in the structure function D, so it certifies every pixel,
    every direction, and every telemetry row at once.  The MUSE grid's
    bluest chunk (k=7 of 35 over 465-930 nm) has r = 0.161, giving
    ~5e-8 at the default degree 8 (budget 1e-6, pipeline rms 3e-8).
    Interpolating in alpha across anchor wavelengths instead (the other
    natural scheme) is far worse: its error lacks the 1/p! factor and
    peaks where e^{alpha D} is O(1) — measured ~1e-3 for quadratic
    interpolation at the same anchor spacing.

    Returns +inf when any chunk has r >= 1 (anchor outside the
    convergence-bound regime; cannot happen for a chunk of consecutive
    MUSE wavelengths).
    """
    from math import factorial
    lb = np.asarray(lbda_nm, np.float64).ravel()
    if lb.size == 0 or not np.all(np.isfinite(lb)) or np.any(lb <= 0):
        return np.inf
    pad = (-lb.size) % k
    if pad:
        lb = np.concatenate([lb, np.repeat(lb[-1], pad)])
    al = -0.5 * (2.0 * np.pi / lb) ** 2
    p = degree + 1
    worst = 0.0
    for c in al.reshape(-1, k):
        astar = 0.5 * (c.min() + c.max())
        r = np.max(np.abs(c / astar - 1.0))
        if r >= 1.0:
            return np.inf
        worst = max(worst, (r * p / (1.0 - r)) ** p
                    * np.exp(-p) / factorial(p))
    return worst


def resolve_zoom_anchor(cfg: GalacsiConfig, lbda_nm, ndir: int):
    """Resolve ``cfg.zoom_anchor == "auto"`` on the host: "on" iff the
    Pallas path is active, the direction count amortises the anchor exp
    (``ndir >= cfg.zoom_anchor_min_ndir``), and the certified error
    bound (:func:`zoom_anchor_bound`, at the exact chunking the traced
    code will use) is within ``cfg.zoom_anchor_budget``.  Needs the
    concrete wavelength grid, so it runs where lambda is still a host
    array (the batch layer's planning step); jitted entry points that
    only ever see traced wavelengths treat "auto" as off.
    """
    if cfg.zoom_anchor != "auto":
        return cfg
    # a negative resolution KEEPS "auto" (treated as off at trace time)
    # instead of rewriting to "off": the static jit key — and hence every
    # already-compiled non-anchored executable — stays unchanged
    if ndir < cfg.zoom_anchor_min_ndir:
        return cfg
    if not (cfg.use_pallas and cfg.use_zoom_dft and cfg.dtype == "float32"
            and cfg.dim % 128 == 0
            and jax.default_backend() in ("tpu",)):
        return cfg
    win = cfg.otf_window
    nrows = cfg.dim if win is None else 2 * win[1]
    lb = np.asarray(lbda_nm, np.float64).ravel()
    k = _anchor_lambda_chunk(cfg, lb.size, nrows)
    if k < 1:
        return cfg
    bound = zoom_anchor_bound(lb, k, cfg.zoom_anchor_degree)
    if bound > cfg.zoom_anchor_budget:
        logger.warning(
            "zoom_anchor auto-disabled: certified bound %.2e exceeds "
            "budget %.2e (degree %d, chunk %d)", bound,
            cfg.zoom_anchor_budget, cfg.zoom_anchor_degree, k)
        return cfg
    return cfg.with_(zoom_anchor="on")


def _psf_chunk_pallas(base, dl, lb_k, npix_k, cfg, dir_block=1,
                      row_splits=1, tile_j=128, interpret=False):
    """Fused Pallas path for one wavelength chunk: the direction-averaged
    system OTF is built tile-by-tile in VMEM and contracted on the MXU —
    it never exists in HBM, and the structure function is read once per
    chunk instead of once per (wavelength, direction).

    ``base``: (ndir, 2S, S+128) windowed structure function
    (``cfg.otf_window``); ``lb_k``/``npix_k``: (k,) wavelengths [nm]
    and crop sizes.  Returns (k, dimpsf, dimpsf) normalised PSF samples.
    """
    from ..ops.zoom_dft import fused_exp_zoom
    dtype = jnp.dtype(cfg.dtype)
    dim = cfg.dim
    ndir = base.shape[0]
    nout = cfg.dimpsf
    win = cfg.otf_window
    if win is not None:
        r_lo, S = win
        r_hi, col_hi = r_lo + 2 * S, dim // 2 + 128
    else:                                       # unfolded: full grid
        r_lo, r_hi, col_hi, S = 0, dim, dim, dim // 2

    start = (dim // 2 - npix_k // 2).astype(dtype)           # (k,)
    step = npix_k.astype(dtype) / nout
    pos = start[:, None] + jnp.arange(nout, dtype=dtype)[None] * step[:, None]
    i0f = jnp.floor(pos)
    t = (pos - i0f).astype(dtype)                            # (k, nout)
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, dim - 2)
    idx = jnp.concatenate([i0, i0 + 1], axis=1)              # (k, 2*nout)
    ar, ai = jax.vmap(lambda ix: _zoom_dft_matrices(ix, dim, dtype))(idx)
    a2 = jnp.concatenate([ar, ai], axis=1)[..., r_lo:r_hi]  # (k, 4nout, 2S)

    alpha = -0.5 * (2.0 * np.pi / lb_k.astype(dtype)) ** 2   # (k,)
    c = dim // 2
    if cfg.zoom_anchor == "on":
        # anchored-Taylor damping (see ops/zoom_dft.py:_kernel_anchor and
        # :func:`zoom_anchor_bound`): one exp per direction per chunk.
        # Shifting each direction's structure function by its centre
        # value makes the per-direction DC normaliser
        # exp(alpha_l * D_d(centre)) exactly 1 — the same factor the
        # exact path divides out — so the weights lose their direction
        # dependence and fold into the reconstruction coefficients.
        from ..ops.zoom_dft import fused_exp_zoom_anchor
        from math import factorial
        cc = c - r_lo
        base_s = base - base[:, cc, cc][:, None, None]
        astar = 0.5 * (jnp.min(alpha) + jnp.max(alpha))
        rho1 = alpha / astar - 1.0                           # (k,)
        deg = cfg.zoom_anchor_degree
        fact = jnp.asarray([factorial(j) for j in range(deg + 1)], dtype)
        # rho1^j by cumulative product (lax.pow on a negative base with a
        # float exponent is exp(j log x) -> NaN)
        cols = [jnp.ones_like(rho1)]
        for _ in range(deg):
            cols.append(cols[-1] * rho1)
        coef = (jnp.stack(cols, axis=1) / fact[None, :]
                / (ndir * dl[c, c]))                         # (k, deg+1)
        u = fused_exp_zoom_anchor(base_s, dl[r_lo:r_hi, r_lo:col_hi], a2,
                                  astar, coef,
                                  precision=cfg.zoom_precision,
                                  degree=deg, interpret=interpret)
    else:
        norm = jnp.exp(alpha[:, None] * base[None, :, c - r_lo, c - r_lo]) \
            * dl[c, c]
        w = 1.0 / (ndir * norm)                              # (k, ndir)
        msk = (_disc_block_mask(cfg)
               if (cfg.pallas_disc_skip
                   and ndir >= cfg.pallas_disc_min_ndir) else None)
        if msk is not None:
            from ..ops.zoom_dft import fused_exp_zoom_disc
            # the disc split runs UNSPLIT rows: a direction block that
            # only fits under a row split must not reach it
            db_disc = 1 if row_splits > 1 else dir_block
            u = fused_exp_zoom_disc(base, dl[r_lo:r_hi, r_lo:col_hi],
                                    a2, alpha, w, msk,
                                    precision=cfg.zoom_precision,
                                    exp2=cfg.zoom_exp2,
                                    dir_block=db_disc,
                                    interpret=interpret)
        else:
            # row_splits > 1 adds a sequential in-kernel row-slice grid
            # dimension accumulating into the VMEM-resident output block
            # — what admits the scratch-free full direction block at
            # window heights whose single-slice VMEM would not fit (see
            # _pallas_zoom_plan; an XLA-level slice-and-add variant
            # measured a consistent night-level LOSS from the per-row
            # partial-sum HBM round trips)
            u = fused_exp_zoom(base, dl[r_lo:r_hi, r_lo:col_hi], a2,
                               alpha, w, tile_j=tile_j,
                               precision=cfg.zoom_precision,
                               exp2=cfg.zoom_exp2, dir_block=dir_block,
                               row_splits=row_splits,
                               # "auto" gives ndir=1 launches the
                               # scratch-free immediate-contraction body;
                               # an explicit integer pallas_dir_block pins
                               # the legacy scratch layout (the A/B knob,
                               # as for the ndir=9 direction block)
                               ndir1_scratch=(
                                   ndir == 1
                                   and cfg.pallas_dir_block != "auto"),
                               interpret=interpret)
    m = 2 * nout
    mm = _mm(cfg)
    if win is not None:
        # fold the mirror weights into the second-stage matrices
        v = _fold_weights(dim, S, base.shape[-1], dtype)
        ar2 = ar[..., r_lo:col_hi] * v
        ai2 = ai[..., r_lo:col_hi] * v
    else:
        ar2, ai2 = ar, ai
    p = (mm(u[:, :m], jnp.swapaxes(ar2, 1, 2))
         - mm(u[:, m:], jnp.swapaxes(ai2, 1, 2)))            # (k, m, m)
    out = jax.vmap(lambda pp, tt: _combine_bilinear(
        jnp.maximum(pp, 0.0), tt, nout))(p, t)
    return out / jnp.sum(out, axis=(-2, -1), keepdims=True)


def _psf_samples_zoom(mean_otf_centered, i0, t, nout: int, cfg):
    """PSF bilinear samples out[i,j] = bilinear(psf, (pos_i, pos_j)) with
    pos = i0 + t, computed by zoom DFT without materialising the PSF.

    ``mean_otf_centered``: (N, N) real; ``i0``: (nout,) int32 floor indices;
    ``t``: (nout,) fractional parts.  Exactly equivalent (to rounding) to
    the FFT path followed by :func:`_bilinear_regrid`, including the
    clip-at-zero before interpolation.
    """
    dtype = jnp.dtype(cfg.dtype)
    dim = cfg.dim
    idx = jnp.concatenate([i0, i0 + 1])                 # (2*nout,)
    ar, ai = _zoom_dft_matrices(idx, dim, dtype)
    g = mean_otf_centered.astype(dtype)
    # never 'default' precision here: TPU f32 matmul defaults to one
    # bfloat16 pass, which costs ~1e-5 absolute on the PSF — the budget
    mm = _mm(cfg)
    win = cfg.otf_window
    if win is not None:
        # windowed OTF (rows [r_lo, r_lo+2S), cols [r_lo, c+128)):
        # mirrored column pairs contribute equally (weight 2)
        r_lo, S = win
        r_hi, col_hi = r_lo + 2 * S, dim // 2 + 128
        u_r = mm(ar[:, r_lo:r_hi], g)                   # (2*nout, ncw)
        u_i = mm(ai[:, r_lo:r_hi], g)
        v = _fold_weights(dim, S, g.shape[-1], dtype)
        p = (mm(u_r * v, ar[:, r_lo:col_hi].T)
             - mm(u_i * v, ai[:, r_lo:col_hi].T))
    else:
        u_r = mm(ar, g)                                 # (2*nout, N)
        u_i = mm(ai, g)
        p = mm(u_r, ar.T) - mm(u_i, ai.T)               # (2*nout, 2*nout)
    return _combine_bilinear(jnp.maximum(p, 0.0), t, nout)


def psd_to_psf(psd, pup, D, lbda, phase_static=None, samp=None, FoV=None,
               return_all=False, dtype=jnp.float64):
    """General long-exposure PSF from one residual PSD [nm^2] and a pupil.

    Standalone equivalent of the reference ``psd_to_psf``
    (psfrec.py:689-807) for single transforms (the batched pipeline uses
    :func:`psf_cube`): supports sub-Nyquist output sampling (central crop
    of the structure function), an optional static pupil phase [nm], and
    ``return_all`` -> (psf, sampout, FoV).  ``lbda`` in metres.

    The reference's oversampling branches are unreachable in its shipped
    pipeline and *crash* when forced (``np.zeros(dimnum, dimnum)`` at
    psfrec.py:738 is a TypeError; cubic ``interpolate`` raises
    NotImplementedError at psfrec.py:640); they are rejected explicitly
    here with the matching exception.
    """
    psd = jnp.asarray(psd, dtype)
    pup = jnp.asarray(pup, dtype)
    if psd.dtype != jnp.dtype(dtype):
        # x64 disabled (the TPU deployment): jnp silently resolved the
        # requested float64 to float32.  Follow the resolved precision —
        # complex128 here would only downcast again — but say so, since
        # a library user calling this standalone expects f64-grade
        # results (the batched pipeline passes float32 explicitly)
        logger.warning(
            "psd_to_psf: requested dtype %s resolved to %s (jax x64 is "
            "disabled); results carry float32 accuracy (~1e-5)",
            jnp.dtype(dtype).name, psd.dtype.name)
    cdtype = (jnp.complex128 if psd.dtype == jnp.float64 else
              jnp.complex64)
    dim = psd.shape[0]
    npup = pup.shape[0]
    sampnum = dim / npup
    L = D * sampnum
    if dim < 2 * npup:
        logger.info("the PSD horizon must be at least two time larger than "
                    "the pupil diameter")

    convnm = 2 * np.pi / (lbda * 1e9)
    bg = jnp.fft.ifft2(jnp.fft.fftshift(psd * convnm ** 2).astype(cdtype))
    bg = bg * (psd.size / L ** 2)
    dphi = jnp.fft.fftshift(2.0 * (bg[0, 0].real - bg.real))

    sampin = samp if samp is not None else sampnum
    if sampin < 2:
        logger.info("PSF should be at least nyquist sampled")
    dimnum = int(np.fix(dim * (sampin / sampnum) / 2)) * 2
    sampout = dimnum / npup
    if sampin <= sampnum:
        ns = int(sampout * npup / 2)
        lo = dim // 2 - ns
        dphi2 = dphi[lo:lo + 2 * ns, lo:lo + 2 * ns]
    else:
        raise NotImplementedError(
            "samp > dim/npup requires structure-function extrapolation, "
            "which crashes in the reference (psfrec.py:738-744)")

    fov_num = (lbda / (sampnum * D)) * dim / 4.85e-6
    if FoV is not None and not np.allclose(float(FoV), fov_num):
        raise NotImplementedError(
            "FoV oversampling needs cubic interpolation, unimplemented in "
            "the reference (psfrec.py:640)")
    dimover, npupover = dimnum, npup

    tab = jnp.zeros((dimover, dimover), cdtype)
    pup_sum = jnp.sum(pup)        # normaliser uses the unmodified pupil
    if phase_static is not None:
        pup = pup * jnp.exp(1j * jnp.asarray(phase_static, dtype)
                            * 2 * np.pi / lbda)
    tab = tab.at[:npupover, :npupover].set(pup.astype(cdtype))
    dl_otf = jnp.fft.fftshift(
        jnp.abs(jnp.fft.fft2(jnp.abs(jnp.fft.ifft2(tab)) ** 2)) / pup_sum)

    sys_otf = jnp.fft.fftshift(jnp.exp(-dphi2 / 2.0) * dl_otf)
    psf = jnp.fft.fftshift(jnp.fft.ifft2(sys_otf.astype(cdtype)).real)
    psf = psf / jnp.sum(psf)
    if return_all:
        return psf, sampout, fov_num * dimover / dim
    return psf


def psf_cube(psd, lbda_nm, cfg: GalacsiConfig):
    """PSF cube (nl, dimpsf, dimpsf) at the MUSE sampling from the PSD cube.

    ``psd``: (ndir, dim, dim) image-centred residual PSD [nm^2/freq^2]
    (or (dim, dim) for a single direction).
    ``lbda_nm``: (nl,) wavelengths [nm].  Host wrapper: concrete
    wavelengths get their crop sizes decided in float64 BEFORE the jit
    boundary (lambda_crop_size's .5-boundary QUIRK), then the jitted
    body runs.
    """
    npixc = (None if isinstance(lbda_nm, jax.core.Tracer)
             else lambda_crop_size(lbda_nm, cfg))
    return _psf_cube_jit(psd, lbda_nm, npixc, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _psf_cube_jit(psd, lbda_nm, npixc, cfg: GalacsiConfig):
    if psd.ndim == 2:
        psd = psd[None]
    base = dphi_base(psd.astype(cfg.dtype), cfg)    # (ndir, dim, dim)
    return psf_cube_from_base(base, lbda_nm, cfg, npixc=npixc)


def psf_cube_from_base(base, lbda_nm, cfg: GalacsiConfig, npixc=None):
    """Host wrapper over the jitted body: concrete wavelengths compute
    ``npixc`` in float64 on the host before tracing (the in-graph f32
    quotient can round .5-boundary crops the other way — see
    :func:`lambda_crop_size`); traced callers pass a precomputed
    ``npixc`` or accept the f32 fallback.  Full contract in
    :func:`_psf_cube_from_base_jit`."""
    if npixc is None and not isinstance(lbda_nm, jax.core.Tracer):
        npixc = lambda_crop_size(lbda_nm, cfg)
    return _psf_cube_from_base_jit(base, lbda_nm, npixc, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _psf_cube_from_base_jit(base, lbda_nm, npixc, cfg: GalacsiConfig):
    """PSF cube from the wavelength-free structure function ``base``
    (from :func:`dphi_base` or :func:`dphi_base_split` under the SAME
    config).  Its shape is the config's fold/support window: ``(ndir,
    2*S, S + 128)`` with ``S = cfg.otf_window[1]`` — rows ``[c-S, c+S)``
    and columns ``[c-S, c+128)`` of the full grid (the point-symmetry
    fold keeps only 128 columns past the centre ``c = dim//2``) — or
    ``(ndir, dim, dim)`` when ``cfg.otf_window is None``; a mismatch
    raises ``ValueError``.

    ``npixc``: optional precomputed per-wavelength crop sizes (int32,
    same length as ``lbda_nm``).  Pass the host-side float64 result of
    :func:`lambda_crop_size` when ``lbda_nm`` is traced — the in-graph
    f32 fallback can round a .5-boundary crop the other way (see the
    QUIRK note there).
    """
    if npixc is None:
        npixc = lambda_crop_size(lbda_nm, cfg)      # (nl,) int32
    return _psf_cube_from_base_body(base, lbda_nm, npixc, cfg)


def _blue_split_cfgs(cfg: GalacsiConfig, nl: int):
    """Validate ``cfg.otf_blue`` and return ``(nb, cfg_blue, cfg_red)``.

    ``cfg_blue`` is the SAME pipeline config re-rooted on the smaller
    centred window (``otf_support=S_blue``) — every downstream stage
    (a2 slicing, fold weights, pupil-OTF slice, Pallas VMEM plan) then
    sizes itself off that window through the ordinary code paths — with
    ``pallas_lambda_chunk`` set to the blue segment length so the
    (small) blue launch covers the whole segment in one chunk when its
    VMEM admits it, instead of padding the segment up to the bucket's
    chunk multiple.  ``cfg_red`` is the bucket config with the split
    cleared.
    """
    nb, Sb = cfg.otf_blue
    nb, Sb = int(nb), int(Sb)
    win = cfg.otf_window
    if win is None:
        raise ValueError("otf_blue requires the fold/window machinery "
                         "(cfg.otf_window is None)")
    S = win[1]
    if Sb % 128 != 0 or not 0 < Sb < S:
        raise ValueError(
            f"otf_blue window {Sb} must be a positive multiple of 128 "
            f"smaller than the bucket window {S}")
    if not 0 < nb < nl:
        raise ValueError(
            f"otf_blue segment length {nb} must satisfy 0 < nb < nl={nl}")
    cfg_red = cfg.with_(otf_blue=None)
    cfg_blue = cfg_red.with_(otf_support=Sb, pallas_lambda_chunk=nb)
    return nb, cfg_blue, cfg_red


def _psf_cube_from_base_body(base, lbda_nm, npixc, cfg: GalacsiConfig):
    if cfg.otf_blue is not None:
        # blue-segment window split (cfg.otf_blue = (nb, S_blue)): the
        # damping exponent scales as (2pi/lambda)^2, so the bluest nb
        # wavelengths run on the smaller centred sub-window S_blue —
        # a static slice of the SAME wavelength-free structure function
        # — through this very body re-rooted on that window; admission
        # is certified by the batch planner's host model and backstopped
        # by the device window guard (parallel/batch.py:_window_guard).
        nb, cfg_blue, cfg_red = _blue_split_cfgs(cfg, int(lbda_nm.shape[0]))
        S, Sb = cfg.otf_window[1], cfg_blue.otf_window[1]
        lo = S - Sb
        out_b = _psf_cube_from_base_body(
            base[..., lo:S + Sb, lo:], lbda_nm[:nb], npixc[:nb], cfg_blue)
        out_r = _psf_cube_from_base_body(
            base, lbda_nm[nb:], npixc[nb:], cfg_red)
        return jnp.concatenate([out_b, out_r], axis=0)

    dtype = jnp.dtype(cfg.dtype)
    dim = cfg.dim
    dl = pupil_otf(cfg)                             # (dim, dim)
    if npixc is None:
        npixc = lambda_crop_size(lbda_nm, cfg)      # (nl,) int32

    win = cfg.otf_window
    expect = (dim, dim) if win is None else (2 * win[1], win[1] + 128)
    if base.shape[-2:] != expect:
        raise ValueError(
            f"structure-function block {base.shape[-2:]} does not match "
            f"the config's fold/support window {expect}; produce `base` "
            "with dphi_base/dphi_base_split under the same config")
    ndir = base.shape[0]
    if not cfg.use_fft and not cfg.use_zoom_dft:
        raise ValueError("the FFT-free mode (use_fft=False) requires the "
                         "zoom-DFT resampling path (use_zoom_dft=True)")
    pallas_ok = (cfg.use_pallas and cfg.use_zoom_dft
                 and cfg.dtype == "float32" and cfg.dim % 128 == 0
                 and jax.default_backend() == "tpu")

    def one_lambda(args):
        lb, npix = args
        convnm2 = (2.0 * np.pi / lb) ** 2
        start = (dim // 2 - npix // 2).astype(dtype)
        step = npix.astype(dtype) / cfg.dimpsf
        pos = start + jnp.arange(cfg.dimpsf, dtype=dtype) * step
        i0f = jnp.floor(pos)
        t = (pos - i0f).astype(dtype)
        i0 = jnp.clip(i0f.astype(jnp.int32), 0, dim - 2)

        ao = jnp.exp(-0.5 * convnm2 * base)
        if win is not None:
            r_lo = win[0]
            dlw = dl[r_lo:r_lo + base.shape[-2],
                     r_lo:r_lo + base.shape[-1]]
            cc = dim // 2 - r_lo                    # local centre index
        else:
            dlw, cc = dl, dim // 2
        prod = ao * dlw[None]                       # (ndir, rows, cols)
        norm = prod[:, cc, cc]                      # per-direction DC
        mean_otf = jnp.mean(prod / norm[:, None, None], axis=0)
        if cfg.use_zoom_dft:
            out = _psf_samples_zoom(mean_otf, i0, t, cfg.dimpsf, cfg)
        else:
            psf = _psf_plane_fft(mean_otf, cfg)
            psf = jnp.maximum(psf, 0.0)
            out = _bilinear_regrid(psf, start, step, cfg.dimpsf)
        return out / jnp.sum(out)

    nl = lbda_nm.shape[0]
    k = max(1, min(cfg.lambda_chunk, nl))
    if pallas_ok:
        k_fit = _pallas_lambda_chunk(
            cfg, base.shape[-2], anchor=(cfg.zoom_anchor == "on"),
            # the scratch-free ndir=1 body frees the per-wavelength
            # scratch VMEM: the dim=1280 FULL-window bucket then fits
            # the big chunk of 12 (3 launches per 35-lambda cube
            # instead of 5; measured 8.44 -> 7.83 us/lambda incl. the
            # padding wavelength — measure_ndir1_body.py)
            ndir1_free=(base.shape[0] == 1
                        and cfg.pallas_dir_block == "auto"))
        if k_fit < 1:
            pallas_ok = False       # cannot fit even one wavelength
        else:
            # the fused kernel never materialises the OTF in HBM: its
            # chunk is gated by VMEM only, and larger chunks win (fewer
            # Dphi re-reads + launches; 1.16x on the 9-direction night
            # at the windowed bucket's 12 vs 7 — config.py).  The big
            # chunk is used ONLY when it fits in full: intermediate
            # VMEM-clamped sizes are not known-good (k=9 measured
            # SLOWER than both 7 and 12 at the dim=1280 windowed
            # shape), so a clamp falls back to the measured
            # lambda_chunk default instead
            k = max(1, min(_pallas_chunk_policy(cfg, k_fit), k_fit, nl))
    if jax.default_backend() == "cpu" and not pallas_ok:
        k = 1  # no parallel gain on one host core; chunking only adds memory
    if k == 1 and not pallas_ok:
        return jax.lax.map(one_lambda, (lbda_nm.astype(dtype), npixc))

    # chunked wavelengths: process K lambdas per step — a serial
    # per-lambda scan underutilises the chip by ~4x at production sizes
    pad = (-nl) % k
    lb = jnp.concatenate([lbda_nm.astype(dtype),
                          jnp.broadcast_to(lbda_nm[-1].astype(dtype), (pad,))])
    npx = jnp.concatenate([npixc, jnp.broadcast_to(npixc[-1], (pad,))])
    if pallas_ok:
        # one fused kernel per chunk: Dphi read once for all K lambdas,
        # direction average accumulated in VMEM; multiple directions per
        # grid step where the VMEM budget admits it (kernel 1.52x at the
        # windowed ndir=9 shape), with the contraction rows split into
        # slices where that is what lets the full block fit (1.42x at
        # the full-window ndir=9 shape) — _pallas_zoom_plan
        splits, db, tj = _pallas_zoom_plan(cfg, base.shape[-2],
                                           base.shape[0], k)
        f = lambda a, b: _psf_chunk_pallas(  # noqa: E731
            base, dl, a, b, cfg, dir_block=db, row_splits=splits,
            tile_j=tj)
    else:
        f = jax.vmap(lambda a, b: one_lambda((a, b)))
    res = jax.lax.map(lambda args: f(*args),
                      (lb.reshape(-1, k), npx.reshape(-1, k)))
    return res.reshape(-1, cfg.dimpsf, cfg.dimpsf)[:nl]
