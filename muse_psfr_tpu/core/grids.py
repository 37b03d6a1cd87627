"""Frequency/pupil grid primitives (JAX).

Replaces the reference's grid setup scattered through ``dsp4muse``
(psfrec.py:548-554), ``pupil_mask`` (190-203) and ``psd_fit`` (616-626).
Grids are built at trace time from static shapes, so everything here folds
into constants under ``jax.jit``.
"""

import numpy as np
import jax.numpy as jnp


def fft_freq_polar(n: int, step: float, dtype=jnp.float32):
    """FFT-ordered spatial-frequency grids ``(f, f_x, f_y)``.

    ``f_x``/``f_y`` reproduce the reference's polar decomposition through
    ``arctan(fy/fx)`` with ``arg_f[0,0] = 0`` (psfrec.py:548-554) — *not*
    ``arctan2``.  The net effect is ``f_x = |fx|`` and ``f_y = sign(fx)*fy``
    (a consistent per-frequency phasor conjugation, provably output-neutral,
    kept for bit-level parity of intermediates).
    """
    fx = np.fft.fftfreq(n, step)[:, None].astype(np.float64)
    fy = fx.T
    f = np.hypot(fx, fy)
    with np.errstate(all="ignore"):
        t = np.where((fx == 0.0) & (fy == 0.0), 0.0, fy / fx)
    arg = np.arctan(t)
    f_x = f * np.cos(arg)
    f_y = f * np.sin(arg)
    return (jnp.asarray(f, dtype), jnp.asarray(f_x, dtype),
            jnp.asarray(f_y, dtype))


def pupil_mask(radius: float, width: int, oc: float = 0.0,
               inverse: bool = False, dtype=jnp.float32):
    """Annular pupil: 1 where ``oc <= rho < 1`` (rho in units of ``radius``).

    Mirrors reference ``pupil_mask`` (psfrec.py:190-203), including the
    centre at ``(width-1)/2``.
    """
    c = (width - 1) / 2.0
    y = np.arange(width, dtype=np.float64)[:, None] - c
    x = np.arange(width, dtype=np.float64)[None, :] - c
    rho = np.hypot(y, x) / radius
    m = (rho < 1.0) & (rho >= oc)
    if inverse:
        m = ~m
    return jnp.asarray(m.astype(np.float64), dtype)


def centered_freq_radius(dim: int, L: float):
    """|f| on the image-centred grid used by the fitting-error PSD.

    The reference builds this grid centred on ``(dim-1)/2`` — half a pixel
    off the FFT convention — and fftshifts it twice (psd_fit:618 plus
    simul_psd_wfm:144), which is the identity for even ``dim``.  We build
    the centred grid directly (``dim`` must be even).
    """
    assert dim % 2 == 0, "PSD grid size must be even"
    c = (dim - 1) / 2.0
    fx = ((np.arange(dim) - c) / L)[:, None]
    fy = fx.T
    return np.hypot(fx, fy)


def direction_grid(npts: int, field_size: float = 60.0):
    """``npts^2`` field evaluation positions [arcsec] (psfrec.py:154-158)."""
    g = (np.mgrid[:npts, :npts] - npts // 2) * field_size / 2.0
    return g.reshape(2, -1).astype(np.float64)


def lgs_positions(sep_lgs: float = 63.0):
    """The 4-LGS square geometry [arcsec]; 3-LGS mode keeps columns 0..2.

    The reference's 3-laser geometry is always the fixed triangle
    ``[[1,1],[-1,-1],[-1,1]]`` regardless of *which* laser was rejected
    (psfrec.py:86-91); this is modelled downstream by a guide-star validity
    mask over the fixed 4-star geometry.
    """
    pos = np.array([[1.0, -1.0, -1.0, 1.0],
                    [1.0, -1.0, 1.0, -1.0]]) * sep_lgs
    return pos
