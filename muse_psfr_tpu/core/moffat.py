"""Moffat profiles: discrete kernels and the MUSE intrinsic PSF model (JAX).

Replaces ``astropy.convolution.Moffat2DKernel`` (used at reference
psfrec.py:916, 927) and ``muse_intrinsic_psf`` (psfrec.py:1144-1171).
"""

import numpy as np
import jax.numpy as jnp


def moffat_kernel(alpha, beta, size: int, dtype=jnp.float32):
    """Discrete circular Moffat kernel on an odd ``size`` x ``size`` grid.

    ``K(r) = (beta-1)/(pi alpha^2) * (1 + r^2/alpha^2)^(-beta)`` sampled at
    pixel centres, centre at ``(size-1)/2`` — the analytic unit-integral
    amplitude with *no* discrete renormalisation, matching astropy's
    ``Moffat2DKernel(gamma=alpha, alpha=beta)`` with mode='center' as
    consumed by the reference (psfrec.py:916, 927).  ``alpha``/``beta`` may
    be traced scalars.

    On the normalisation convention: astropy kernels choose the amplitude
    so the *continuous* integral is 1 and record the discrete deficit in
    ``kernel._truncation = |1 - array.sum()|`` (which would always be 0 if
    the array were renormalised at construction); discrete renormalisation
    only happens via an explicit ``kernel.normalize()`` or
    ``convolve(..., normalize_kernel=True)``, neither of which the
    reference uses — it feeds ``kernel.array`` straight into
    ``scipy.signal.fftconvolve`` (psfrec.py:917, 928).  The absolute PSF
    scale (flux/peak columns, PSF_MEAN values) depends on this; FWHM/beta
    do not.
    """
    c = (size - 1) / 2.0
    y = (np.arange(size) - c)[:, None]
    x = (np.arange(size) - c)[None, :]
    r2 = jnp.asarray(y * y + x * x, dtype)
    alpha = jnp.asarray(alpha, dtype)
    beta = jnp.asarray(beta, dtype)
    rr = r2 / (alpha * alpha)
    return (beta - 1.0) / (np.pi * alpha * alpha) * (1.0 + rr) ** (-beta)


def moffat_fwhm_to_alpha(fwhm, beta):
    """Moffat core width alpha from FWHM: ``alpha = fwhm/(2 sqrt(2^(1/b)-1))``."""
    return fwhm / (2.0 * jnp.sqrt(2.0 ** (1.0 / beta) - 1.0))


# MUSE intrinsic PSF: degree-5 polynomials in the normalised wavelength
# (10*lbda_nm - 4750)/(9350 - 4750), fitted on commissioning data
# (reference psfrec.py:1160-1165).
_POL_BETA = (-0.83704697, 1.1337153, 0.0609222, -1.35581762,
             1.15237178, 2.2106042)
_POL_FWHM = (0.60467385, -1.58905792, 1.75293264, -1.0368302,
             0.21487023, 0.34851139)
_POL_BETA_STD = (0.18187424, -0.17841793, 0.30962616)
_POL_FWHM_STD = (0.00707504, -0.0303464, 0.04596354)


def _polyval(coeffs, x):
    acc = jnp.zeros_like(x) + coeffs[0]
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def muse_intrinsic_psf(lbda_nm):
    """MUSE-intrinsic Moffat ``(fwhm [arcsec], beta, fwhm_std, beta_std)``
    at wavelength(s) ``lbda_nm`` [nm].  Traceable."""
    lb = (10.0 * jnp.asarray(lbda_nm) - 4750.0) / (9350.0 - 4750.0)
    return (_polyval(_POL_FWHM, lb), _polyval(_POL_BETA, lb),
            _polyval(_POL_FWHM_STD, lb), _polyval(_POL_BETA_STD, lb))
