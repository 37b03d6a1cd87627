"""von Karman turbulence spectra (JAX).

Two prefactor conventions coexist in the reference and are kept distinct:
the PSD driver uses the rounded ``0.0229`` (psfrec.py:544) while the
fitting-error PSD uses the exact gamma-function expression
(psfrec.py:622-623).  Mixing them shifts the PSD by ~2e-4 relative.
"""

from math import gamma, pi

import numpy as np
import jax.numpy as jnp

#: rounded prefactor used for the reconstruction/true-layer PSDs
CST_VK = 0.0229

#: exact Kolmogorov prefactor used for the fitting-error PSD
CST_VK_EXACT = ((gamma(11 / 6) ** 2 / (2 * pi ** (11 / 3))) *
                (24 * gamma(6 / 5) / 5) ** (5 / 6))


def vk_psd(f, r0, L0, cst=CST_VK):
    """von Karman phase PSD [rad^2 m^2] at spatial frequency ``f`` [1/m].

    ``r0`` may be broadcast (e.g. per-layer ``Cn2^(-3/5) * r0``).
    """
    return cst * r0 ** (-5.0 / 3.0) * (f ** 2 + 1.0 / L0 ** 2) ** (-11.0 / 6.0)


def fitting_psd(f_centered, r0, L0, fc):
    """Fitting-error PSD: von Karman for ``f >= fc``, zero below.

    ``f_centered`` is the image-centred |f| grid
    (:func:`muse_psfr_tpu.core.grids.centered_freq_radius`).  Matches
    reference ``psd_fit`` (psfrec.py:616-626) with its exact prefactor.
    """
    f = jnp.asarray(f_centered)
    vk = vk_psd(f, r0, L0, cst=CST_VK_EXACT)
    return jnp.where(f >= fc, vk, 0.0)


def fitting_expansion_spec(l0_min: float, degree: int):
    """Taylor expansion of the fitting-PSD outer-scale dependence.

    With ``u = 1/L0^2`` the fitting PSD factorises as ``cst * r0^(-5/3) *
    (f^2 + u)^(-11/6)`` on ``f >= fc``; expanding around ``u0`` gives

        (f^2 + u)^(-11/6) = sum_k  binom(-11/6, k) (u - u0)^k
                                    * (f^2 + u0)^(-11/6 - k) + R

    whose remainder is controlled by ``x = (u - u0)/(f^2 + u0)``: since
    ``f >= fc`` and ``u <= 1/l0_min^2``, ``|x|`` is small (~3.4e-2 at the
    defaults l0_min=2.5, fc=1.5) and the default degree-5 expansion is
    exact to ~9e-9 relative (degree 3 at the former l0_min=5 was ~2e-8;
    the range was widened so synthetic low-L0 sweeps stay off the exact
    per-row transform — valid telemetry is L0 in [8, 30] anyway).  This
    is what lets the structure-function transform of the fitting PSD be
    precomputed once per configuration instead of per telemetry row
    (reference psfrec.py:144 + 716-722 recompute it per row per lambda).

    Returns ``(u0, binoms)``: the expansion centre and the ``degree+1``
    binomial coefficients, as numpy float64.
    """
    u_max = 1.0 / (l0_min * l0_min)
    u0 = u_max / 2.0
    binoms = np.ones(degree + 1)
    for k in range(1, degree + 1):
        binoms[k] = binoms[k - 1] * (-11.0 / 6.0 - (k - 1)) / k
    return u0, binoms


def fitting_expansion_max_rel_error(l0_min: float, degree: int, fc: float,
                                    l0_grid=None):
    """Certified max relative error of :func:`fitting_expansion_spec` over
    ``L0 in [l0_min, 10000]`` and ``f >= fc`` (the error is monotonically
    decreasing in ``f``, so ``f = fc`` is the worst case)."""
    u0, binoms = fitting_expansion_spec(l0_min, degree)
    if l0_grid is None:
        l0_grid = np.geomspace(l0_min, 1e4, 2001)
    u = 1.0 / l0_grid ** 2
    base = fc * fc + u0
    exact = (fc * fc + u) ** (-11.0 / 6.0)
    approx = sum(binoms[k] * (u - u0) ** k * base ** (-11.0 / 6.0 - k)
                 for k in range(degree + 1))
    return float(np.max(np.abs(approx - exact) / exact))
