"""von Karman turbulence spectra (JAX).

Two prefactor conventions coexist in the reference and are kept distinct:
the PSD driver uses the rounded ``0.0229`` (psfrec.py:544) while the
fitting-error PSD uses the exact gamma-function expression
(psfrec.py:622-623).  Mixing them shifts the PSD by ~2e-4 relative.
"""

from math import gamma, pi

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
