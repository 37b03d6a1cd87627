"""Tip-tilt and instrument-PSF convolutions (JAX, batched over wavelength).

Replaces reference ``convolve_final_psf`` (psfrec.py:874-930): the AO PSF
cube is convolved with (a) a beta=2 Moffat modelling residual tip-tilt from
the uncorrected high layer, its width set by the outer-scale attenuation
table (coeffL0), and (b) the per-wavelength MUSE-intrinsic Moffat.

Both are 'same'-mode linear convolutions of a (dimpsf, dimpsf) plane with an
odd (dimpsf+1, dimpsf+1) kernel; with these sizes a circular convolution at
size ``2*dimpsf`` is exactly linear (dimpsf + dimpsf+1 - 1 = 2*dimpsf), so
we use one rFFT per plane pair and crop the 'same' window — identical
numbers to the reference's ``scipy.signal.fftconvolve(mode='same')``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GalacsiConfig
from ..core.moffat import moffat_kernel, moffat_fwhm_to_alpha, \
    muse_intrinsic_psf
from ..core.coeff_l0 import tt_attenuation


def _fft_convolve_same(planes, kernels, n_img: int, n_ker: int):
    """Batched 'same' linear convolution via circular FFT.

    planes: (nl, n_img, n_img); kernels: (nl, n_ker, n_ker) with
    n_ker = n_img + 1 (odd).  Returns (nl, n_img, n_img).
    """
    nfft = n_img + n_ker - 1
    fp = jnp.fft.rfft2(planes, s=(nfft, nfft))
    fk = jnp.fft.rfft2(kernels, s=(nfft, nfft))
    full = jnp.fft.irfft2(fp * fk, s=(nfft, nfft))
    off = (n_ker - 1) // 2
    return full[..., off:off + n_img, off:off + n_img]


def _direct_convolve_same(planes, kernels, n_img: int, n_ker: int):
    """'same' linear convolution as a grouped direct convolution (MXU).

    Same numbers as :func:`_fft_convolve_same` to rounding; used on the
    FFT-free path.  Each wavelength plane gets its own kernel via
    ``feature_group_count``.  True convolution (kernel flipped) to match
    scipy.signal.fftconvolve semantics.
    """
    nl = planes.shape[0]
    if kernels.shape[0] == 1:
        kernels = jnp.broadcast_to(kernels, (nl,) + kernels.shape[1:])
    lhs = planes[None]                               # (1, nl, H, W)
    rhs = kernels[:, None, ::-1, ::-1]               # (nl, 1, kh, kw)
    pad = (n_ker - 1) // 2
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=nl,
        precision=jax.lax.Precision.HIGHEST)
    return out[0]


def tip_tilt_fwhm(seeing, GL, L0, cfg: GalacsiConfig):
    """Residual tip-tilt FWHM [px] from the high-layer seeing and the
    outer-scale attenuation coefficient (reference psfrec.py:881-903)."""
    seeing_hl = seeing * (1.0 - GL) ** 0.6
    r0_hl = 0.976 * 0.5 / seeing_hl / 4.85
    c_hl = tt_attenuation(L0)
    return (jnp.sqrt(c_hl * 0.97 * 6.88 * (0.5e-6 / (2.0 * np.pi)) ** 2 *
                     8.0 ** (-1.0 / 3.0) * r0_hl ** (-5.0 / 3.0)) /
            4.85e-6 * 2.35 / cfg.pixscale)


def convolve_final(psf, lbda_nm, seeing, GL, L0, cfg: GalacsiConfig):
    """AO PSF cube -> final PSF cube (tip-tilt then MUSE-intrinsic Moffat).

    All arguments may be traced; output matches reference
    ``convolve_final_psf`` to float precision (validated vs the oracle).
    """
    dtype = jnp.dtype(cfg.dtype)
    psf = psf.astype(dtype)
    nl, n_img = psf.shape[0], psf.shape[1]
    n_ker = n_img + (n_img % 2 == 0)  # force odd (psfrec.py:911-915)

    conv = _fft_convolve_same if cfg.use_fft else _direct_convolve_same

    beta_tt = 2.0
    alpha_tt = moffat_fwhm_to_alpha(tip_tilt_fwhm(seeing, GL, L0, cfg),
                                    beta_tt)
    k_tt = moffat_kernel(alpha_tt, beta_tt, n_ker, dtype)
    psf = conv(psf, k_tt[None], n_img, n_ker)

    fwhm_i, beta_i, _, _ = muse_intrinsic_psf(lbda_nm.astype(dtype))
    alpha_i = moffat_fwhm_to_alpha(fwhm_i / cfg.pixscale, beta_i)
    k_i = _batched_kernels(alpha_i, beta_i, n_ker, dtype)
    return conv(psf, k_i, n_img, n_ker)


def _batched_kernels(alphas, betas, size: int, dtype):
    """(nl,) Moffat parameters -> (nl, size, size) kernels, vectorised."""
    c = (size - 1) / 2.0
    y = (np.arange(size) - c)[:, None]
    x = (np.arange(size) - c)[None, :]
    r2 = jnp.asarray(y * y + x * x, dtype)[None]
    a = alphas[:, None, None].astype(dtype)
    b = betas[:, None, None].astype(dtype)
    return (b - 1.0) / (np.pi * a * a) * (1.0 + r2 / (a * a)) ** (-b)
