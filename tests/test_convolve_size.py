"""Minimal alias-free circular-transform size for 'same' convolutions.

The 'same' crop of a linear convolution is alias-free at transform size
L >= n_img + n_ker - 1 - (n_ker - 1)//2 (otf/convolve.py:_same_fft_size)
— the circular wrap lands entirely outside the kept window.  These
tests pin the size arithmetic and the EXACTNESS of the reduced size
against the classical full-size transform on both backends.
"""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from muse_psfr_tpu.otf.convolve import (_same_fft_size, _fft_convolve_same,
                                        _dft_convolve_same,
                                        _direct_convolve_same)


def test_size_arithmetic():
    assert _same_fft_size(40, 41) == 64     # production: 80 -> 64
    assert _same_fft_size(8, 9) == 16       # TINY: unchanged (16 -> 16)
    assert _same_fft_size(12, 13) == 24     # dim=512 test config
    # never larger than the classical full size
    for n in range(4, 64):
        k = n + (n % 2 == 0)
        assert _same_fft_size(n, k) <= n + k - 1


def test_reduced_size_is_exact():
    """Both transform backends must equal the direct 'same' convolution
    at the production plane size (where the reduction engages)."""
    rng = np.random.default_rng(5)
    n, k = 40, 41
    planes = rng.standard_normal((3, n, n)).astype(np.float64)
    kernels = rng.standard_normal((3, k, k)).astype(np.float64)
    want = np.asarray(_direct_convolve_same(jnp.asarray(planes),
                                            jnp.asarray(kernels), n, k))
    got_fft = np.asarray(_fft_convolve_same(jnp.asarray(planes),
                                            jnp.asarray(kernels), n, k))
    got_dft = np.asarray(_dft_convolve_same(jnp.asarray(planes),
                                            jnp.asarray(kernels), n, k))
    assert_allclose(got_fft, want, rtol=0, atol=1e-11)
    assert_allclose(got_dft, want, rtol=0, atol=1e-11)
