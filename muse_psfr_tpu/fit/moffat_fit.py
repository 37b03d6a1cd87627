"""Batched circular Moffat fitting (JAX Levenberg-Marquardt).

Replaces the reference's per-plane ``mpdaf.obj.Image.moffat_fit`` calls
(reference psfrec.py:861-871), which wrap ``scipy.optimize.leastsq`` — a
sequential host loop over wavelength planes.  Here a fixed-iteration
Levenberg-Marquardt solver with analytic Jacobian fits *all* planes of all
rows in parallel under ``vmap``/``jit`` (the normal equations are 5x5, so
each iteration is a fused batch of tiny dense ops — ideal VPU work).

Model (circular, no background — the reference pipeline always uses
``circular=True, fit_back=False``):

    m(y, x) = peak * (1 + ((y-cy)^2 + (x-cx)^2)/alpha^2)^(-n)

Derived quantities and 1-sigma errors follow the standard least-squares
covariance ``cov = SSR/(N-5) * (J^T J)^{-1}`` with delta-method propagation
for fwhm (= 2 alpha sqrt(2^(1/n)-1)) and flux (= peak pi alpha^2 / (n-1)),
matching the float64 oracle (benchmarks/oracle_numpy.py).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N_PARAMS = 5
LM_ITERS = 20  # converged by ~10 on MUSE-like planes; margin for edge
               # cases.  Measured (v5e, realistic night + extreme-telemetry
               # corners): 14 iters drifts beta up to 1.5e-3 vs 20 — 15% of
               # the golden tolerance for ~10 ms/chunk; not worth it.

#: layout of the packed per-plane fit result (one device->host transfer)
PACKED_FIELDS = ("cy", "cx", "err_cy", "err_cx", "flux", "err_flux",
                 "peak", "err_peak", "fwhm", "err_fwhm", "n", "err_n")
N_PACKED = len(PACKED_FIELDS)


def _model_and_jac(p, yy, xx):
    cy, cx, peak, alpha, n = p
    dy = yy - cy
    dx = xx - cx
    rr = (dy * dy + dx * dx) / (alpha * alpha)
    u = 1.0 + rr
    lu = jnp.log(u)
    un = jnp.exp(-n * lu)        # u ** (-n): one log + one exp for the
    m = peak * un                # whole Jacobian (the fit is
    common = peak * n * un / u   # transcendental-bound on the VPU)
    j_cy = common * 2.0 * dy / (alpha * alpha)
    j_cx = common * 2.0 * dx / (alpha * alpha)
    j_peak = un
    j_alpha = common * 2.0 * rr / alpha
    j_n = -m * lu
    jac = jnp.stack([j_cy, j_cx, j_peak, j_alpha, j_n], axis=-1)
    return m, jac


def _init_params(img, yy, xx):
    peak0 = jnp.max(img)
    flat = jnp.argmax(img)
    cy0 = (flat // img.shape[1]).astype(img.dtype)
    cx0 = (flat % img.shape[1]).astype(img.dtype)
    tot = jnp.sum(img)
    var = jnp.sum(img * ((yy - cy0) ** 2 + (xx - cx0) ** 2)) / tot
    fwhm0 = jnp.maximum(2.355 * jnp.sqrt(jnp.maximum(var, 0.25) / 2.0), 1.0)
    a0 = fwhm0 / (2.0 * jnp.sqrt(2.0 ** 0.5 - 1.0))
    return jnp.stack([cy0, cx0, peak0, a0, jnp.asarray(2.0, img.dtype)])


def _lm_solve(img, yy, xx):
    """Fixed-iteration LM on one plane.  Returns (params, cov)."""
    dtype = img.dtype
    data = img.ravel()

    def cost_of(p):
        m, _ = _model_and_jac(p, yy, xx)
        r = m.ravel() - data
        return jnp.sum(r * r)

    p0 = _init_params(img, yy, xx)
    lam0 = jnp.asarray(1e-3, dtype)

    # Precision split, measured on v5e: the loop's normal equations only
    # steer the LM trajectory (default bf16-pass dots converge to the same
    # parameters, ~2e-4 px off the f64 fit either way — the f32 data path
    # dominates), but the FINAL JtJ sets the reported covariance: at
    # default precision the error bars are ~1% off the f64 oracle, at
    # HIGHEST ~0.3%.  So: fast dots in the scan (x21 calls), one HIGHEST
    # dot for the covariance.
    hi = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def step(carry, _):
        p, lam, c = carry
        m, jac = _model_and_jac(p, yy, xx)
        r = (m.ravel() - data)
        j = jac.reshape(-1, N_PARAMS)
        jtj = j.T @ j
        jtr = j.T @ r
        a = jtj + lam * jnp.diag(jnp.diag(jtj))
        delta = jnp.linalg.solve(a, -jtr)
        p_new = p + delta
        c_new = cost_of(p_new)
        better = c_new < c
        p = jnp.where(better, p_new, p)
        c = jnp.where(better, c_new, c)
        lam = jnp.where(better, lam / 3.0, lam * 2.0)
        lam = jnp.clip(lam, 1e-12, 1e8)
        return (p, lam, c), None

    (p, _, c), _ = jax.lax.scan(step, (p0, lam0, cost_of(p0)),
                                None, length=LM_ITERS)

    _, jac = _model_and_jac(p, yy, xx)
    j = jac.reshape(-1, N_PARAMS)
    jtj = hi(j.T, j)
    dof = data.shape[0] - N_PARAMS
    cov = jnp.linalg.inv(jtj) * (c / dof)
    return p, cov


@partial(jax.jit, static_argnames=("dtype",))
def fit_moffat_cube_packed(cube, dtype: str = "float32"):
    """Fit every (ny, nx) plane of ``cube`` (..., ny, nx) with a circular
    Moffat.  Returns one array of shape ``cube.shape[:-2] + (N_PACKED,)``
    laid out per :data:`PACKED_FIELDS` — a single small array so batch
    consumers pay one device->host transfer instead of ten (the transfer
    link of a tunneled TPU is latency-bound).
    """
    dt = jnp.dtype(dtype)
    lead = cube.shape[:-2]
    ny, nx = cube.shape[-2:]
    planes = cube.reshape((-1, ny, nx)).astype(dt)
    yy, xx = jnp.mgrid[:ny, :nx]
    yy = yy.astype(dt)
    xx = xx.astype(dt)

    p, cov = jax.vmap(lambda im: _lm_solve(im, yy, xx))(planes)
    err = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(cov), 0.0))

    cy, cx, peak, alpha, n = (p[:, k] for k in range(N_PARAMS))
    e_cy, e_cx, e_peak, e_alpha, e_n = (err[:, k] for k in range(N_PARAMS))

    k_f = 2.0 * jnp.sqrt(2.0 ** (1.0 / n) - 1.0)
    fwhm = alpha * k_f
    dk_dn = (-jnp.log(2.0) * 2.0 ** (1.0 / n)
             / (n * n * jnp.sqrt(2.0 ** (1.0 / n) - 1.0)))
    err_fwhm = jnp.sqrt((k_f * e_alpha) ** 2 + (alpha * dk_dn * e_n) ** 2)
    flux = peak * np.pi * alpha * alpha / (n - 1.0)
    err_flux = jnp.abs(flux) * jnp.sqrt((e_peak / peak) ** 2 +
                                        (2.0 * e_alpha / alpha) ** 2 +
                                        (e_n / (n - 1.0)) ** 2)

    packed = jnp.stack([cy, cx, e_cy, e_cx, flux, err_flux, peak, e_peak,
                        fwhm, err_fwhm, n, e_n], axis=-1)
    return packed.reshape(lead + (N_PACKED,))


def unpack_fit(packed):
    """Packed fit array (host or device) -> dict of numpy arrays with the
    reference's column shapes (center/fwhm as 2-vectors)."""
    packed = np.asarray(packed)
    f = {name: packed[..., k] for k, name in enumerate(PACKED_FIELDS)}
    dup = lambda a, b: np.stack([a, b], axis=-1)  # noqa: E731
    return {
        "center": dup(f["cy"], f["cx"]),
        "err_center": dup(f["err_cy"], f["err_cx"]),
        "flux": f["flux"], "err_flux": f["err_flux"],
        "peak": f["peak"], "err_peak": f["err_peak"],
        "fwhm": dup(f["fwhm"], f["fwhm"]),
        "err_fwhm": dup(f["err_fwhm"], f["err_fwhm"]),
        "n": f["n"], "err_n": f["err_n"],
    }


def fit_moffat_cube(cube, dtype: str = "float32"):
    """Fit every plane of ``cube`` with a circular Moffat; returns a dict of
    numpy arrays (center (.., 2), flux, peak, fwhm (.., 2) [px], n, and
    their 1-sigma errors).  One device->host transfer."""
    return unpack_fit(fit_moffat_cube_packed(cube, dtype=dtype))
