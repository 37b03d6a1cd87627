"""GLAO residual-phase PSD model (JAX).

TPU-native reformulation of the reference's PSD layer
(``calc_mat_rec_glao_finale`` psfrec.py:218-364, ``calc_dsp_res_glao_finale``
367-528, ``dsp4muse`` 531-613, ``simul_psd_wfm`` 36-151):

* the reference's per-pixel Python inversion loop (psfrec.py:332-355)
  collapses to a closed form — with a single reconstructed layer the
  per-frequency system is scalar, so
  ``W_g = conj(M_g)/sigma_g / (sum_k |M_k|^2/sigma_k [+ prior])``;
* all guide-star / layer / direction loops are batch axes (vmap/einsum);
* the 3-laser mode is a per-row guide-star validity *mask* over the fixed
  4-star geometry (masked star => M_g = 0 => exact 3-star algebra), so one
  traced program serves both geometries;
* everything is static-shape and jit/vmap/shard_map friendly.

Verified against the float64 oracle (benchmarks/oracle_numpy.py), itself
verified to <1e-8 absolute against the reference stages.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GalacsiConfig
from ..core.grids import (fft_freq_polar, centered_freq_radius,
                          direction_grid, lgs_positions)
from ..core.vonkarman import vk_psd, fitting_psd

ARCMIN_TO_RAD = 60.0 / 206265.0


def seeing_to_r0(seeing, lbda_um=0.5, zenith_deg=0.0):
    """Fried parameter [m] from seeing [arcsec @0.5um] (psfrec.py:183-187)."""
    r0_half = 0.976 * 0.5 / seeing / 4.85
    z = jnp.cos(jnp.deg2rad(zenith_deg)) ** 0.6
    return r0_half * (2.0 * lbda_um) ** 1.2 * z


def wfs_transfer(f, f_x, f_y, pitch, strict, cdtype):
    """Shack-Hartmann transfer function ``2*pi*i*f*sinc(p fx)*sinc(p fy)``,
    zeroed past the cutoff.

    ``pitch`` may be a scalar (one transfer function shared by all guide
    stars — the GALACSI case) or a (nb_gs,) array (per-WFS pitches, giving
    a (nb_gs, s, s) result as in the reference's general code path).

    QUIRK (psfrec.py:251-257, 429-435): the zeroing mask is
    ``((f != 0) & (|f_x| >= fc)) | (|f_y| >= fc)`` — '&' binds before '|'
    in the original's un-parenthesised expression.  The reconstructor uses
    '>=', the residual model '>' (``strict``); the cutoff lands exactly on
    grid frequencies so the two differ.
    """
    pitch = jnp.asarray(pitch)
    if pitch.ndim == 1:
        pitch = pitch[:, None, None]
    amp = 2.0 * np.pi * f * jnp.sinc(pitch * f_x) * jnp.sinc(pitch * f_y)
    fc = 1.0 / (2.0 * pitch)
    if strict:
        kill = ((f != 0) & (jnp.abs(f_x) > fc)) | (jnp.abs(f_y) > fc)
    else:
        kill = ((f != 0) & (jnp.abs(f_x) >= fc)) | (jnp.abs(f_y) >= fc)
    return jnp.where(kill, 0.0, amp).astype(cdtype) * 1j


def gs_phasors(f_x, f_y, poslgs_amin, cdtype):
    """Per-guide-star pupil-plane phase slopes (nb_gs, s, s) [rad/m alt].

    Guide-star masking is applied once, on the model matrices M/Mv (the
    load-bearing site): a masked star's M row is exactly zero, which
    reproduces the true 3-star algebra.
    """
    return (f_x[None] * poslgs_amin[0, :, None, None] +
            f_y[None] * poslgs_amin[1, :, None, None]) * ARCMIN_TO_RAD


def glao_reconstructor(f, f_x, f_y, poslgs_amin, gs_mask, sigr, pitch,
                       h_recons, cdtype, dsp_recons=None):
    """Closed-form GLAO reconstructor ``W`` of shape (nb_gs, s, s).

    Replaces reference ``calc_mat_rec_glao_finale`` (psfrec.py:218-364) —
    the per-frequency scalar inversion done in a Python double loop there is
    algebraic here.  ``dsp_recons`` enables the MAP prior (law != LSE);
    the shipped GALACSI pipeline is LSE.  The DC term is zeroed
    (psfrec.py:351-352).
    """
    w = wfs_transfer(f, f_x, f_y, pitch, strict=False, cdtype=cdtype)
    if w.ndim == 2:
        w = w[None]                      # shared transfer fn -> (1, s, s)
    ph = gs_phasors(f_x, f_y, poslgs_amin, cdtype)
    M = (w * jnp.exp(2j * np.pi * h_recons * ph)
         * gs_mask[:, None, None])
    num = M.conj() / sigr[:, None, None]
    den = jnp.sum((M * num).real, axis=0)
    if dsp_recons is not None:
        prior = 1.0 / dsp_recons
        prior = prior.at[0, 0].set(0.0)   # piston filtered (psfrec.py:305)
        den = den + prior
    inv = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den), 0.0)
    inv = inv.at[0, 0].set(0.0)
    return num * inv[None]


def residual_psd_one_dir(f, f_x, f_y, poslgs_amin, gs_mask, beta_amin, sigv,
                         dsp_layers, h_layers, h_dm, W, td, ti, wind, pitch,
                         cdtype):
    """Residual phase PSD (s, s) for one evaluation direction.

    Reconstruction error + propagated WFS noise with servo-lag phasors
    (reference ``calc_dsp_res_glao_finale`` psfrec.py:367-525 with
    tempo=True, fitting=True — the shipped path; the final band-cut branch
    there is dead).
    """
    w = wfs_transfer(f, f_x, f_y, pitch, strict=True, cdtype=cdtype)
    if w.ndim == 2:
        w = w[None]                      # shared transfer fn -> (1, s, s)
    ph = gs_phasors(f_x, f_y, poslgs_amin, cdtype)    # (g, s, s)

    # model matrix for the true profile, with the servo-lag sinc
    # (l = true layer, g = guide star)
    lag = jnp.sinc(wind[0, :, None, None, None] * ti[None, :, None, None] * f_x
                   + wind[1, :, None, None, None] * ti[None, :, None, None] * f_y)
    Mv = (lag * w[None] *
          jnp.exp(2j * np.pi * h_layers[:, None, None, None] * ph[None]) *
          gs_mask[None, :, None, None])                         # (l, g, s, s)

    # projector onto the evaluation direction, with frozen-flow back-shift
    dT = jnp.max(ti) + td
    bdot = beta_amin[0] * f_x + beta_amin[1] * f_y
    p_beta = jnp.exp(2j * np.pi * (
        h_layers[:, None, None] * ARCMIN_TO_RAD * bdot[None]
        - dT * (wind[0, :, None, None] * f_x + wind[1, :, None, None] * f_y)))
    p_dm = jnp.exp(2j * np.pi * h_dm * ARCMIN_TO_RAD * bdot)

    p_w = p_dm[None] * W                                        # (g, s, s)
    p_model = jnp.einsum("gxy,lgxy->lxy", p_w, Mv)
    proj = p_beta - p_model

    err_recons = jnp.sum(jnp.abs(proj) ** 2 * dsp_layers, axis=0)
    err_recons = err_recons.at[0, 0].set(0.0)
    err_noise = jnp.sum(jnp.abs(p_w) ** 2 * sigv[:, None, None], axis=0)
    err_noise = err_noise.at[0, 0].set(0.0)
    return err_recons + err_noise


def residual_variance(psd, pixsize, dpup):
    """Residual variance [rad^2] from an FFT-ordered PSD, excluding the
    central 1/D box (reference ``calc_var_from_psd``, psfrec.py:206-215).
    Debug metric reported per direction at DEBUG level."""
    from ..core.grids import pupil_mask
    box = (1.0 / dpup) / pixsize
    mask = pupil_mask(box / 2.0, psd.shape[-1], inverse=True,
                      dtype=psd.dtype)
    shifted = jnp.fft.fftshift(psd, axes=(-2, -1)) * pixsize ** 2
    return jnp.sum(shifted * mask, axis=(-2, -1))


def effective_wind_speed(h, cfg: GalacsiConfig) -> float:
    """Wind speed actually used for the altitude array ``h``.

    QUIRK (psfrec.py:61): the reference builds the wind-speed array with
    ``np.full_like(h, 12.5)``, which inherits ``h``'s dtype — the default
    integer altitudes (100, 10000) silently truncate 12.5 -> 12 m/s.
    """
    return float(np.full(2, cfg.wind_speed, dtype=np.asarray(h).dtype)[0])


@partial(jax.jit, static_argnames=("npsflin", "cfg"))
def simulate_psd(seeing, GL, L0, gs_mask, h, wind_speed, npsflin: int,
                 cfg: GalacsiConfig, zenith=0.0):
    """Residual-phase PSD cube (ndir, dim, dim), image-centred, nm^2/freq^2.

    JAX equivalent of reference ``simul_psd_wfm`` (psfrec.py:36-151):
    correction-zone GLAO PSD merged (max) with the fitting-error PSD on the
    full grid, scaled to nm^2.  ``gs_mask`` is the float (4,) guide-star
    validity mask replacing the reference's 3-LGS geometry switch;
    ``wind_speed`` comes from :func:`effective_wind_speed`.  ``zenith``
    [deg] only rescales the Fried parameter (the line-of-sight altitudes
    are computed but unused in the reference, psfrec.py:109-112).
    """
    dtype = jnp.dtype(cfg.dtype)
    cdtype = jnp.dtype(cfg.cdtype)
    cn2 = jnp.stack([GL, 1.0 - GL]).astype(dtype)
    cn2 = cn2 / jnp.sum(cn2)
    h = jnp.asarray(h, dtype)

    wind_dir = np.array([cfg.wind_dir_0, cfg.wind_dir_1])
    wind = wind_speed * jnp.asarray(
        np.stack([np.cos(wind_dir), np.sin(wind_dir)]), dtype)

    r0ref = seeing_to_r0(seeing, cfg.lambda_ref, zenith).astype(dtype)

    s = cfg.dimall
    f, f_x, f_y = fft_freq_polar(s, cfg.dpup / cfg.dim_pup, dtype)
    poslgs_amin = jnp.asarray(lgs_positions(cfg.sep_lgs) / 60.0, dtype)
    dirs_amin = jnp.asarray(direction_grid(npsflin) / 60.0, dtype)

    nb_gs = 4
    sigr = jnp.full((nb_gs,), cfg.noise_lgs2, dtype)
    ti = jnp.full((nb_gs,), 1.0 / cfg.fsamp, dtype)
    td = cfg.delay_ms * 1e-3

    dsp_layers = vk_psd(f[None], cn2[:, None, None] ** (-3 / 5) * r0ref, L0)
    dsp_recons = None
    if not cfg.lse:
        dsp_recons = vk_psd(f, r0ref, L0)

    W = glao_reconstructor(f, f_x, f_y, poslgs_amin, gs_mask, sigr,
                           cfg.pitch, cfg.alt_dm, cdtype,
                           dsp_recons=dsp_recons)

    psd_dir = jax.vmap(
        lambda beta: residual_psd_one_dir(
            f, f_x, f_y, poslgs_amin, gs_mask, beta, sigr, dsp_layers, h,
            cfg.alt_dm, W, td, ti, wind, cfg.pitch, cdtype)
    )(dirs_amin.T)                                   # (ndir, s, s)
    # QUIRK (psfrec.py:611-613): IDL row/column convention
    psd_dir = jnp.swapaxes(psd_dir, -1, -2)
    # DC to centre for the merge
    psd_dir = jnp.fft.fftshift(psd_dir, axes=(-2, -1))

    f_full = jnp.asarray(centered_freq_radius(cfg.dim, 2.0 * cfg.dpup), dtype)
    full = fitting_psd(f_full, r0ref, L0, cfg.fc)

    lo = cfg.dim // 2 - cfg.dim_pup
    block = jnp.maximum(full[lo:lo + s, lo:lo + s][None], psd_dir)
    ndir = npsflin * npsflin
    out = jnp.broadcast_to(full, (ndir, cfg.dim, cfg.dim))
    out = jax.lax.dynamic_update_slice(out, block, (0, lo, lo))
    return out * (cfg.lambda_ref * 1000.0 / (2 * np.pi)) ** 2
