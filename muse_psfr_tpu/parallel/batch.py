"""Batched / sharded PSF reconstruction over SPARTA work items.

The reference parallelises over telemetry rows with a joblib process pool
(reference psfrec.py:1082-1083) — embarrassing data parallelism with no
inter-worker communication.  The TPU-native equivalent: work items
(seeing, GL, L0, guide-star mask) become a batch axis of one jitted
program; the batch axis is

* **vmapped** on one chip (chunked to bound the PSD-cube working set), and
* **sharded** across chips of a ``jax.sharding.Mesh`` over ICI when a mesh
  is provided — XLA partitions the whole pipeline; the only cross-device
  traffic in the pipeline is the final gather of (nl, dimpsf, dimpsf)
  cubes, so scaling is linear.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GalacsiConfig
from ..psd.model import simulate_psd, simulate_psd_split
from ..otf.psf import psf_cube, psf_cube_from_base, dphi_base_split
from ..otf.convolve import convolve_final


def reconstruct_one(seeing, GL, L0, gs_mask, lbda, h, wind_speed,
                    npsflin: int, cfg: GalacsiConfig):
    """Single work item: telemetry -> final PSF cube (nl, dimpsf, dimpsf).

    With ``cfg.use_dphi_split`` the full-grid PSD is never materialised:
    the fitting-PSD part of the structure function comes from precomputed
    per-config constants and only the correction-zone block is
    transformed (valid for L0 >= cfg.dphi_split_l0_min — the batch entry
    points check this on the host and fall back to the exact path).
    """
    if cfg.use_dphi_split:
        w, delta = simulate_psd_split(seeing, GL, L0, gs_mask, h,
                                      wind_speed, npsflin, cfg)
        psf = psf_cube_from_base(dphi_base_split(w, delta, cfg), lbda, cfg)
    else:
        psd = simulate_psd(seeing, GL, L0, gs_mask, h, wind_speed, npsflin,
                           cfg)
        psf = psf_cube(psd, lbda, cfg)
    return convolve_final(psf, lbda, seeing, GL, L0, cfg)


@partial(jax.jit, static_argnames=("h", "wind_speed", "npsflin", "cfg"))
def _reconstruct_vmapped(seeing, GL, L0, gs_mask, lbda, h, wind_speed,
                         npsflin, cfg):
    return jax.vmap(
        lambda s, g, l, m: reconstruct_one(s, g, l, m, lbda, h, wind_speed,
                                           npsflin, cfg)
    )(seeing, GL, L0, gs_mask)


@partial(jax.jit, static_argnames=("h", "wind_speed", "npsflin", "cfg"))
def _reconstruct_chunk(t, lbda, h, wind_speed, npsflin, cfg):
    """One (chunk, 7) telemetry slice laid out [seeing, GL, L0, gs_mask(4)]
    -> PSF cubes.  The slice shape is the compilation key: callers must
    slice the device-resident table *outside* (with a traced offset, so
    the total batch size never enters any compiled program)."""
    return jax.vmap(
        lambda row: reconstruct_one(row[0], row[1], row[2], row[3:7],
                                    lbda, h, wind_speed, npsflin, cfg)
    )(t)


from .mesh import default_mesh  # noqa: E402  (re-exported here for API)

_FFT_OK = {}


def fft_available() -> bool:
    """Probe whether the current default backend executes FFTs.

    Some TPU runtime deployments lack (or transiently lose) the FFT
    custom call; the pipeline then falls back to its exact FFT-free
    MXU path.  Result cached per backend.
    """
    backend = jax.default_backend()
    if backend not in _FFT_OK:
        import os
        forced = os.environ.get("MUSE_PSFR_FFT")
        if forced is not None:
            _FFT_OK[backend] = forced not in ("0", "false", "no")
        elif backend == "cpu":
            _FFT_OK[backend] = True
        else:
            # Probe in a subprocess: a failed FFT execution poisons the
            # whole client (subsequent transfers fail too), so it must not
            # happen in this process.  Probe at a production-like size —
            # tiny/constant FFTs can succeed even when the runtime's real
            # FFT custom call is unavailable.
            import subprocess
            import sys
            code = ("import jax, numpy as np, jax.numpy as jnp;"
                    "x = jax.device_put(np.zeros((256,256), np.complex64));"
                    "y = jax.jit(lambda a: jnp.fft.ifft2(a).real.sum())(x);"
                    "np.asarray(y)")
            try:
                proc = subprocess.run([sys.executable, "-c", code],
                                      capture_output=True, timeout=120)
                _FFT_OK[backend] = proc.returncode == 0
            except Exception:  # noqa: BLE001
                _FFT_OK[backend] = False
    return _FFT_OK[backend]


def resolve_fft_mode(cfg: GalacsiConfig) -> GalacsiConfig:
    """Downgrade ``cfg.use_fft`` if the backend cannot run FFTs."""
    if cfg.use_fft and not fft_available():
        if not cfg.use_zoom_dft:
            cfg = cfg.with_(use_zoom_dft=True)
        cfg = cfg.with_(use_fft=False)
    return cfg


def _run_chunks(seeing, GL, L0, gs_mask, lbda, h=(100, 10000),
                npsflin: int = 1, cfg: GalacsiConfig = None,
                chunk: int = 8, mesh: Mesh = None):
    """Yield (n_valid, psf_chunk device array) over padded chunks.

    ``chunk`` bounds the per-step working set (each item holds an
    (ndir, dim, dim) PSD cube on device).  With ``mesh``, each chunk's
    batch axis is sharded across the mesh's devices; ``chunk`` is rounded
    up to a multiple of the mesh size and the batch padded accordingly.
    All chunks are dispatched with identical shapes (one compilation).
    """
    from ..psd.model import effective_wind_speed
    cfg = resolve_fft_mode(cfg or GalacsiConfig())
    wind_speed = effective_wind_speed(h, cfg)

    # the lambda-dependent crop must fit inside the PSD grid; the bluest
    # wavelength sets the largest crop (reference psfrec.py:663-664 slices
    # out of bounds there, failing with a confusing shape error)
    lb_np = np.atleast_1d(np.asarray(lbda, dtype=np.float64))
    npixc_max = int(np.round((cfg.dimpsf * cfg.pixscale * 2.0 * cfg.dpup
                              * 4.85 * 1000.0 / lb_np.min()) / 2.0) * 2.0)
    if npixc_max > cfg.dim:
        raise ValueError(
            f"wavelength {lb_np.min():.1f} nm needs a {npixc_max} px crop, "
            f"larger than the {cfg.dim}^2 PSD grid; raise cfg.dim or the "
            f"minimum wavelength")
    h_t = tuple(float(x) for x in np.asarray(h, dtype=np.float64).ravel())
    lbda = jnp.asarray(lbda, cfg.dtype)
    seeing = np.atleast_1d(np.asarray(seeing, dtype=np.float64))
    GL = np.atleast_1d(np.asarray(GL, dtype=np.float64))
    L0 = np.atleast_1d(np.asarray(L0, dtype=np.float64))

    # the split path's fitting-PSD expansion is certified only for
    # L0 >= dphi_split_l0_min; outlier rows get the exact full transform
    if cfg.use_dphi_split and np.any(L0 < cfg.dphi_split_l0_min):
        cfg = cfg.with_(use_dphi_split=False)
    gs_mask = np.atleast_2d(np.asarray(gs_mask, dtype=np.float64))
    B = seeing.shape[0]

    n_dev = 1 if mesh is None else mesh.size
    chunk = max(min(chunk, B), n_dev)
    chunk = ((chunk + n_dev - 1) // n_dev) * n_dev

    sharding = None
    if mesh is not None:
        sharding = NamedSharding(mesh, P("rows"))

    # ONE host->device push of the whole telemetry table (the tunneled
    # link is latency-bound, so per-chunk per-column pushes dominated the
    # steady state); chunks are sliced out on device inside the jitted
    # step.  Pad the batch so every chunk dispatch has the same shape
    # (one compilation); padding repeats the last row (pad results are
    # discarded via the yielded count).
    n_pad = (-B) % chunk
    table = np.concatenate(
        [seeing[:, None], GL[:, None], L0[:, None], gs_mask], axis=1)
    if n_pad:
        table = np.concatenate(
            [table, np.repeat(table[-1:], n_pad, axis=0)], axis=0)

    if sharding is None:
        table_d = jnp.asarray(table, cfg.dtype)
        for lo in range(0, B, chunk):
            # eager dynamic slice: traced offset + static size, so it
            # compiles once for any batch size and any chunk position —
            # the full table shape never reaches the pipeline executable
            t = jax.lax.dynamic_slice_in_dim(
                table_d, jnp.asarray(lo, jnp.int32), chunk, axis=0)
            res = _reconstruct_chunk(t, lbda, h_t, wind_speed, npsflin,
                                     cfg)
            yield min(chunk, B - lo), res
        return

    # mesh path: ONE host->device push of the whole padded table (the
    # tunneled/DCN link is latency-bound, so per-chunk pushes dominated:
    # n_chunks transfers vs one for the same bytes), laid out
    # (n_chunks, chunk, 7) with the *chunk* axis sharded across the mesh.
    # Each chunk is then a static slice along the unsharded leading axis
    # — device-local, no cross-device gather (a traced-offset slice of a
    # row-sharded axis would make XLA conservatively all-gather).
    n_chunks = table.shape[0] // chunk
    table_d = jax.device_put(
        jnp.asarray(table.reshape(n_chunks, chunk, table.shape[1]),
                    cfg.dtype),
        NamedSharding(mesh, P(None, "rows")))
    for i in range(n_chunks):
        t = jax.device_put(table_d[i], sharding)  # no-op reshard guard
        res = _reconstruct_vmapped(t[:, 0], t[:, 1], t[:, 2], t[:, 3:7],
                                   lbda, h_t, wind_speed, npsflin, cfg)
        yield min(chunk, B - i * chunk), res


def reconstruct_batch(seeing, GL, L0, gs_mask, lbda, h=(100, 10000),
                      npsflin: int = 1, cfg: GalacsiConfig = None,
                      chunk: int = 8, mesh: Mesh = None):
    """Reconstruct PSF cubes for a batch of work items.

    Parameters are (B,)-shaped arrays (``gs_mask``: (B, 4) float validity
    mask).  Returns a (B, nl, dimpsf, dimpsf) numpy array.  Note: this
    pulls every PSF to the host; for fit-oriented workflows prefer
    :func:`process_batch`, which keeps the cubes on device.
    """
    outs = [np.asarray(res)[:n] for n, res in
            _run_chunks(seeing, GL, L0, gs_mask, lbda, h, npsflin, cfg,
                        chunk, mesh)]
    return np.concatenate(outs, axis=0)


def pull_packed(*arrays):
    """Pull several device arrays to the host in ONE transfer.

    The device->host link of a tunneled TPU is latency-bound (~37 ms per
    pull regardless of size); concatenating the raveled arrays on device
    and pulling once amortises that latency across all results.  Returns
    the arrays as numpy, original shapes restored.
    """
    arrays = [jnp.asarray(a) for a in arrays]
    shapes = [a.shape for a in arrays]
    dt = jnp.result_type(*arrays)
    flat = np.asarray(jnp.concatenate([jnp.ravel(a).astype(dt)
                                       for a in arrays]))
    out, off = [], 0
    for s in shapes:
        n = int(np.prod(s)) if s else 1
        out.append(flat[off:off + n].reshape(s))
        off += n
    return out


def process_batch(seeing, GL, L0, gs_mask, lbda, h=(100, 10000),
                  npsflin: int = 1, cfg: GalacsiConfig = None,
                  chunk: int = 8, mesh: Mesh = None,
                  fit_dtype: str = None, on_chunk=None):
    """Full device-resident batch: reconstruct, Moffat-fit, and average.

    Returns ``(fit_packed, psf_mean, fit_mean_packed)`` — device arrays:
    per-item per-wavelength packed Moffat parameters (B, nl, N_PACKED)
    (see :data:`muse_psfr_tpu.fit.moffat_fit.PACKED_FIELDS`), the
    (nl, dimpsf, dimpsf) mean PSF cube, and its packed fit.  Only these
    small arrays ever cross the device->host link (which is slow on
    tunneled TPUs); the (B, nl, dimpsf, dimpsf) PSF cubes never leave the
    device.  Unpack with :func:`muse_psfr_tpu.fit.moffat_fit.unpack_fit`.

    ``on_chunk(start_index, packed_numpy)`` is an optional incremental
    sink called after each chunk completes (the reference has nothing
    comparable; use it to checkpoint long sweeps — it pulls each chunk's
    packed fits to the host, which costs one small transfer per chunk).
    """
    from ..fit.moffat_fit import fit_moffat_cube_packed
    cfg = cfg or GalacsiConfig()
    fit_dtype = fit_dtype or cfg.fit_dtype

    fits = []
    total = None
    count = 0
    for n, psf in _run_chunks(seeing, GL, L0, gs_mask, lbda, h, npsflin,
                              cfg, chunk, mesh):
        fits.append(fit_moffat_cube_packed(psf, dtype=fit_dtype)[:n])
        s = jnp.sum(psf[:n], axis=0)
        total = s if total is None else total + s
        if on_chunk is not None:
            on_chunk(count, np.asarray(fits[-1]))
        count += n

    fit = jnp.concatenate(fits, axis=0) if len(fits) > 1 else fits[0]
    psf_mean = total / count
    fit_mean = fit_moffat_cube_packed(psf_mean, dtype=fit_dtype)
    return fit, psf_mean, fit_mean
