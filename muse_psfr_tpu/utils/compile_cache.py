"""Persistent XLA compilation cache wiring (cold-start mitigation).

The production pipeline compiles in minutes per shape per process while
the computation itself takes milliseconds — a fresh ``muse-psfr
--values 1,0.7,25`` run pays minutes of compile for ~0.05 s of compute
(the pure-NumPy reference pays zero compile; reference cli.py:63-64
runs in one process).  JAX's persistent compilation cache removes that
cost from every process after the first **on backends that compile
locally**: the second fresh-process run loads the serialized
executables in seconds.

Deployment rules (mirrors ``parallel.batch._warm_enabled``):

* **ON by default for local-compile backends** (CPU, directly-attached
  TPU): cache dir ``$XDG_CACHE_HOME/muse_psfr_tpu/jax_cache`` (or
  ``~/.cache/...``).
* **OFF on the axon remote-compile tunnel**: cached executables fail
  with UNIMPLEMENTED at dispatch there (measured round 1; the compile
  service owns the real executable).
* ``MUSE_PSFR_COMPILE_CACHE=0`` forces off, ``=1`` forces on at the
  default directory, ``=/some/path`` forces on there.

Call :func:`ensure_compile_cache` before the first compile; it is
idempotent and cheap, so every public entry point calls it.
"""

import os

import jax

from .log import get_logger

logger = get_logger()

_DONE = None     # tri-state: None = not decided, False = off, str = dir


def _default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "muse_psfr_tpu", "jax_cache")


def _backend_supports_cache() -> bool:
    """Local-compile backends only: the axon remote-compile service
    owns the real executable, and a cache hit there dispatches an
    executable the runtime never built (UNIMPLEMENTED)."""
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:  # noqa: BLE001 — unknown backend: assume local
        return True
    return "axon" not in pv.lower()


def host_cache_dir():
    """Directory for HOST-side precomputed tables (numpy, backend
    independent — safe on every deployment, axon included), or ``None``
    when disabled with ``MUSE_PSFR_HOST_CACHE=0``.  Tables are keyed by
    their full parameter tuple plus a format version, so stale entries
    are never read; writes are atomic (tmp + rename)."""
    v = os.environ.get("MUSE_PSFR_HOST_CACHE")
    if v is not None and v.strip() in ("0", "false", "no"):
        return None
    path = (v if v and v.strip() not in ("1", "true", "yes")
            else os.path.join(_default_cache_dir(), "..", "host_cache"))
    path = os.path.normpath(path)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    return path


def host_cache_load(name: str, key: tuple):
    """Load dict-of-arrays for (name, key), or None on any miss."""
    import numpy as np
    d = host_cache_dir()
    if d is None:
        return None
    import hashlib
    h = hashlib.sha256(repr(key).encode()).hexdigest()[:24]
    path = os.path.join(d, f"{name}-{h}.npz")
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:  # noqa: BLE001 — missing/corrupt: recompute
        return None


def host_cache_store(name: str, key: tuple, arrays: dict):
    """Atomically store dict-of-arrays under (name, key); best-effort."""
    import numpy as np
    d = host_cache_dir()
    if d is None:
        return
    import hashlib
    import tempfile
    h = hashlib.sha256(repr(key).encode()).hexdigest()[:24]
    path = os.path.join(d, f"{name}-{h}.npz")
    try:
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    except Exception as err:  # noqa: BLE001
        logger.debug("host cache store failed for %s: %s", name, err)


def ensure_compile_cache() -> bool:
    """Enable the persistent compilation cache when the deployment
    supports it.  Returns whether the cache is active.  Idempotent:
    the decision (including the backend sniff, which initializes the
    backend) is made once per process."""
    global _DONE
    if _DONE is not None:
        return bool(_DONE)
    forced = os.environ.get("MUSE_PSFR_COMPILE_CACHE")
    if forced is not None and forced.strip() in ("0", "false", "no", ""):
        _DONE = False
        return False
    if forced is not None and forced.strip() not in ("1", "true", "yes"):
        cache_dir = forced
    else:
        cache_dir = _default_cache_dir()
        if forced is None and not _backend_supports_cache():
            _DONE = False
            return False
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # the night's executables are all multi-second compiles, but the
        # CLI's tiny fit/plot helpers benefit too — cache everything.
        # The DIR is set LAST: a failure on any earlier update (e.g. a
        # JAX version without these config names) must leave the cache
        # fully off, never half-enabled.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        _DONE = cache_dir
        logger.debug("persistent compilation cache at %s", cache_dir)
        return True
    except Exception as err:  # noqa: BLE001 — cache is best-effort
        logger.warning("could not enable the persistent compilation "
                       "cache at %s: %s", cache_dir, err)
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:  # noqa: BLE001
            pass
        _DONE = False
        return False
