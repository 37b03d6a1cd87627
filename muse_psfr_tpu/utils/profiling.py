"""Profiling and tracing hooks.

The reference has no profiling support (SURVEY.md §5); here every batch
API can report per-stage wall times at DEBUG level, and a JAX profiler
trace can be captured around any region by setting the environment
variable ``MUSE_PSFR_PROFILE_DIR`` (open the trace with TensorBoard or
Perfetto).
"""

import os
import time
from contextlib import contextmanager

from .log import get_logger

logger = get_logger("profile")


@contextmanager
def stage_timer(name):
    """Log the wall time of a stage at DEBUG level."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.debug("stage %-24s %8.3f ms", name,
                     (time.perf_counter() - t0) * 1e3)


@contextmanager
def maybe_trace(label="muse_psfr"):
    """Capture a jax.profiler trace if MUSE_PSFR_PROFILE_DIR is set."""
    trace_dir = os.environ.get("MUSE_PSFR_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
