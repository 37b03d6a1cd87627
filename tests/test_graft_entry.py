"""The driver-facing entry points must stay jittable / executable.

``entry()`` is compile-checked by the driver on a single chip and
``dryrun_multichip`` is executed over a virtual multi-device mesh — a
tracing bug in either is invisible to the rest of the suite (the library
tests go through the batch API), so pin them here.
"""

import jax

import __graft_entry__ as graft


def test_entry_traces_and_lowers():
    fn, args = graft.entry()
    # Lowering runs the full trace (catches host-side numpy conversions,
    # data-dependent control flow, shape errors) without paying the
    # multi-minute CPU compile of the 1280^2 pipeline.
    lowered = jax.jit(fn).lower(*args)
    psf_aval, fwhm_aval, n_aval = lowered.out_info
    assert psf_aval.shape[-2:] == (40, 40)
    assert fwhm_aval.shape == n_aval.shape


def test_dryrun_multichip_executes():
    graft.dryrun_multichip(8)
