"""Shim: ``from muse_psfr.version import version`` (reference version.py)."""

from muse_psfr_tpu import __version__ as version  # noqa: F401
