"""Shim: ``from muse_psfr.cli import main`` (reference cli.py)."""

from muse_psfr_tpu.cli import main, build_parser  # noqa: F401
