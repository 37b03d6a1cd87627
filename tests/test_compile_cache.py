"""Persistent-compilation-cache wiring (utils/compile_cache.py).

The real cold-start effect is measured by
``benchmarks/measure_cold_start.py`` (fresh subprocesses); these tests
pin the decision logic only.
"""

import os

import pytest

from muse_psfr_tpu.utils import compile_cache as cc


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    import jax
    monkeypatch.setattr(cc, "_DONE", None)
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_forced_off(monkeypatch):
    monkeypatch.setenv("MUSE_PSFR_COMPILE_CACHE", "0")
    assert cc.ensure_compile_cache() is False


def test_forced_path(monkeypatch, tmp_path):
    import jax
    target = str(tmp_path / "cache")
    monkeypatch.setenv("MUSE_PSFR_COMPILE_CACHE", target)
    assert cc.ensure_compile_cache() is True
    assert jax.config.jax_compilation_cache_dir == target
    assert os.path.isdir(target)


def test_idempotent(monkeypatch, tmp_path):
    target = str(tmp_path / "cache")
    monkeypatch.setenv("MUSE_PSFR_COMPILE_CACHE", target)
    assert cc.ensure_compile_cache() is True
    # the decision is sticky: a later env change does not re-decide
    monkeypatch.setenv("MUSE_PSFR_COMPILE_CACHE", "0")
    assert cc.ensure_compile_cache() is True


def test_default_follows_backend_sniff(monkeypatch, tmp_path):
    monkeypatch.delenv("MUSE_PSFR_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setattr(cc, "_backend_supports_cache", lambda: False)
    assert cc.ensure_compile_cache() is False
    monkeypatch.setattr(cc, "_DONE", None)
    monkeypatch.setattr(cc, "_backend_supports_cache", lambda: True)
    assert cc.ensure_compile_cache() is True
    assert os.path.isdir(str(tmp_path / "muse_psfr_tpu" / "jax_cache"))
