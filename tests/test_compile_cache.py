"""Persistent-compilation-cache utility behavior."""

import importlib
import os

import flowdenoising_tpu.utils.compile_cache as cc


def _fresh():
    return importlib.reload(cc)


def test_disabled_by_env(monkeypatch, tmp_path):
    m = _fresh()
    monkeypatch.setenv("FDTPU_NO_CACHE", "1")
    assert m.enable_compilation_cache(str(tmp_path / "c")) is None
    assert not (tmp_path / "c").exists()


def test_first_call_wins_and_creates_dir(monkeypatch, tmp_path):
    m = _fresh()
    monkeypatch.delenv("FDTPU_NO_CACHE", raising=False)
    monkeypatch.delenv("FDTPU_CACHE_DIR", raising=False)
    d1 = str(tmp_path / "one")
    d2 = str(tmp_path / "two")
    assert m.enable_compilation_cache(d1) == d1
    assert os.path.isdir(d1)
    # idempotent: the active dir is returned, the second request ignored
    assert m.enable_compilation_cache(d2) == d1
    assert not os.path.exists(d2)

    import jax
    assert jax.config.jax_compilation_cache_dir == d1


def test_env_dir_used(monkeypatch, tmp_path):
    m = _fresh()
    monkeypatch.delenv("FDTPU_NO_CACHE", raising=False)
    d = str(tmp_path / "envdir")
    monkeypatch.setenv("FDTPU_CACHE_DIR", d)
    assert m.enable_compilation_cache() == d
