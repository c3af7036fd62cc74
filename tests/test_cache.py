"""Persistent-compilation-cache wiring (utils/cache.py)."""

import os

import jax

from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("LFBM5D_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = str(tmp_path / "cache")
        got = enable_persistent_compilation_cache(d)
        assert got == d
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)
        # second call leaves the configured dir alone
        assert enable_persistent_compilation_cache(str(tmp_path / "o")) == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_opt_out_env(monkeypatch, tmp_path):
    monkeypatch.setenv("LFBM5D_NO_COMPILE_CACHE", "1")
    assert enable_persistent_compilation_cache(str(tmp_path / "c")) is None


def test_cache_round_trip(tmp_path, monkeypatch):
    """A jitted program executes correctly with the disk cache enabled and
    populates it (CPU backend; the TPU benefit is measured in BASELINE.md)."""
    monkeypatch.delenv("LFBM5D_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = str(tmp_path / "cache")
        enable_persistent_compilation_cache(d)

        import jax.numpy as jnp

        f = jax.jit(lambda x: x * 2.0 + 1.0)
        out = f(jnp.arange(8.0))
        assert float(out[3]) == 7.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
