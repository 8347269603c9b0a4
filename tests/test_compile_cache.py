"""Persistent compilation cache opt-in (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp

from openviic_tpu.config import ConfigNode
from openviic_tpu.utils import maybe_enable_compilation_cache


def _cfg(path):
    return ConfigNode(
        {"TRAINING": {"COMPILATION_CACHE_DIR": path}}
    )


def test_disabled_by_default():
    assert maybe_enable_compilation_cache(ConfigNode({"TRAINING": {}})) is None


def test_enables_and_populates(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENVIIC_COMPILE_CACHE", raising=False)
    # the default 1 s compile-time threshold would skip this tiny program
    monkeypatch.setenv("OPENVIIC_COMPILE_CACHE_MIN_SECS", "0")
    cache_dir = str(tmp_path / "xla_cache")
    got = maybe_enable_compilation_cache(_cfg(cache_dir))
    assert got == cache_dir
    assert os.path.isdir(cache_dir)

    # a fresh HLO (unique constant) must appear in the cache dir; the CPU
    # backend supports the persistent cache via the xla-caches knob
    x = jnp.arange(8.0)

    @jax.jit
    def f(v):
        return (v * 3.25 + 17.125).sum()

    f(x).block_until_ready()
    entries = os.listdir(cache_dir)
    assert entries, "compile produced no persistent cache entry"


def test_env_var_wins(tmp_path, monkeypatch):
    env_dir = str(tmp_path / "env_cache")
    monkeypatch.setenv("OPENVIIC_COMPILE_CACHE", env_dir)
    got = maybe_enable_compilation_cache(_cfg(str(tmp_path / "cfg_cache")))
    assert got == env_dir


def test_empty_string_force_disables(tmp_path, monkeypatch):
    """Docstring contract: an empty OPENVIIC_COMPILE_CACHE force-disables
    the cache even after an earlier call in this process enabled it."""
    import openviic_tpu.utils.compile_cache as cc

    monkeypatch.delenv("OPENVIIC_COMPILE_CACHE", raising=False)
    cache_dir = str(tmp_path / "on_then_off")
    assert maybe_enable_compilation_cache(_cfg(cache_dir)) == cache_dir
    assert cc._ENABLED_DIR == cache_dir

    monkeypatch.setenv("OPENVIIC_COMPILE_CACHE", "")
    assert maybe_enable_compilation_cache(_cfg(cache_dir)) is None
    assert cc._ENABLED_DIR is None
    assert jax.config.jax_compilation_cache_dir is None
    # and stays off on a later no-env call with no config
    monkeypatch.delenv("OPENVIIC_COMPILE_CACHE", raising=False)
    assert (
        maybe_enable_compilation_cache(ConfigNode({"TRAINING": {}})) is None
    )
