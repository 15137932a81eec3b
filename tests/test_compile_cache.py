"""Persistent-compile-cache enablement knob (utils/compile_cache.py)."""

import os

import jax
import pytest

from tracknetv3_tpu.utils.compile_cache import (
    default_cache_dir,
    enable_persistent_cache,
)


@pytest.fixture()
def restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_creates_dir_and_sets_config(tmp_path, restore_cache_config):
    d = str(tmp_path / "xla_cache")
    got = enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_env_var_overrides_location(tmp_path, monkeypatch, restore_cache_config):
    d = str(tmp_path / "env_cache")
    monkeypatch.setenv("TRACKNETV3_TPU_CACHE_DIR", d)
    assert enable_persistent_cache() == d
    assert os.path.isdir(d)


@pytest.mark.parametrize("off", ["0", "off", "OFF", "none", "false"])
def test_env_var_disables(monkeypatch, off, restore_cache_config):
    monkeypatch.setenv("TRACKNETV3_TPU_CACHE_DIR", off)
    assert enable_persistent_cache() is None


def test_default_dir_is_user_scoped(monkeypatch):
    monkeypatch.delenv("XDG_CACHE_HOME", raising=False)
    assert default_cache_dir().endswith(os.path.join("tracknetv3_tpu", "xla"))


def test_unwritable_dir_downgrades_to_warning(restore_cache_config):
    # optimization only: a bad location must not raise
    assert enable_persistent_cache("/proc/definitely/not/writable") is None
