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


def test_prune_cache_dir_removes_oldest(tmp_path):
    from tracknetv3_tpu.utils.compile_cache import prune_cache_dir

    d = str(tmp_path / "cache")
    os.makedirs(os.path.join(d, "programs"))
    files = []
    for i in range(4):
        p = os.path.join(d, "programs" if i % 2 else "", f"blob{i}.bin")
        with open(p, "wb") as f:
            f.write(b"x" * 1000)
        os.utime(p, (1000 + i, 1000 + i))  # oldest-access first
        files.append(p)
    # cap at 2500 bytes -> the two oldest of the four 1000-byte files go
    removed = prune_cache_dir(d, max_bytes=2500)
    assert removed == 2
    assert not os.path.exists(files[0]) and not os.path.exists(files[1])
    assert os.path.exists(files[2]) and os.path.exists(files[3])
    # under the cap: no-op
    assert prune_cache_dir(d, max_bytes=2500) == 0
    # missing dir: no-op, no raise
    assert prune_cache_dir(str(tmp_path / "nope"), max_bytes=1) == 0


def test_prune_cache_env_cap(tmp_path, monkeypatch):
    from tracknetv3_tpu.utils.compile_cache import prune_cache_dir

    d = str(tmp_path / "cache2")
    os.makedirs(d)
    with open(os.path.join(d, "a.bin"), "wb") as f:
        f.write(b"x" * 100)
    monkeypatch.setenv("TRACKNETV3_TPU_CACHE_MAX_GB", "not-a-number")
    assert prune_cache_dir(d) == 0  # falls back to the 8 GB default
