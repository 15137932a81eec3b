"""Persistent XLA compilation cache: the cold-start killer.

The reference pays zero compile latency (eager torch; reference
predict.py:98-115 loads weights and runs immediately). A fresh JAX
process pays the full XLA compile of every program it runs — on this
runtime's remote TPU compiler that is 40-334 s before the first video
(PROFILE.md), which would dominate short jobs end-to-end.

JAX's persistent compilation cache closes the gap: compiled executables
are serialized to disk keyed by (HLO, jaxlib version, backend version,
compile options), and a later process LOADS them instead of recompiling —
measured ~30-50 ms per program through this TPU relay vs minutes of
remote compile. All CLIs enable it by default; the cache directory is
shared per user so train/test/predict sessions warm each other.

Environment:
  TRACKNETV3_TPU_CACHE_DIR     cache location (default
                               ~/.cache/tracknetv3_tpu/xla);
                               set to "0", "off" or "" to disable.
  TRACKNETV3_TPU_CACHE_MAX_GB  size cap for the cache tree (default 8;
                               oldest entries are pruned past it - the
                               executable cache grows with every program
                               shape and AOT program blobs embed model
                               weights at ~20 MB each).
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLED = {"0", "off", "none", "false"}


def prune_cache_dir(cache_dir: str, max_bytes: Optional[int] = None) -> int:
    """Bound the cache tree: delete oldest-access files until under the
    cap. Returns the number of files removed. Never raises - the cache
    is an optimization, and a concurrent process may race deletions."""
    if max_bytes is None:
        try:
            gb = float(os.environ.get("TRACKNETV3_TPU_CACHE_MAX_GB", "8"))
        except ValueError:
            gb = 8.0
        max_bytes = int(gb * 1e9)
    entries = []
    total = 0
    try:
        for root, _, names in os.walk(cache_dir):
            for n in names:
                p = os.path.join(root, n)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                entries.append((st.st_atime, st.st_size, p))
                total += st.st_size
    except OSError:
        return 0
    removed = 0
    if total <= max_bytes:
        return 0
    for _, size, p in sorted(entries):
        try:
            os.remove(p)
        except OSError:
            continue
        removed += 1
        total -= size
        if total <= max_bytes:
            break
    return removed


def default_cache_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache"),
        "tracknetv3_tpu",
        "xla",
    )


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache; returns the dir or None.

    Safe to call multiple times and at any point before the first compile
    (the cache is consulted per-compilation, not at backend init). Errors
    (read-only filesystem, unsupported backend) downgrade to a warning:
    the cache is an optimization, never a correctness dependency.
    """
    env = os.environ.get("TRACKNETV3_TPU_CACHE_DIR")
    if env is not None and (env.strip() == "" or env.strip().lower() in _DISABLED):
        return None
    if cache_dir is None:
        cache_dir = env or default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program that takes >=1 s to compile (the staged-scan
        # / train-step executables are minutes on the remote compiler;
        # sub-second programs recompile faster than they deserialize).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        prune_cache_dir(cache_dir)
        return cache_dir
    except Exception as e:  # noqa: BLE001 - optimization only, never fatal
        import sys

        print(f"warning: persistent compile cache unavailable: {e}", file=sys.stderr)
        return None
