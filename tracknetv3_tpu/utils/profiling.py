"""Profiling/tracing hooks (the reference has only wall-clock prints).

``trace(dir)`` captures a jax.profiler trace (TensorBoard 'Profile'
plugin / Perfetto viewable) around any pipeline section; it is wired
into train.py/predict.py via ``--profile``.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a device+host profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
