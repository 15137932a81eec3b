"""Profiling/tracing hooks (the reference has only wall-clock prints).

``trace(dir)`` context manager captures a jax.profiler trace (TensorBoard
'Profile' plugin / Perfetto viewable) around any pipeline section;
``annotate(name)`` adds named regions. Wired into train.py/predict.py via
``--profile``.
"""

from __future__ import annotations

import contextlib
import os
import time


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


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Lightweight wall-clock stage timing with a summary line."""

    def __init__(self):
        self.stages = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages.append((name, time.time() - t0))

    def summary(self) -> str:
        total = sum(t for _, t in self.stages)
        parts = ", ".join(f"{n} {t:.2f}s" for n, t in self.stages)
        return f"{parts} (total {total:.2f}s)"
