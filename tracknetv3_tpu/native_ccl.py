"""ctypes bindings for the native connected-components decoder.

Builds ``native/libtrackdecode.so`` on demand (g++, no external deps) and
exposes ``decode_heatmaps_native``: the exact reference decode rule
(largest-bbox-area component) at C++ speed with a thread pool - the
host-side replacement for the reference's per-frame cv2.findContours.
Falls back to None when no toolchain is available; callers then use the
scipy path in ops.detect.decode_heatmaps_host.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtrackdecode.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # Always run make: it no-ops when the .so is newer than the
        # sources and rebuilds a stale one (the .so is gitignored, so a
        # prebuilt library would otherwise mask source updates forever).
        try:
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:
            if not os.path.exists(_LIB_PATH):
                _build_failed = True
                return None
            # A previously built library exists; fall back to it, but say
            # so - silently loading a stale .so after a failed rebuild
            # would mask compile errors in edited native sources.
            import sys

            err = getattr(e, "stderr", b"") or b""
            print(
                "warning: rebuilding native/libtrackdecode.so failed; using "
                f"the existing (possibly stale) library. make said:\n"
                f"{err.decode(errors='replace').strip()}",
                file=sys.stderr,
            )
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.decode_heatmaps_ccl.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.decode_heatmaps_ccl.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_heatmaps_native(
    probs: np.ndarray, threshold: float = 0.5, n_threads: int = 0
) -> Optional[Dict[str, np.ndarray]]:
    """Decode (..., H, W) heatmaps with the native CCL library.

    Returns the same dict layout as ops.detect.decode_heatmaps, or None
    when the library cannot be built/loaded.
    """
    lib = _load()
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    lead = probs.shape[:-2]
    h, w = probs.shape[-2:]
    flat = probs.reshape(-1, h, w)
    n = flat.shape[0]
    bbox = np.zeros((n, 4), np.int32)
    conf = np.zeros((n,), np.float32)
    center = np.zeros((n, 2), np.int32)
    lib.decode_heatmaps_ccl(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        h,
        w,
        ctypes.c_float(threshold),
        bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        center.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    cx = center[:, 0]
    cy = center[:, 1]
    vis = ((cx != 0) | (cy != 0)).astype(np.int32)
    return {
        "cx": cx.reshape(lead),
        "cy": cy.reshape(lead),
        "vis": vis.reshape(lead),
        "conf": conf.reshape(lead),
        "bbox": bbox.reshape(lead + (4,)),
    }
