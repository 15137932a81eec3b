"""TPU-native shuttlecock-tracking framework (TrackNetV3 capabilities).

A brand-new JAX/XLA/Pallas implementation of badminton shuttlecock tracking
from broadcast video: the TrackNet U-Net heatmap regressor, the InpaintNet
trajectory-rectification module, fused on-device preprocessing, on-device
heatmap->coordinate decoding, overlapping-window temporal ensembling, and
the full surrounding toolchain (training with mixup, checkpoint/resume,
rally-based evaluation with 5-way confusion metrics, dataset preparation,
and the predict/train/test CLI surface).
"""

import os as _os

import jax as _jax

from . import config

__version__ = "0.3.0"  # keep in sync with pyproject.toml

# Persistent XLA compilation cache: amortizes the 20-40s first-compile cost
# of the full-resolution U-Net across processes (CLI invocations, tests).
_cache_dir = _os.environ.get(
    "TRACKNETV3_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/tracknetv3_tpu_xla")
)
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
