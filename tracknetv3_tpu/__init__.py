"""TPU-native shuttlecock-tracking framework (TrackNetV3 capabilities).

A brand-new JAX/XLA/Pallas implementation of badminton shuttlecock tracking
from broadcast video: the TrackNet U-Net heatmap regressor, the InpaintNet
trajectory-rectification module, fused on-device preprocessing, on-device
heatmap->coordinate decoding, overlapping-window temporal ensembling, and
the full surrounding toolchain (training with mixup, checkpoint/resume,
rally-based evaluation with 5-way confusion metrics, dataset preparation,
and the predict/train/test CLI surface).
"""

from . import config

__version__ = "0.1.0"
