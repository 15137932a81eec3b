"""Global configuration for the TPU-native TrackNetV3 framework.

These constants mirror the de-facto global config of the reference
implementation (reference: utils/general.py:15-20) and are the contract the
rest of the framework builds on:

- ``HEIGHT``/``WIDTH``: model input resolution. Chosen by the reference as
  512x288; conveniently, WIDTH=512 is a multiple of the TPU lane width (128)
  and HEIGHT=288 is a multiple of the f32 sublane width (8), so activations
  tile cleanly onto the VPU/MXU without padding.
- ``SIGMA``: radius of the binary-disk heatmap label.
- ``DELTA_T``/``COOR_TH``: normalized-coordinate threshold under which an
  InpaintNet output is treated as "no detection".
- ``IMG_FORMAT``: on-disk frame image format for the dataset layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

HEIGHT: int = 288
WIDTH: int = 512
SIGMA: float = 2.5
DELTA_T: float = 1.0 / math.sqrt(HEIGHT**2 + WIDTH**2)
COOR_TH: float = DELTA_T * 50
IMG_FORMAT: str = "png"

# Background modes supported by the data pipeline and the model factory
# (reference: utils/general.py:46-80).
BG_MODES = ("", "subtract", "subtract_concat", "concat")

# Evaluation prediction types: 5-way confusion (reference: test.py:20-22).
PRED_TYPES = ("TP", "TN", "FP1", "FP2", "FN")
PRED_TYPES_MAP = {t: i for i, t in enumerate(PRED_TYPES)}
INPAINTNET_EVAL_TYPES = ("inpaint", "reconstruct", "baseline")


def tracknet_in_channels(seq_len: int, bg_mode: str) -> int:
    """Input channel count of TrackNet for a given background mode.

    Mirrors the channel arithmetic of the reference model factory
    (reference: utils/general.py:66-74):
      ''                -> seq_len * 3      (stacked RGB frames)
      'subtract'        -> seq_len          (1-channel difference frames)
      'subtract_concat' -> seq_len * 4      (RGB + difference channel)
      'concat'          -> (seq_len+1) * 3  (median image prepended)
    """
    if bg_mode == "subtract":
        return seq_len
    if bg_mode == "subtract_concat":
        return seq_len * 4
    if bg_mode == "concat":
        return (seq_len + 1) * 3
    if bg_mode == "":
        return seq_len * 3
    raise ValueError(f"Invalid bg_mode: {bg_mode!r}, must be one of {BG_MODES}")


@dataclasses.dataclass
class TrainConfig:
    """Training configuration.

    Field names and defaults mirror the reference CLI arguments
    (reference: train.py:181-199) so that checkpoints can round-trip the
    full configuration (the ``param_dict`` contract, reference:
    train.py:286-301).
    """

    model_name: str = "TrackNet"
    seq_len: int = 8
    epochs: int = 3
    batch_size: int = 10
    optim: str = "Adam"
    learning_rate: float = 1e-3
    lr_scheduler: str = ""
    bg_mode: str = ""
    alpha: float = -1.0
    frame_alpha: float = -1.0
    mask_ratio: float = 0.3
    tolerance: float = 4.0
    resume_training: bool = False
    seed: int = 13
    save_dir: str = "exp"
    debug: bool = False
    verbose: bool = False
    # TPU-native extensions (absent in the reference):
    num_devices: Optional[int] = None  # data-parallel width; None = all
    compute_dtype: str = "bfloat16"  # conv/matmul compute precision
    sync_bn: bool = True  # global (cross-replica) batch-norm statistics
    # Windows per consecutive segment in a training batch (1 = fully
    # shuffled windows like the reference; >1 ships each segment's unique
    # frames once, cutting host->device traffic ~seg*L/(seg+L-1) times).
    segment_windows: int = 1
    # Stage ALL split frames to HBM once and ship only window indices per
    # step (TrackNet, single device, frame_alpha off; falls back to the
    # standard loader if the split exceeds the device budget).
    resident_frames: bool = False
    # Apply BatchNorm normalization in the working dtype (stats stay f32):
    # removes two full-resolution f32 round trips per conv layer at the
    # cost of one extra bf16 rounding of the activations.
    fast_bn: bool = False
    # Split each up block's entry conv along input channels into
    # conv(up2x(x)) + conv(skip), so the (N, H, W, Cup+Cskip) concat is
    # never materialized nor stored as a backward residual. Same MACs,
    # one extra working-dtype rounding of the partial sums. The measured
    # winner among the TPU formulation variants (-3% step time,
    # tools/probe_step_variants.py); remat_layers and s2d_first both
    # LOST at full-step level and stay opt-in research flags on
    # tracknet_train_forward only.
    split_up_entry: bool = True
    # Validation decoding rule for best-checkpoint selection: False/"" =
    # the on-device peak-blob kernel (fast), True/"device" = the
    # reference's exact largest-bbox-area rule ON DEVICE
    # (ops.detect.decode_heatmaps_exact, same fetch cost), "host" = the
    # original host CCL oracle (reference test.py:52-79; fetches full
    # heatmaps per val batch).
    exact_decode: Any = False
    # Model input resolution (h, w); None = the reference's 288x512
    # (module constants HEIGHT/WIDTH). Threaded through the split index,
    # frame caches and loaders so alternate resolutions (e.g. tiny CI
    # models) need no module-global patching. Both dims must be divisible
    # by 8 (the U-Net's three 2x pools).
    input_hw: Optional[tuple] = None

    def to_param_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_param_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in d.items() if k in fields})
        if cfg.input_hw is not None:
            # JSON/npz round-trips turn tuples into lists/arrays
            cfg.input_hw = tuple(int(v) for v in cfg.input_hw)
        return cfg
