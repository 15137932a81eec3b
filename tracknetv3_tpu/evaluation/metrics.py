"""Frame-classification metrics: 5-way confusion and summary scores.

Contract (reference: utils/metric.py:22-46, test.py:124-210):
  TP  - both detected, center distance <= tolerance
  TN  - neither detected
  FP1 - both detected but distance > tolerance
  FP2 - predicted a ball where ground truth has none
  FN  - missed an existing ball
  accuracy  = (TP+TN)/total        precision = TP/(TP+FP1+FP2)
  recall    = TP/(TP+FN)           f1 = 2PR/(P+R)
  miss_rate = FN/(TP+FN)

All classification here is vectorized numpy over whole trajectories; the
reference loops per frame in Python around cv2 calls.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

from ..config import HEIGHT, PRED_TYPES, PRED_TYPES_MAP, SIGMA, WIDTH


def get_metric(TP, TN, FP1, FP2, FN) -> Tuple[float, float, float, float, float]:
    """accuracy, precision, recall, f1, miss_rate (reference formulas)."""
    total = TP + TN + FP1 + FP2 + FN
    accuracy = (TP + TN) / total if total > 0 else 0
    precision = TP / (TP + FP1 + FP2) if (TP + FP1 + FP2) > 0 else 0
    recall = TP / (TP + FN) if (TP + FN) > 0 else 0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0
    miss_rate = FN / (TP + FN) if (TP + FN) > 0 else 0
    return accuracy, precision, recall, f1, miss_rate


def metrics_dict(confusion: np.ndarray) -> Dict[str, float]:
    TP, TN, FP1, FP2, FN = (float(c) for c in confusion)
    accuracy, precision, recall, f1, miss_rate = get_metric(TP, TN, FP1, FP2, FN)
    return {
        "TP": TP,
        "TN": TN,
        "FP1": FP1,
        "FP2": FP2,
        "FN": FN,
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "miss_rate": miss_rate,
    }


def classify_detections(
    cx_pred: np.ndarray,
    cy_pred: np.ndarray,
    cx_true: np.ndarray,
    cy_true: np.ndarray,
    tolerance: float = 4.0,
) -> np.ndarray:
    """Vectorized 5-way type assignment on integer input-space centers.

    Existence follows the reference convention: a detection exists iff
    max(cx, cy) > 0 (reference: test.py:136-145).
    """
    cx_pred = np.asarray(cx_pred, np.int64)
    cy_pred = np.asarray(cy_pred, np.int64)
    cx_true = np.asarray(cx_true, np.int64)
    cy_true = np.asarray(cy_true, np.int64)
    p = np.maximum(cx_pred, cy_pred) > 0
    t = np.maximum(cx_true, cy_true) > 0
    dist = np.sqrt((cx_pred - cx_true) ** 2.0 + (cy_pred - cy_true) ** 2.0)

    types = np.empty(cx_pred.shape, np.int64)
    types[~p & ~t] = PRED_TYPES_MAP["TN"]
    types[p & ~t] = PRED_TYPES_MAP["FP2"]
    types[~p & t] = PRED_TYPES_MAP["FN"]
    both = p & t
    types[both & (dist > tolerance)] = PRED_TYPES_MAP["FP1"]
    types[both & (dist <= tolerance)] = PRED_TYPES_MAP["TP"]
    return types


def confusion_from_types(types: np.ndarray) -> np.ndarray:
    """Count [TP, TN, FP1, FP2, FN] from a type array."""
    return np.bincount(np.asarray(types, np.int64).ravel(), minlength=len(PRED_TYPES))[
        : len(PRED_TYPES)
    ].astype(np.float64)


def gt_center_from_label(
    x: np.ndarray,
    y: np.ndarray,
    w_scaler: float,
    h_scaler: float,
    sigma: float = SIGMA,
    width: int = WIDTH,
    height: int = HEIGHT,
) -> Tuple[np.ndarray, np.ndarray]:
    """Input-space GT center as the reference's heatmap round-trip yields it.

    The reference evaluates against the *decoded GT heatmap* center
    (reference: test.py:161-162), not the raw label: the binary disk is
    clipped at image borders, so near edges the bbox center shifts from
    the label. This computes that decoded center analytically:
    disk x-extent = [max(0, cx-r), min(W-1, cx+r)] with r = floor(sigma),
    center = xmin + extent//2 (truncating, like int(x + w/2)).
    """
    cx = (np.asarray(x, np.float64) / w_scaler).astype(np.int64)
    cy = (np.asarray(y, np.float64) / h_scaler).astype(np.int64)
    r = int(math.floor(sigma))
    xmin = np.clip(cx - r, 0, None)
    xmax = np.minimum(cx + r, width - 1)
    ymin = np.clip(cy - r, 0, None)
    ymax = np.minimum(cy + r, height - 1)
    out_cx = xmin + (xmax - xmin + 1) // 2
    out_cy = ymin + (ymax - ymin + 1) // 2
    invisible = (cx == 0) & (cy == 0)
    out_cx = np.where(invisible, 0, out_cx)
    out_cy = np.where(invisible, 0, out_cy)
    return out_cx, out_cy
