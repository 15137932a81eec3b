"""Metric/classification golden tests (contract: utils/metric.py, test.py)."""

import numpy as np

from tracknetv3_tpu.config import PRED_TYPES_MAP
from tracknetv3_tpu.evaluation.metrics import (
    classify_detections,
    confusion_from_types,
    get_metric,
    gt_center_from_label,
    metrics_dict,
)


def test_get_metric_golden():
    acc, prec, rec, f1, miss = get_metric(TP=90, TN=5, FP1=2, FP2=1, FN=2)
    assert abs(acc - 95 / 100) < 1e-12
    assert abs(prec - 90 / 93) < 1e-12
    assert abs(rec - 90 / 92) < 1e-12
    assert abs(f1 - 2 * prec * rec / (prec + rec)) < 1e-12
    assert abs(miss - 2 / 92) < 1e-12


def test_get_metric_zero_divisions():
    assert get_metric(0, 0, 0, 0, 0) == (0, 0, 0, 0, 0)


def test_classify_all_branches():
    # (pred, gt) -> expected type
    cases = [
        ((0, 0), (0, 0), "TN"),
        ((5, 5), (0, 0), "FP2"),
        ((0, 0), (5, 5), "FN"),
        ((5, 5), (5, 6), "TP"),  # dist 1 <= 4
        ((5, 5), (5, 15), "FP1"),  # dist 10 > 4
        ((0, 3), (0, 0), "FP2"),  # max > 0 counts as existing
    ]
    cx_p = np.array([c[0][0] for c in cases])
    cy_p = np.array([c[0][1] for c in cases])
    cx_t = np.array([c[1][0] for c in cases])
    cy_t = np.array([c[1][1] for c in cases])
    types = classify_detections(cx_p, cy_p, cx_t, cy_t, tolerance=4)
    want = [PRED_TYPES_MAP[c[2]] for c in cases]
    np.testing.assert_array_equal(types, want)


def test_classify_boundary_distance_exactly_tolerance_is_tp():
    types = classify_detections([10], [10], [14], [10], tolerance=4)
    assert types[0] == PRED_TYPES_MAP["TP"]


def test_confusion_and_metrics_dict():
    types = np.array([0, 0, 1, 2, 3, 4, 0])
    conf = confusion_from_types(types)
    np.testing.assert_array_equal(conf, [3, 1, 1, 1, 1])
    d = metrics_dict(conf)
    assert d["TP"] == 3 and d["FN"] == 1
    assert 0 <= d["accuracy"] <= 1


def test_gt_center_matches_heatmap_decode():
    """The analytic GT center must equal decoding the generated disk."""
    import jax.numpy as jnp

    from tracknetv3_tpu.ops import make_heatmaps
    from tracknetv3_tpu.ops.detect import decode_heatmaps

    H, W = 64, 96
    xs = np.array([0, 1, 2, 10, 94, 95, 0, 50])
    ys = np.array([5, 1, 0, 10, 62, 63, 0, 32])
    cx, cy = gt_center_from_label(xs, ys, 1.0, 1.0, width=W, height=H)
    maps = make_heatmaps(jnp.asarray(xs), jnp.asarray(ys), H, W)
    dec = decode_heatmaps(maps)
    np.testing.assert_array_equal(cx, np.asarray(dec["cx"]))
    np.testing.assert_array_equal(cy, np.asarray(dec["cy"]))


def test_gt_center_applies_scaler():
    cx, cy = gt_center_from_label(np.array([512.0]), np.array([288.0]), 2.0, 2.0)
    # label / scaler = (256, 144), interior so no clipping
    assert (cx[0], cy[0]) == (256, 144)
