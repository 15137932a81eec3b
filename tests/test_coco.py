"""Single-class AP evaluator tests (hand-computable cases)."""

import json

from tracknetv3_tpu.evaluation.coco import _iou, evaluate_ap


def _gt_json(tmp_path, boxes_by_image):
    anns = []
    i = 0
    for img, boxes in boxes_by_image.items():
        for b in boxes:
            anns.append({"id": i, "image_id": img, "category_id": 1, "bbox": b})
            i += 1
    path = tmp_path / "gt.json"
    path.write_text(json.dumps({"annotations": anns, "images": [], "categories": []}))
    return str(path)


def test_iou():
    assert _iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert _iou([0, 0, 10, 10], [10, 10, 5, 5]) == 0.0
    assert abs(_iou([0, 0, 10, 10], [5, 0, 10, 10]) - (50 / 150)) < 1e-9


def test_perfect_detections_ap_1(tmp_path):
    gt = _gt_json(tmp_path, {0: [[10, 10, 10, 10]], 1: [[20, 20, 10, 10]]})
    dets = [
        {"image_id": 0, "bbox": [10, 10, 10, 10], "score": 0.9},
        {"image_id": 1, "bbox": [20, 20, 10, 10], "score": 0.8},
    ]
    assert evaluate_ap(gt, dets, 0.5) > 0.99


def test_all_misses_ap_0(tmp_path):
    gt = _gt_json(tmp_path, {0: [[10, 10, 10, 10]]})
    dets = [{"image_id": 0, "bbox": [100, 100, 10, 10], "score": 0.9}]
    assert evaluate_ap(gt, dets, 0.5) == 0.0


def test_half_detected(tmp_path):
    gt = _gt_json(tmp_path, {0: [[10, 10, 10, 10]], 1: [[20, 20, 10, 10]]})
    dets = [{"image_id": 0, "bbox": [10, 10, 10, 10], "score": 0.9}]
    ap = evaluate_ap(gt, dets, 0.5)
    # Perfect precision up to recall 0.5, zero beyond: AP ~ 0.5
    assert 0.45 < ap < 0.55


def test_lower_iou_threshold_is_more_permissive(tmp_path):
    gt = _gt_json(tmp_path, {0: [[10, 10, 10, 10]]})
    dets = [{"image_id": 0, "bbox": [14, 10, 10, 10], "score": 0.9}]  # IoU ~ 0.43
    assert evaluate_ap(gt, dets, 0.5) == 0.0
    assert evaluate_ap(gt, dets, 0.25) > 0.99
