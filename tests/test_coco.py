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


# ---------------------------------------------------------------------------
# Golden fixtures pinning the pycocotools COCOeval protocol (VERDICT r2
# item 8). Each case is hand-computed from the COCOeval source semantics;
# the asserted values FAIL under any greedy-matching deviation.
# ---------------------------------------------------------------------------


def test_greedy_tie_breaks_to_last_gt(tmp_path):
    """On an exact IoU tie between two GTs, pycocotools matches the LAST
    GT index (its loop updates unless ``iou < best``). det A ties g0/g1 at
    IoU 90/110; matching g1 leaves g0 for det B (IoU 1.0 -> TP at 0.7).
    A first-wins rule would leave det B with g1 at IoU 80/120 < 0.7 -> FP
    and AP 51/101 instead of 1.0."""
    gt = _gt_json(tmp_path, {0: [[0, 0, 10, 10], [2, 0, 10, 10]]})
    dets = [
        {"image_id": 0, "bbox": [1, 0, 10, 10], "score": 0.9},  # ties g0/g1
        {"image_id": 0, "bbox": [0, 0, 10, 10], "score": 0.8},  # exact g0
    ]
    ap = evaluate_ap(gt, dets, 0.7)
    assert abs(ap - 1.0) < 1e-6, ap


def test_iou_exactly_at_threshold_matches(tmp_path):
    """COCOeval initializes best = min(t, 1-1e-10): IoU == threshold is a
    match; strictly above-threshold is required only past that."""
    gt = _gt_json(tmp_path, {0: [[0, 0, 10, 10]]})
    dets = [{"image_id": 0, "bbox": [5, 0, 10, 10], "score": 0.9}]  # IoU 50/150
    thr = 50.0 / 150.0
    assert evaluate_ap(gt, dets, thr) > 0.99
    assert evaluate_ap(gt, dets, thr + 1e-9) == 0.0


def test_second_detection_on_matched_gt_is_fp(tmp_path):
    """A GT matches at most once; the higher-score detection consumes it.
    Here the higher-score det misses (IoU 0.25 < 0.5 -> FP) and the exact
    lower-score det is the TP: precision never exceeds 1/2, AP == 0.5."""
    gt = _gt_json(tmp_path, {0: [[0, 0, 10, 10]]})
    dets = [
        {"image_id": 0, "bbox": [6, 0, 10, 10], "score": 0.9},  # IoU 40/160
        {"image_id": 0, "bbox": [0, 0, 10, 10], "score": 0.6},  # exact
    ]
    ap = evaluate_ap(gt, dets, 0.5)
    assert abs(ap - 0.5) < 1e-6, ap


def test_101_point_interpolation_exact_value(tmp_path):
    """3 GTs, score-ordered dets TP/FP/TP: recall hits 1/3 then 2/3 with
    envelope precisions 1 and 2/3. 34 recall points <= 1/3 read 1.0, the
    33 in (1/3, 2/3] read 2/3, the rest 0: AP == (34 + 22)/101 == 56/101."""
    gt = _gt_json(
        tmp_path,
        {0: [[0, 0, 10, 10]], 1: [[0, 0, 10, 10]], 2: [[0, 0, 10, 10]]},
    )
    dets = [
        {"image_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},  # TP
        {"image_id": 1, "bbox": [50, 50, 10, 10], "score": 0.8},  # FP
        {"image_id": 1, "bbox": [0, 0, 10, 10], "score": 0.7},  # TP
    ]
    ap = evaluate_ap(gt, dets, 0.5)
    assert abs(ap - 56.0 / 101.0) < 1e-6, ap


def test_max_dets_truncates_per_image_before_matching(tmp_path):
    """COCOeval truncates each image's score-sorted detections to maxDets
    BEFORE matching (stats[0] uses 100): with max_dets=2 the third
    (lowest-score, only correct) det is dropped -> AP 0; untruncated it
    scores envelope precision 1/3."""
    gt = _gt_json(tmp_path, {0: [[0, 0, 10, 10]]})
    dets = [
        {"image_id": 0, "bbox": [50, 50, 10, 10], "score": 0.9},
        {"image_id": 0, "bbox": [70, 70, 10, 10], "score": 0.8},
        {"image_id": 0, "bbox": [0, 0, 10, 10], "score": 0.7},
    ]
    assert evaluate_ap(gt, dets, 0.5, max_dets=2) == 0.0
    ap = evaluate_ap(gt, dets, 0.5)
    assert abs(ap - 1.0 / 3.0) < 1e-6, ap


def test_score_ties_keep_input_order(tmp_path):
    """pycocotools sorts scores with mergesort (stable): equal-score dets
    keep their input order. FP-before-TP at the same score gives AP
    51*0.5/101; an unstable reversal would give 51/101."""
    gt = _gt_json(tmp_path, {0: [[0, 0, 10, 10]], 1: [[0, 0, 10, 10]]})
    dets = [
        {"image_id": 0, "bbox": [50, 50, 10, 10], "score": 0.5},  # FP first
        {"image_id": 1, "bbox": [0, 0, 10, 10], "score": 0.5},  # TP second
    ]
    ap = evaluate_ap(gt, dets, 0.5)
    assert abs(ap - 25.5 / 101.0) < 1e-6, ap
