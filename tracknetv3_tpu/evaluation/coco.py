"""COCO-format export and a self-contained single-class AP evaluator.

The reference exports GT to COCO JSON with fixed 10x10 boxes and runs
pycocotools mAP@{0.25, 0.5} (reference: utils/general.py:356-408,
test.py:441-475, 998-1018). pycocotools is not available in this
environment, so ``evaluate_ap`` implements the standard COCO AP for the
single 'shuttlecock' category directly (greedy score-ordered matching,
101-point interpolated precision) - same protocol, no native dependency.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np
from PIL import Image

from ..config import IMG_FORMAT
from ..utils.io import get_rally_dirs, label_csv_path, parse_rally_dir, read_label_csv


def gt_coco_json_path(data_dir: str, split: str, drop: bool = False) -> str:
    """Split/drop-dependent GT cache path: a single shared filename would
    let a val-split GT file be silently scored against test detections."""
    suffix = "_drop" if (split == "test" and drop) else ""
    return os.path.join(data_dir, f"coco_format_gt_{split}{suffix}.json")


def convert_gt_to_coco_json(data_dir: str, split: str, drop: bool = False) -> str:
    """Write the split's GT COCO JSON (reference: general.py:356-408)."""
    drop_dict = None
    if split == "test" and drop:
        with open(os.path.join(data_dir, "drop_frame.json")) as f:
            drop_dict = json.load(f)
    bbox_size = 10
    image_info, annotations = [], []
    sample_count = 0
    for rd in get_rally_dirs(data_dir, split):
        rally_dir = os.path.join(data_dir, rd)
        match_dir, rally_id = parse_rally_dir(rally_dir)
        match_id = match_dir.split("match")[-1]
        # read_label_csv, not raw read_csv: GT image_ids must follow the
        # same Frame-sorted order as the prediction side, and fillna(0)
        # keeps a visible row with a blank coordinate from crashing int()
        df = read_label_csv(label_csv_path(match_dir, rally_id))
        f = df["Frame"].to_numpy()
        x = df["X"].to_numpy()
        y = df["Y"].to_numpy()
        v = df["Visibility"].to_numpy()
        if drop_dict is not None:
            key = f"{match_id}_{rally_id}"
            s, e = drop_dict["start"][key], drop_dict["end"][key]
            f, x, y, v = f[s:e], x[s:e], y[s:e], v[s:e]
        with Image.open(os.path.join(rally_dir, f"0.{IMG_FORMAT}")) as im:
            w, h = im.size
        for fi, cx, cy, vis in zip(f, x, y, v):
            image_info.append(
                {
                    "id": sample_count,
                    "width": w,
                    "height": h,
                    "file_name": f"{match_dir}/frame/{rally_id}/{fi}.{IMG_FORMAT}",
                }
            )
            if vis > 0:
                annotations.append(
                    {
                        "id": sample_count,
                        "image_id": sample_count,
                        "category_id": 1,
                        "bbox": [
                            int(cx - bbox_size / 2),
                            int(cy - bbox_size / 2),
                            bbox_size,
                            bbox_size,
                        ],
                        "ignore": 0,
                        "area": bbox_size * bbox_size,
                        "segmentation": [],
                        "iscrowd": 0,
                    }
                )
            sample_count += 1
    coco = {
        "info": {},
        "licenses": [],
        "categories": [{"id": 1, "name": "shuttlecock"}],
        "images": image_info,
        "annotations": annotations,
    }
    out = gt_coco_json_path(data_dir, split, drop)
    with open(out, "w") as fh:
        json.dump(coco, fh)
    return out


def get_coco_res(pred_dict: Dict, data_dir: str, drop: bool = False) -> List[Dict]:
    """Prediction dicts -> COCO detection list (reference: test.py:441-475)."""
    drop_dict = None
    if drop:
        with open(os.path.join(data_dir, "drop_frame.json")) as f:
            drop_dict = json.load(f)
    res_list = []
    sample_count = 0
    for rally_key, pred in pred_dict.items():
        pred = {k: list(v) for k, v in pred.items()}
        if drop_dict is not None:
            s, e = drop_dict["start"][rally_key], drop_dict["end"][rally_key]
            for k in pred:
                pred[k] = pred[k][s:e]
        for i in range(len(pred["Frame"])):
            if pred["Visibility"][i] > 0 and "BBox" in pred:
                res_list.append(
                    {
                        "id": sample_count,
                        "image_id": sample_count,
                        "category_id": 1,
                        "bbox": pred["BBox"][i],
                        "score": pred["Confidence"][i],
                        "ignore": 0,
                        "area": pred["BBox"][i][2] * pred["BBox"][i][3],
                        "segmentation": [],
                        "iscrowd": 0,
                    }
                )
            sample_count += 1
    return res_list


def _iou(box_a, box_b) -> float:
    ax, ay, aw, ah = box_a
    bx, by, bw, bh = box_b
    ix = max(0.0, min(ax + aw, bx + bw) - max(ax, bx))
    iy = max(0.0, min(ay + ah, by + bh) - max(ay, by))
    inter = ix * iy
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def evaluate_ap(
    gt_json: str,
    detections: List[Dict],
    iou_threshold: float,
    max_dets: int = 100,
) -> float:
    """Single-class COCO-style AP at one IoU threshold.

    Implements the COCOeval 'bbox' protocol restricted to one category and
    the 'all' area range (the configuration the reference runs,
    reference test.py:1005-1014, which reads ``stats[0]`` with a single
    ``iouThrs`` entry). Protocol details mirrored from pycocotools and
    pinned by golden fixtures in tests/test_coco.py:

    - detections are score-sorted with a STABLE sort and truncated to
      ``max_dets`` per image (default 100, COCOeval's stats[0] setting)
      BEFORE matching. Tie order matters for the precision curve:
      COCOeval's accumulate concatenates per-image results in ascending
      image-id order and THEN stable-sorts by score, so equal-score
      detections order by (image id, within-image input order) - NOT by
      global input order. Mirrored here by pre-grouping per image;
    - greedy matching walks each image's GT list and takes the best-IoU
      unmatched GT, where an IoU EQUAL to the current best replaces it
      (pycocotools' ``if ious < iou: continue`` — on exact ties the LAST
      GT index wins), and a det whose best IoU equals the threshold
      matches (initial ``iou = min(t, 1-1e-10)``);
    - AP is the mean over 101 recall thresholds of the monotone precision
      envelope, 0 where the recall is never reached.
    """
    with open(gt_json) as f:
        gt = json.load(f)
    gt_by_image: Dict[int, List] = {}
    for ann in gt["annotations"]:
        gt_by_image.setdefault(ann["image_id"], []).append(ann["bbox"])
    n_gt = sum(len(v) for v in gt_by_image.values())
    if n_gt == 0:
        return 0.0

    # Per-image stable score sort + maxDets truncation, images concatenated
    # in ascending image-id order, then a stable global score sort - the
    # exact ordering COCOeval's evaluateImg + accumulate produce (ties
    # across images break by image id, not by input order).
    by_image: Dict[int, List] = {}
    for det in detections:
        by_image.setdefault(det["image_id"], []).append(det)
    ordered = []
    for img in sorted(by_image):
        ordered.extend(
            sorted(by_image[img], key=lambda d: -d["score"])[:max_dets]
        )
    dets = sorted(ordered, key=lambda d: -d["score"])

    matched: Dict[int, set] = {}
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    thr = min(iou_threshold, 1 - 1e-10)
    for i, det in enumerate(dets):
        img = det["image_id"]
        best_iou, best_j = thr, -1
        for j, g in enumerate(gt_by_image.get(img, [])):
            if j in matched.get(img, set()):
                continue
            iou = _iou(det["bbox"], g)
            if iou < best_iou:
                continue
            best_iou, best_j = iou, j
        if best_j >= 0:
            tp[i] = 1
            matched.setdefault(img, set()).add(best_j)
        else:
            fp[i] = 1

    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / (ctp + cfp + np.spacing(1))
    # 101-point interpolation over the monotone precision envelope
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p = precision[recall >= r]
        ap += float(p.max()) if p.size else 0.0
    return ap / 101.0
