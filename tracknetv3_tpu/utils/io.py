"""Host-side I/O: dataset layout, CSV contracts, video decode/encode, medians.

Dataset layout (identical to the reference's Shuttlecock Trajectory Dataset
layout so data prepared for either implementation is interchangeable):

    {data_dir}/{split}/match{id}/video/{rally}.mp4
    {data_dir}/{split}/match{id}/csv/{rally}_ball.csv          (train/val)
    {data_dir}/{split}/match{id}/corrected_csv/{rally}_ball.csv (test)
    {data_dir}/{split}/match{id}/frame/{rally}/{n}.png
    {data_dir}/{split}/match{id}/frame/{rally}/median.npz
    {data_dir}/{split}/match{id}/median.npz
    {data_dir}/drop_frame.json

Output contracts preserved (reference: utils/general.py:322-354):
  - prediction CSV columns: Frame,Visibility,X,Y
  - InpaintNet training CSV: Frame,Visibility_GT,X_GT,Y_GT,Visibility,X,Y,
    Inpaint_Mask
  - overlay video with a trailing-comet trajectory.
"""

from __future__ import annotations

import os
import re
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..config import IMG_FORMAT

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) is required for video I/O but not installed")


def list_dirs(directory: str) -> List[str]:
    return sorted(os.path.join(directory, p) for p in os.listdir(directory))


def parse_rally_dir(rally_dir: str) -> Tuple[str, str]:
    """'{...}/match{N}/frame/{rally}' -> (match_dir, rally_id)."""
    rally_dir = rally_dir.rstrip("/")
    m = re.match(r"^(.*)[/\\]frame[/\\]([^/\\]+)$", rally_dir)
    if not m:
        raise ValueError(f"Not a rally directory: {rally_dir!r}")
    return m.group(1), m.group(2)


def parse_video_file(video_file: str) -> Tuple[str, str]:
    """'{...}/video/{rally}.mp4' -> (match_dir, rally_id)."""
    m = re.match(r"^(.*)[/\\]video[/\\]([^/\\]+)\.mp4$", video_file)
    if not m:
        raise ValueError(f"Not a dataset video path: {video_file!r}")
    return m.group(1), m.group(2)


def match_id_of(match_dir: str) -> str:
    return match_dir.split("match")[-1]


def get_rally_dirs(data_dir: str, split: str) -> List[str]:
    """All rally frame dirs of a split, reference ordering
    (matches sorted numerically, rallies lexically; reference
    utils/general.py:174-200). Paths are relative to ``data_dir``."""
    split_dir = os.path.join(data_dir, split)
    match_dirs = [os.path.join(split, d) for d in os.listdir(split_dir)]
    match_dirs = sorted(match_dirs, key=lambda s: int(s.split("match")[-1]))
    rally_dirs = []
    for match_dir in match_dirs:
        frame_root = os.path.join(data_dir, match_dir, "frame")
        for rally in sorted(os.listdir(frame_root)):
            if os.path.isdir(os.path.join(frame_root, rally)):
                rally_dirs.append(os.path.join(match_dir, "frame", rally))
    return rally_dirs


def label_csv_path(match_dir: str, rally_id: str) -> str:
    """Label CSV path; test matches use the corrected labels
    (reference: dataset.py:222-226).

    The split is the parent component of ``.../{split}/match{N}`` - a
    substring check would misroute when the data_dir itself contains a
    'test' path component (e.g. /srv/test/data/train/match1)."""
    split = os.path.basename(os.path.dirname(os.path.normpath(match_dir)))
    if split == "test":
        return os.path.join(match_dir, "corrected_csv", f"{rally_id}_ball.csv")
    return os.path.join(match_dir, "csv", f"{rally_id}_ball.csv")


def read_label_csv(csv_file: str) -> pd.DataFrame:
    df = pd.read_csv(csv_file, encoding="utf8").sort_values(by="Frame").fillna(0)
    return df


def read_label_rows(csv_file: str) -> Dict[str, list]:
    """Pandas-free label CSV reader: column dict, rows sorted by Frame,
    blank/NaN cells -> 0 and numeric cells parsed to float (same semantics
    as read_label_csv + fillna(0)); non-numeric cells are preserved
    VERBATIM so a write-back never destroys extra annotation columns.

    The web UI serves requests from a secondary HTTP-server thread where
    pandas' arrow-backed string index construction segfaults on some hosts;
    every CSV touch on that path must stay off pandas."""
    import csv

    def val(s):
        if s is None or s == "":
            return 0.0  # blank cell: pandas fillna(0) equivalent
        try:
            f = float(s)
            return f if f == f else 0.0  # NaN -> 0
        except ValueError:
            return s  # non-numeric cell: keep as-is

    def sort_key(row):
        v = val(row.get("Frame"))
        return v if isinstance(v, float) else 0.0

    with open(csv_file, newline="", encoding="utf8") as f:
        reader = csv.DictReader(f)
        cols = list(reader.fieldnames or [])
        rows = sorted(reader, key=sort_key)
    return {c: [val(row.get(c)) for row in rows] for c in cols}


def write_label_rows(rows: Dict[str, list], save_file: str) -> None:
    """Pandas-free CSV writer for read_label_rows dicts; integral floats are
    written as ints to match the reference CSV style, strings verbatim."""
    import csv

    def fmt(v):
        if isinstance(v, str):
            return v
        return int(v) if float(v).is_integer() else v

    cols = list(rows)
    n = len(rows[cols[0]]) if cols else 0
    with open(save_file, "w", newline="", encoding="utf8") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for i in range(n):
            w.writerow([fmt(rows[c][i]) for c in cols])


def write_pred_csv(pred_dict: Dict, save_file: str, save_inpaint_mask: bool = False):
    """Write the prediction CSV (reference contract: general.py:322-354)."""
    if save_inpaint_mask:
        df = pd.DataFrame(
            {
                "Frame": pred_dict["Frame"],
                "Visibility_GT": pred_dict["Visibility_GT"],
                "X_GT": pred_dict["X_GT"],
                "Y_GT": pred_dict["Y_GT"],
                "Visibility": pred_dict["Visibility"],
                "X": pred_dict["X"],
                "Y": pred_dict["Y"],
                "Inpaint_Mask": pred_dict["Inpaint_Mask"],
            }
        )
    else:
        df = pd.DataFrame(
            {
                "Frame": pred_dict["Frame"],
                "Visibility": pred_dict["Visibility"],
                "X": pred_dict["X"],
                "Y": pred_dict["Y"],
            }
        )
    df.to_csv(save_file, index=False)


# ------------------------------- video I/O -------------------------------


class VideoReader:
    """Thin cv2.VideoCapture wrapper yielding RGB uint8 frames."""

    def __init__(self, video_file: str):
        _require_cv2()
        if not os.path.exists(video_file):
            raise FileNotFoundError(video_file)
        self.path = video_file
        self.cap = cv2.VideoCapture(video_file)
        self.video_len = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS))
        self.w = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.h = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    def read(self) -> Optional[np.ndarray]:
        ok, frame = self.cap.read()
        if not ok:
            return None
        return frame[..., ::-1]  # BGR -> RGB

    def seek(self, frame_idx: int):
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)

    def read_all(self) -> np.ndarray:
        self.seek(0)
        frames = []
        while True:
            f = self.read()
            if f is None:
                break
            frames.append(f)
        return np.stack(frames) if frames else np.zeros((0, self.h, self.w, 3), np.uint8)

    def sample_median(
        self,
        max_sample_num: int = 1800,
        video_range: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        """Median background from uniformly-sampled frames
        (reference: dataset.py:748-781). Returns (H, W, 3) float RGB."""
        if video_range is None:
            start, end = 0, self.video_len
        else:
            start = max(0, int(video_range[0] * self.fps))
            end = min(int(video_range[1] * self.fps), self.video_len)
        seg = end - start
        step = seg // max_sample_num if seg > max_sample_num else 1
        frames = []
        for i in range(start, end, max(step, 1)):
            self.seek(i)
            f = self.read()
            if f is None:
                # one bad frame mid-video should not silently bias the
                # median toward the clip's start; skip it and keep sampling
                continue
            frames.append(f)
        if not frames:
            raise ValueError(
                f"no frames decodable for the median background "
                f"(video_len={self.video_len}, range={video_range}) - "
                f"corrupt video or a range outside the clip?"
            )
        return np.median(np.stack(frames).astype(np.float32), axis=0)

    def release(self):
        self.cap.release()


def generate_frames(video_file: str) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Decode a whole video to an RGB uint8 array (T, H, W, 3)."""
    r = VideoReader(video_file)
    frames = r.read_all()
    fps, wh = r.fps, (r.w, r.h)
    r.release()
    return frames, fps, wh


def draw_traj_comet(
    frame_bgr: np.ndarray, traj: Sequence[Optional[Tuple[int, int]]], color=(0, 255, 255)
) -> np.ndarray:
    """Draw the trailing-comet trajectory dots (reference: general.py:227-250)."""
    _require_cv2()
    for p in traj:
        if p is not None:
            cv2.circle(frame_bgr, (int(p[0]), int(p[1])), 3, (255, 255, 255), -1)
            cv2.circle(frame_bgr, (int(p[0]), int(p[1])), 3, color, 1)
    return frame_bgr


def write_pred_video(
    video_file: str,
    pred_dict: Dict,
    save_file: str,
    traj_len: int = 8,
    label_df: Optional[pd.DataFrame] = None,
):
    """Overlay predicted (and optionally GT) trajectories onto the video
    (reference contract: general.py:252-320)."""
    _require_cv2()
    cap = cv2.VideoCapture(video_file)
    fps = cap.get(cv2.CAP_PROP_FPS)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(save_file, fourcc, fps, (w, h))

    x_pred, y_pred, vis_pred = pred_dict["X"], pred_dict["Y"], pred_dict["Visibility"]
    pred_q: deque = deque()
    gt_q: deque = deque()
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok or i >= len(x_pred):
            break
        if len(pred_q) >= traj_len:
            pred_q.pop()
        if label_df is not None and len(gt_q) >= traj_len:
            gt_q.pop()
        if label_df is not None:
            if i < len(label_df) and label_df["Visibility"].iloc[i]:
                gt_q.appendleft((label_df["X"].iloc[i], label_df["Y"].iloc[i]))
            else:
                gt_q.appendleft(None)
        pred_q.appendleft((x_pred[i], y_pred[i]) if vis_pred[i] else None)
        if label_df is not None:
            frame = draw_traj_comet(frame, gt_q, color=(0, 0, 255))
        frame = draw_traj_comet(frame, pred_q, color=(0, 255, 255))
        out.write(frame)
        i += 1
    out.release()
    cap.release()


# ------------------------------- medians ---------------------------------


def get_rally_median(video_file: str) -> np.ndarray:
    """Compute + save the per-rally median (reference: general.py:497-525)."""
    match_dir, rally_id = parse_video_file(video_file)
    save_dir = os.path.join(match_dir, "frame", rally_id)
    frames, _, _ = generate_frames(video_file)
    median = np.median(frames.astype(np.float32), axis=0)
    os.makedirs(save_dir, exist_ok=True)
    np.savez(os.path.join(save_dir, "median.npz"), median=median)
    return median


def get_match_median(match_dir: str) -> np.ndarray:
    """Median of rally medians, saved per match (reference: general.py:468-495)."""
    medians = []
    for rally_dir in list_dirs(os.path.join(match_dir, "frame")):
        if not os.path.isdir(rally_dir):
            continue
        _, rally_id = parse_rally_dir(rally_dir)
        med_file = os.path.join(rally_dir, "median.npz")
        if not os.path.exists(med_file):
            get_rally_median(os.path.join(match_dir, "video", f"{rally_id}.mp4"))
        medians.append(np.load(med_file)["median"])
    if not medians:
        raise ValueError(
            f"{match_dir} has no rally frame dirs - cannot compute a match "
            "median (was its only rally moved to the val split?)"
        )
    median = np.median(np.stack(medians), axis=0)
    np.savez(os.path.join(match_dir, "median.npz"), median=median)
    return median


def load_median_for_rally(match_dir: str, rally_id: str) -> np.ndarray:
    """Median lookup with per-match -> per-rally fallback
    (reference: dataset.py:604-609)."""
    match_median = os.path.join(match_dir, "median.npz")
    rally_median = os.path.join(match_dir, "frame", rally_id, "median.npz")
    path = match_median if os.path.exists(match_median) else rally_median
    return np.load(path)["median"]


def rally_frame_files(rally_dir: str, frame_ids: Sequence[int]) -> List[str]:
    return [os.path.join(rally_dir, f"{int(f)}.{IMG_FORMAT}") for f in frame_ids]
