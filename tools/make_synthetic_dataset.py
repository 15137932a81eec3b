#!/usr/bin/env python
"""Generate a tiny synthetic Shuttlecock-layout dataset for tests/benches.

Renders a moving bright dot on a static "court" background and writes the
exact directory layout the real dataset uses (videos + label CSVs +
extracted frames + medians + drop_frame.json), so every CLI in the
framework can be driven end-to-end without the real data. Also writes a
standalone ``clip.mp4`` for the predict CLI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_frame(w, h, t, T, rng_bg, visible=True):
    frame = rng_bg.copy()
    if visible:
        # Parabolic flight path across the court.
        x = int(w * 0.1 + (w * 0.8) * t / max(T - 1, 1))
        y = int(h * 0.7 - h * 0.5 * np.sin(np.pi * t / max(T - 1, 1)))
        cv2.circle(frame, (x, y), max(3, h // 90), (255, 255, 255), -1)
        return frame, x, y, 1
    return frame, 0, 0, 0


def make_background(w, h, seed):
    rng = np.random.default_rng(seed)
    bg = np.full((h, w, 3), (40, 90, 40), np.uint8)  # green court
    bg += rng.integers(0, 12, size=bg.shape, dtype=np.uint8)  # texture
    cv2.rectangle(bg, (w // 8, h // 6), (7 * w // 8, 5 * h // 6), (200, 200, 200), 2)
    cv2.line(bg, (w // 2, h // 6), (w // 2, 5 * h // 6), (200, 200, 200), 2)
    return bg


def write_rally(match_dir, rally_id, w, h, n_frames, seed, occlusion=None):
    os.makedirs(os.path.join(match_dir, "video"), exist_ok=True)
    os.makedirs(os.path.join(match_dir, "csv"), exist_ok=True)
    rally_frame_dir = os.path.join(match_dir, "frame", rally_id)
    os.makedirs(rally_frame_dir, exist_ok=True)

    bg = make_background(w, h, seed)
    video_file = os.path.join(match_dir, "video", f"{rally_id}.mp4")
    vw = cv2.VideoWriter(video_file, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rows = []
    frames = []
    for t in range(n_frames):
        visible = True
        if occlusion and occlusion[0] <= t < occlusion[1]:
            visible = False
        frame, x, y, vis = render_frame(w, h, t, n_frames, bg, visible)
        vw.write(frame)
        cv2.imwrite(os.path.join(rally_frame_dir, f"{t}.png"), frame)
        frames.append(frame)
        rows.append((t, vis, x, y))
    vw.release()

    import pandas as pd

    df = pd.DataFrame(rows, columns=["Frame", "Visibility", "X", "Y"])
    df.to_csv(os.path.join(match_dir, "csv", f"{rally_id}_ball.csv"), index=False)

    median = np.median(np.stack(frames).astype(np.float32), axis=0)[..., ::-1]
    np.savez(os.path.join(rally_frame_dir, "median.npz"), median=median)
    return df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/synthdata")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--rallies", type=int, default=2)
    args = ap.parse_args()

    w, h, T = args.width, args.height, args.frames
    drop = {"start": {}, "end": {}}
    for split, matches in [("train", [1, 2]), ("val", [1]), ("test", [1])]:
        for m in matches:
            match_dir = os.path.join(args.out, split, f"match{m}")
            for r in range(1, args.rallies + 1):
                rally_id = f"1_{r:02d}_00"
                occl = (T // 3, T // 3 + 6) if r == 1 else None
                df = write_rally(match_dir, rally_id, w, h, T, seed=m * 10 + r, occlusion=occl)
                if split == "test":
                    # test split uses corrected_csv + drop_frame windows
                    os.makedirs(os.path.join(match_dir, "corrected_csv"), exist_ok=True)
                    df.to_csv(
                        os.path.join(match_dir, "corrected_csv", f"{rally_id}_ball.csv"),
                        index=False,
                    )
                    key = f"{m}_{rally_id}"
                    drop["start"][key] = 2
                    drop["end"][key] = T - 2
            # match median = median of rally medians
            from tracknetv3_tpu.utils.io import get_match_median

            get_match_median(match_dir)

    with open(os.path.join(args.out, "drop_frame.json"), "w") as f:
        json.dump(drop, f)

    # Standalone clip for predict CLI
    bg = make_background(w, h, 99)
    vw = cv2.VideoWriter(
        os.path.join(args.out, "clip.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
    )
    for t in range(T):
        frame, *_ = render_frame(w, h, t, T, bg)
        vw.write(frame)
    vw.release()
    print(f"Synthetic dataset written to {args.out}")


if __name__ == "__main__":
    main()
