#!/usr/bin/env python
"""Dataset preparation CLI (mirrors reference preprocess.py).

1. Installs repo-shipped corrected test labels + drop_frame.json if present.
2. Extracts frames from every train/test rally video (capped at label
   count) and computes per-rally medians.
3. Computes per-match medians.
4. Carves a val split: the LAST rally of each training match is moved.
5. Dumps median previews.
"""

import argparse
import os
import shutil


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument(
        "--corrected_label_dir",
        type=str,
        default="corrected_test_label",
        help="repo-shipped corrected test labels to install",
    )
    parser.add_argument(
        "--regenerate_medians",
        action="store_true",
        default=False,
        help="recompute every rally and match median from the videos "
        "(reference: utils/general.py:527-537)",
    )
    args = parser.parse_args()
    data_dir = args.data_dir

    if args.regenerate_medians:
        from tracknetv3_tpu.utils.io import (
            get_match_median,
            get_rally_median,
            list_dirs,
        )

        for split in ("train", "val", "test"):
            split_dir = os.path.join(data_dir, split)
            if not os.path.isdir(split_dir):
                continue
            for match_dir in list_dirs(split_dir):
                video_dir = os.path.join(match_dir, "video")
                if not os.path.isdir(video_dir):
                    continue
                for video_file in list_dirs(video_dir):
                    if video_file.endswith(".mp4"):
                        print(f"Processing {video_file}...")
                        get_rally_median(video_file)
                get_match_median(match_dir)
        print("Medians regenerated.")
        return

    import numpy as np
    import pandas as pd

    import cv2
    from tracknetv3_tpu.config import IMG_FORMAT
    from tracknetv3_tpu.utils.io import get_match_median, list_dirs, parse_video_file
    from tracknetv3_tpu.utils.visualize import plot_median_files

    # 1. Install corrected test labels + drop_frame.json (the repo vendors
    # the reference's corrected_test_label/ data asset verbatim:
    # match{N}/corrected_csv/*_ball.csv + drop_frame.json; reference
    # install flow: preprocess.py:10-21).
    cl_dir = args.corrected_label_dir
    if os.path.isdir(cl_dir):
        drop_src = os.path.join(cl_dir, "drop_frame.json")
        if os.path.exists(drop_src):
            shutil.copy(drop_src, os.path.join(data_dir, "drop_frame.json"))
        for name in sorted(os.listdir(cl_dir)):
            src = os.path.join(cl_dir, name)
            if os.path.isdir(src) and name.startswith("match"):
                # reference layout: match{N}/corrected_csv/
                src_csv = os.path.join(src, "corrected_csv")
                dst_dir = os.path.join(data_dir, "test", name, "corrected_csv")
                if os.path.isdir(src_csv) and not os.path.exists(dst_dir):
                    shutil.copytree(src_csv, dst_dir)
            elif name.endswith(".csv"):
                # flat layout: {match_id}_{rally_id}_ball.csv
                match_id, rest = name.split("_", 1)
                dst_dir = os.path.join(
                    data_dir, "test", f"match{match_id}", "corrected_csv"
                )
                os.makedirs(dst_dir, exist_ok=True)
                shutil.copy(src, os.path.join(dst_dir, rest))
        print("Installed corrected test labels.")

    # 2./3. Frame extraction + medians.
    def generate_data_frames(video_file):
        match_dir, rally_id = parse_video_file(video_file)
        csv_file = os.path.join(match_dir, "csv", f"{rally_id}_ball.csv")
        assert os.path.exists(csv_file), f"{csv_file} missing"
        label_df = pd.read_csv(csv_file, encoding="utf8")
        rally_dir = os.path.join(match_dir, "frame", rally_id)
        if os.path.isdir(rally_dir):
            done = [f for f in os.listdir(rally_dir) if f.endswith("." + IMG_FORMAT)]
            if len(done) >= len(label_df):
                return  # already processed
            shutil.rmtree(rally_dir)
        os.makedirs(rally_dir, exist_ok=True)
        cap = cv2.VideoCapture(video_file)
        frames = []
        while len(frames) < len(label_df):
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
            cv2.imwrite(os.path.join(rally_dir, f"{len(frames) - 1}.{IMG_FORMAT}"), frame)
        cap.release()
        if not frames:
            raise ValueError(f"no frames decodable from {video_file}")
        # Median over the label-count-capped extracted frames, matching
        # the reference's extraction-time median (general.py:411-466).
        # NOTE: --regenerate_medians / io.get_rally_median instead median
        # over ALL video frames (reference general.py:497-525) - the
        # reference carries the same inconsistency between its two paths.
        median = np.median(np.stack(frames).astype(np.float32), axis=0)[..., ::-1]
        np.savez(os.path.join(rally_dir, "median.npz"), median=median)

    for split in ("train", "test"):
        split_dir = os.path.join(data_dir, split)
        if not os.path.isdir(split_dir):
            continue
        for match_dir in list_dirs(split_dir):
            video_dir = os.path.join(match_dir, "video")
            if not os.path.isdir(video_dir):
                continue
            for video_file in list_dirs(video_dir):
                if video_file.endswith(".mp4"):
                    print(f"Processing {video_file}...")
                    generate_data_frames(video_file)
            get_match_median(match_dir)

    # 4. Carve val split: move the last rally of each training match.
    val_dir = os.path.join(data_dir, "val")
    train_dir = os.path.join(data_dir, "train")
    if not os.path.isdir(val_dir) and os.path.isdir(train_dir):
        for match_dir in list_dirs(train_dir):
            match_name = os.path.basename(match_dir)
            rallies = sorted(os.listdir(os.path.join(match_dir, "frame")))
            rallies = [r for r in rallies if os.path.isdir(os.path.join(match_dir, "frame", r))]
            if len(rallies) < 2:
                # moving a match's only rally would leave an empty train
                # match (no frames to median over); keep it in train
                if rallies:
                    print(f"  {match_name}: single rally, not carved to val")
                continue
            last = rallies[-1]
            dst_match = os.path.join(val_dir, match_name)
            for sub, fname in [
                ("frame", last),
                ("video", f"{last}.mp4"),
                ("csv", f"{last}_ball.csv"),
            ]:
                src = os.path.join(match_dir, sub, fname)
                if os.path.exists(src):
                    dst = os.path.join(dst_match, sub, fname)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(src, dst)
            get_match_median(dst_match)
            get_match_median(match_dir)
        print("Carved val split.")

    # 5. Median previews.
    plot_median_files(data_dir)
    print("Done.")


if __name__ == "__main__":
    main()
