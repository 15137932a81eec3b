#!/usr/bin/env python
"""Is the bounded-memory streaming path host-decode-bound? (VERDICT r4
missing #4b / next-round item 6b.)

predict_videos falls back to single-device streaming for videos over the
staging budget and warns that the mesh is ignored there
(inference.py predict_videos). Sharding the streaming forward across
chips only helps if DEVICE COMPUTE is the bottleneck; this probe
measures, on the same video and the same decode recipe:

  1. decode-only: the exact host work `_streaming_host_resize` performs
     (native scale-during-decode to model resolution, or cv2 decode +
     INTER_AREA resize), no device programs at all;
  2. streaming e2e: `predict_video_streaming` (decode prefetch thread
     overlapped with the chunked device forward+ensemble+decode).

If e2e ~= decode-only, the device is already fully hidden behind the
1-core host's decode and a mesh cannot buy anything - the fallback
warning is justified by measurement rather than implementation debt.

Usage: python tools/probe_streaming_bound.py [--frames 480] [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def decode_only(video: str, w: int, h: int, native: bool) -> int:
    """Replicate _streaming_host_resize's per-frame host work for
    bg_mode='' (the bench model family): scale-during-decode when the
    native reader serves, else cv2 + INTER_AREA."""
    n = 0
    if native:
        from tracknetv3_tpu.native_video import open_native_video

        r = open_native_video(video, w, h, lowres=-1, bgr=False)
        if r is not None:
            # mirror _streaming_host_resize's read_batch(64) consumption
            while True:
                arr = r.read_batch(64)
                if arr is None:
                    break
                n += len(arr)
            r.close()
            return n
    import cv2

    from tracknetv3_tpu.utils.io import VideoReader

    reader = VideoReader(video)
    while True:
        f = reader.read()
        if f is None:
            break
        cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA)
        n += 1
    reader.release()
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--bg_mode", type=str, default="concat")
    args = ap.parse_args()

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import ensure_video, get_checkpoint

    video = ensure_video("/tmp", args.frames)
    ckpt = get_checkpoint("/tmp", bg_mode=args.bg_mode)

    from tracknetv3_tpu.inference import TrackNetPredictor

    p = TrackNetPredictor(ckpt, eval_mode="weight")

    # decode-only passes (before any device program, like staging)
    dec_times = []
    for _ in range(args.passes + 1):  # pass 0 warms the file cache
        t0 = time.time()
        n = decode_only(video, p.w, p.h, p.native_decode)
        dec_times.append(time.time() - t0)
    dec_times = dec_times[1:]
    t_dec = statistics.median(dec_times)

    # streaming e2e passes (first pass compiles, excluded)
    e2e_times = []
    for i in range(args.passes + 1):
        t0 = time.time()
        pred = p.predict_video_streaming(video)
        e2e_times.append(time.time() - t0)
        assert len(pred["Frame"]) == n
    e2e_times = e2e_times[1:]
    t_e2e = statistics.median(e2e_times)

    hidden = max(t_e2e - t_dec, 0.0)
    print(
        f"# {n} frames: decode-only {t_dec:.2f}s "
        f"(passes {['%.2f' % t for t in dec_times]}) = {n / t_dec:.1f} FPS; "
        f"streaming e2e {t_e2e:.2f}s "
        f"(passes {['%.2f' % t for t in e2e_times]}) = {n / t_e2e:.1f} FPS; "
        f"device-visible overhead {hidden:.2f}s "
        f"({100 * hidden / t_e2e:.0f}% of e2e)",
        file=sys.stderr,
    )
    print(json.dumps({
        "frames": n,
        "decode_only_s": round(t_dec, 3),
        "streaming_e2e_s": round(t_e2e, 3),
        "decode_fps": round(n / t_dec, 1),
        "streaming_fps": round(n / t_e2e, 1),
        "decode_bound_fraction": round(min(t_dec / t_e2e, 1.0), 3),
    }))


if __name__ == "__main__":
    main()
