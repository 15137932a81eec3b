#!/usr/bin/env python
"""Video inference CLI (argument surface mirrors reference predict.py:72-84)."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_file", type=str, default="", help="file path of the video")
    parser.add_argument(
        "--video_dir",
        type=str,
        default="",
        help="batch serving: predict every video in this directory with one "
        "model load; buffers are bucket-padded so videos of different "
        "lengths share compiled programs (see inference.predict_videos)",
    )
    parser.add_argument(
        "--fail_fast",
        action="store_true",
        default=False,
        help="with --video_dir: abort on the first failing video instead "
        "of skipping it (the default skips and reports a summary)",
    )
    parser.add_argument(
        "--bucket_quantum",
        type=int,
        default=256,
        help="frame-count bucket granularity for the staged buffer (larger "
        "= fewer compiled programs / AOT blobs, more padded-chunk waste per "
        "video); applies to both --video_file and --video_dir",
    )
    parser.add_argument("--tracknet_file", type=str, required=True, help="TrackNet checkpoint path")
    parser.add_argument("--inpaintnet_file", type=str, default="", help="InpaintNet checkpoint path")
    parser.add_argument("--batch_size", type=int, default=16, help="batch size for inference")
    parser.add_argument("--eval_mode", type=str, default="weight", choices=["nonoverlap", "average", "weight"])
    parser.add_argument("--max_sample_num", type=int, default=1800, help="max frames sampled for the median image")
    parser.add_argument(
        "--video_range",
        type=lambda s: [int(v) for v in s.split(",")],
        default=None,
        help="start,end seconds of the video used for the median image",
    )
    parser.add_argument("--save_dir", type=str, default="pred_result")
    parser.add_argument("--large_video", action="store_true", default=False, help="stream the video instead of loading it into RAM")
    parser.add_argument("--output_video", action="store_true", default=False, help="write video overlaid with the predicted trajectory")
    parser.add_argument("--traj_len", type=int, default=8, help="length of drawn trajectory comet")
    parser.add_argument(
        "--device_resize",
        action="store_true",
        default=False,
        help="ship raw frames and resize on device with the PIL-bicubic-matched "
        "kernel (reference-exact resize; slower staging) instead of the default "
        "host INTER_LINEAR resize during decode",
    )
    parser.add_argument(
        "--cv2_decode",
        action="store_true",
        default=False,
        help="force the cv2 staging decoder instead of the native libav "
        "reader (which scales during decode and uses DCT-domain lowres on "
        "large sources); for A/B parity checks",
    )
    parser.add_argument(
        "--stage_format",
        type=str,
        default="auto",
        choices=("auto", "yuv420", "bgr"),
        help="staging pixel format: yuv420 uploads planar YUV420 slabs "
        "(half the H2D bytes; BT.601->RGB runs on device in the finalize "
        "program), bgr the packed sws-exact form; auto picks yuv420 "
        "whenever the native decoder serves the video",
    )
    parser.add_argument("--profile", type=str, default="", help="capture a jax.profiler trace into this directory")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard the staged path's window batches over a "
                        "data-parallel mesh (default: single device)")
    args = parser.parse_args()
    if bool(args.video_file) == bool(args.video_dir):
        parser.error("exactly one of --video_file / --video_dir is required")
    if args.video_dir and (args.large_video or args.device_resize):
        parser.error(
            "--video_dir uses the staged serving path; per-video "
            "--large_video/--device_resize are not supported (oversized "
            "videos fall back to streaming automatically)"
        )

    from tracknetv3_tpu.parallel.mesh import apply_platform_override, ensure_virtual_devices

    apply_platform_override()  # TRACKNETV3_TPU_PLATFORM=cpu forces XLA-CPU
    ensure_virtual_devices(args.num_devices)  # sandbox shim, no-op elsewhere

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    args._cache_dir = enable_persistent_cache()  # cold-start: executables from disk

    from tracknetv3_tpu.utils.profiling import trace

    with trace(args.profile or None):
        _run_predict(args)
    print("Done.")


def _run_predict(args):
    from tracknetv3_tpu.inference import predict_video, predict_videos

    if args.video_dir:
        import glob
        import os

        exts = (".mp4", ".avi", ".mov", ".mkv")
        files = sorted(
            f
            for f in glob.glob(os.path.join(args.video_dir, "*"))
            if f.lower().endswith(exts)
        )
        if not files:
            raise FileNotFoundError(f"no videos in {args.video_dir}")
        print(f"Batch predicting {len(files)} videos from {args.video_dir}")
        results = predict_videos(
            files,
            tracknet_file=args.tracknet_file,
            inpaintnet_file=args.inpaintnet_file,
            eval_mode=args.eval_mode,
            batch_size=args.batch_size,
            max_sample_num=args.max_sample_num,
            save_dir=args.save_dir,
            output_video=args.output_video,
            traj_len=args.traj_len,
            native_decode=not args.cv2_decode,
            stage_format=args.stage_format,
            num_devices=args.num_devices,
            bucket_quantum=args.bucket_quantum,
            # skip: one corrupt file must not abort the batch;
            # --fail_fast restores raise-on-first-error
            on_error="raise" if args.fail_fast else "skip",
            # AOT program blobs persist by default: bucketing bounds the
            # blob count (one ~20 MB blob per bucket length, pruned by the
            # cache size cap), so fresh processes skip the trace+lower
            # cost too.
            program_cache_dir=(
                os.path.join(args._cache_dir, "programs")
                if args._cache_dir
                else None
            ),
        )
        skipped = len(files) - len(results)
        print(f"Predicted {len(results)}/{len(files)} videos"
              + (f" ({skipped} skipped - see warnings above)" if skipped else ""))
        if not results:
            raise SystemExit(
                f"all {len(files)} videos failed; nothing was predicted"
            )
        return

    import os

    predict_video(
        video_file=args.video_file,
        tracknet_file=args.tracknet_file,
        inpaintnet_file=args.inpaintnet_file,
        eval_mode=args.eval_mode,
        batch_size=args.batch_size,
        max_sample_num=args.max_sample_num,
        video_range=tuple(args.video_range) if args.video_range else None,
        large_video=args.large_video,
        save_dir=args.save_dir,
        output_video=args.output_video,
        traj_len=args.traj_len,
        device_resize=args.device_resize,
        native_decode=not args.cv2_decode,
        num_devices=args.num_devices,
        stage_format=args.stage_format,
        # Same cold-start economics as --video_dir: bucket-padded buffers
        # + persisted AOT program blobs mean a fresh single-video process
        # deserializes its per-bucket program instead of retracing
        # (reference contract: zero program-acquisition cost).
        bucket_quantum=args.bucket_quantum,
        program_cache_dir=(
            os.path.join(args._cache_dir, "programs") if args._cache_dir else None
        ),
    )


if __name__ == "__main__":
    main()
