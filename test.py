#!/usr/bin/env python
"""Evaluation CLI (argument surface mirrors reference test.py:908-923)."""

import argparse
import json
import os
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tracknet_file", type=str, help="TrackNet checkpoint path")
    parser.add_argument("--inpaintnet_file", type=str, default="", help="InpaintNet checkpoint path")
    parser.add_argument("--split", type=str, default="test", choices=["train", "val", "test"])
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--tolerance", type=float, default=4)
    parser.add_argument("--eval_mode", type=str, default="weight", choices=["nonoverlap", "average", "weight"])
    parser.add_argument("--video_file", type=str, default="", help="labeled dataset video to evaluate")
    parser.add_argument("--output_pred", action="store_true", default=False)
    parser.add_argument("--output_bbox", action="store_true", default=False)
    parser.add_argument("--save_dir", type=str, default="output")
    parser.add_argument("--verbose", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--linear_interp", action="store_true", default=False)
    parser.add_argument("--exact_decode", nargs="?", const="device",
                        default="", choices=["", "device", "host"],
                        help="use the reference's exact largest-bbox-area "
                        "blob rule instead of the peak-blob decoder. Bare "
                        "flag (= 'device'): the rule runs on device, same "
                        "fetch cost as the default decoder; 'host': the "
                        "original host CCL path (full heatmap fetch, "
                        "slower) kept as the unbounded oracle")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--num_devices", type=int, default=None, help="shard window batches over a data-parallel mesh (default: single device)")
    parser.add_argument("--input_hw", type=str, default="",
                        help="model input resolution 'H,W'; default: the "
                        "resolution stored in the TrackNet checkpoint "
                        "(falls back to config HEIGHT,WIDTH)")
    args = parser.parse_args()

    from tracknetv3_tpu.parallel.mesh import apply_platform_override, ensure_virtual_devices

    apply_platform_override()  # TRACKNETV3_TPU_PLATFORM=cpu forces XLA-CPU
    ensure_virtual_devices(args.num_devices)  # sandbox shim, no-op elsewhere

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # cold-start: reload compiled executables from disk

    from tracknetv3_tpu.evaluation.test_engine import RallyTestEngine, get_test_res
    from tracknetv3_tpu.training.checkpoint import load_model_from_checkpoint

    os.makedirs(args.save_dir, exist_ok=True)
    param_dict = vars(args)

    print("Loading checkpoint...")
    tracknet = inpaintnet = None
    tn_seq_len, in_seq_len, bg_mode = 8, 16, ""
    # Model input resolution: CLI override > checkpoint param_dict > config
    # default. Checkpoints trained at a custom --input_hw carry it in their
    # param_dict (TrainConfig.to_param_dict); evaluating such a model at the
    # default resolution would silently produce wrong coordinates (ADVICE r4).
    input_hw = tuple(int(v) for v in args.input_hw.split(",")) if args.input_hw else None
    if args.tracknet_file:
        model, variables, pd = load_model_from_checkpoint(args.tracknet_file)
        tracknet = (model, variables)
        tn_seq_len = pd["seq_len"]
        bg_mode = pd.get("bg_mode", "")
        param_dict["tracknet_seq_len"] = tn_seq_len
        param_dict["bg_mode"] = bg_mode
        if input_hw is None and pd.get("input_hw"):
            input_hw = tuple(int(v) for v in pd["input_hw"])
    if input_hw is not None:
        param_dict["input_hw"] = list(input_hw)
    if args.inpaintnet_file:
        model, variables, pd = load_model_from_checkpoint(args.inpaintnet_file)
        inpaintnet = (model, variables)
        in_seq_len = pd.get("seq_len", 16)
        param_dict["inpaintnet_seq_len"] = in_seq_len

    mesh = None
    if args.num_devices is not None and args.num_devices > 1:
        from tracknetv3_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)

    engine = RallyTestEngine(
        tracknet,
        inpaintnet,
        tracknet_seq_len=tn_seq_len,
        inpaintnet_seq_len=in_seq_len,
        bg_mode=bg_mode,
        eval_mode=args.eval_mode,
        batch_size=args.batch_size,
        tolerance=args.tolerance,
        mesh=mesh,
        exact_decode=args.exact_decode,
        input_hw=input_hw,
    )

    if args.video_file:
        # Evaluate one labeled rally, write overlay video + CSV.
        from tracknetv3_tpu.data.dataset import FrameCache
        from tracknetv3_tpu.utils.io import (
            label_csv_path,
            parse_video_file,
            read_label_csv,
            write_pred_csv,
            write_pred_video,
        )

        print(f"Test on video {args.video_file} ...")
        match_dir, rally_id = parse_video_file(args.video_file)
        rally_dir = os.path.join(match_dir, "frame", rally_id)
        label_df = read_label_csv(label_csv_path(match_dir, rally_id))
        cache = FrameCache(args.data_dir, bg_mode, input_hw=input_hw)
        pred = engine.test_rally(args.data_dir, rally_dir, cache)
        out_video = os.path.join(args.save_dir, f"{rally_id}.mp4")
        out_csv = os.path.join(args.save_dir, f"{rally_id}_ball.csv")
        write_pred_video(args.video_file, pred, out_video, label_df=label_df)
        write_pred_csv({k: pred[k] for k in ("Frame", "X", "Y", "Visibility")}, out_csv)
        print(f"Wrote {out_video} and {out_csv}")
        return

    eval_analysis_file = os.path.join(
        args.save_dir, f"{args.split}_eval_analysis_{args.eval_mode}.json"
    )
    eval_res_file = os.path.join(
        args.save_dir, f"{args.split}_eval_res_{args.eval_mode}.json"
    )

    start = time.time()
    print(f"Split: {args.split}\nEvaluation mode: {args.eval_mode}\nTolerance Value: {args.tolerance}")
    pred_dict = engine.test(
        args.data_dir,
        args.split,
        use_linear_interp=args.linear_interp,
        output_bbox=args.output_bbox,
        debug=args.debug,
        verbose=args.verbose,
    )
    res_dict = get_test_res(pred_dict, args.data_dir, drop=args.split == "test")
    # Multi-host (jax.distributed): every process holds the identical merged
    # pred_dict after engine.test(); only process 0 writes the artifacts.
    import jax

    is_main = jax.process_index() == 0
    if engine.last_eval_stats:
        res_dict["eval_speed"] = engine.last_eval_stats
        print(
            f"Eval wall-clock: {engine.last_eval_stats['frames']} frames in "
            f"{engine.last_eval_stats['seconds']}s = "
            f"{engine.last_eval_stats['fps']} FPS"
        )
    if is_main:
        with open(eval_res_file, "w") as f:
            json.dump(res_dict, f, indent=2)
        print(json.dumps(res_dict, indent=2))

    if args.output_pred and is_main:
        serializable_pd = {
            k: v for k, v in param_dict.items() if isinstance(v, (str, int, float, bool))
        }
        with open(eval_analysis_file, "w") as f:
            json.dump(dict(param_dict=serializable_pd, pred_dict=pred_dict), f, indent=2)

    if args.output_bbox and is_main:
        from tracknetv3_tpu.evaluation.coco import (
            convert_gt_to_coco_json,
            evaluate_ap,
            get_coco_res,
            gt_coco_json_path,
        )

        coco_file = os.path.join(
            args.save_dir, f"{args.split}_coco_res_{args.eval_mode}.json"
        )
        drop = args.split == "test"
        dect_list = get_coco_res(pred_dict, args.data_dir, drop=drop)
        gt_json = gt_coco_json_path(args.data_dir, args.split, drop=drop)
        if not os.path.exists(gt_json):
            gt_json = convert_gt_to_coco_json(args.data_dir, args.split, drop=drop)
        mAP = {iou: evaluate_ap(gt_json, dect_list, iou) for iou in (0.25, 0.5)}
        print(f"mAP: {mAP}")
        with open(coco_file, "w") as f:
            json.dump(dict(AP_25=mAP, detection=dect_list), f, indent=2)

    print(f"Elapsed {time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
