#!/usr/bin/env python
"""Generate predicted-trajectory CSVs + inpaint masks for InpaintNet training.

Mirrors reference generate_mask_data.py: runs the TrackNet-only test engine
over the given splits with ``save_inpaint_mask=True`` so every rally gets a
``predicted_csv/{rally}_ball.csv`` with GT + predicted coordinates (input
space) and the Inpaint_Mask column.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tracknet_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    # Default matches the reference recipe (reference generate_mask_data.py:13
    # defaults eval_mode='weight'): InpaintNet training CSVs are produced from
    # the weighted temporal ensemble.  'nonoverlap' is ~L× faster (each frame
    # forwarded once) at slightly lower trajectory quality — useful for quick
    # mask-data regeneration, but not the published recipe.
    parser.add_argument("--eval_mode", type=str, default="weight", choices=["nonoverlap", "average", "weight"])
    parser.add_argument(
        "--split_list", type=lambda s: s.split(","), default=["train", "val", "test"]
    )
    parser.add_argument("--tolerance", type=float, default=4)
    parser.add_argument(
        "--exact_decode", nargs="?", const="device", default="",
        choices=["", "device", "host"],
        help="use the reference's largest-bbox-area blob rule (reference "
        "test.py:52-79) instead of the peak-blob decoder, making the "
        "InpaintNet training CSVs reproducible under the exact reference "
        "recipe; the two differ only on multi-blob frames. Bare flag "
        "(= 'device') runs the rule on device at the default decoder's "
        "fetch cost; 'host' keeps the original host CCL oracle path",
    )
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--verbose", action="store_true", default=False)
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard window batches over a data-parallel mesh")
    args = parser.parse_args()

    from tracknetv3_tpu.parallel.mesh import apply_platform_override, ensure_virtual_devices

    apply_platform_override()  # TRACKNETV3_TPU_PLATFORM=cpu forces XLA-CPU
    ensure_virtual_devices(args.num_devices)  # sandbox shim, no-op elsewhere

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # cold-start: reload compiled executables from disk

    from tracknetv3_tpu.evaluation.test_engine import RallyTestEngine
    from tracknetv3_tpu.training.checkpoint import load_model_from_checkpoint

    mesh = None
    if (args.num_devices or 0) > 1:
        from tracknetv3_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)

    model, variables, pd = load_model_from_checkpoint(args.tracknet_file)
    engine = RallyTestEngine(
        (model, variables),
        None,
        tracknet_seq_len=pd["seq_len"],
        bg_mode=pd.get("bg_mode", ""),
        eval_mode=args.eval_mode,
        batch_size=args.batch_size,
        tolerance=args.tolerance,
        exact_decode=args.exact_decode,
        mesh=mesh,
    )
    for split in args.split_list:
        print(f"Generating predicted csv for {split} split...")
        engine.test(
            args.data_dir,
            split,
            save_inpaint_mask=True,
            debug=args.debug,
            verbose=args.verbose,
        )
    print("Done.")


if __name__ == "__main__":
    main()
