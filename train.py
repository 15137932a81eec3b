#!/usr/bin/env python
"""Training CLI (argument surface mirrors reference train.py:181-199,
plus TPU-native extensions: --data_dir, --num_devices)."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="TrackNet", choices=["TrackNet", "InpaintNet"])
    parser.add_argument("--seq_len", type=int, default=8, help="sequence length of input")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--optim", type=str, default="Adam", choices=["Adam", "SGD", "Adadelta"])
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--lr_scheduler", type=str, default="", choices=["", "StepLR"])
    parser.add_argument("--bg_mode", type=str, default="", choices=["", "subtract", "subtract_concat", "concat"])
    parser.add_argument("--alpha", type=float, default=-1, help="sample-mixup alpha, -1 disables")
    parser.add_argument("--frame_alpha", type=float, default=-1, help="frame-mixup alpha, -1 disables")
    parser.add_argument("--mask_ratio", type=float, default=0.3)
    parser.add_argument("--tolerance", type=float, default=4)
    parser.add_argument("--resume_training", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=13)
    parser.add_argument("--save_dir", type=str, default="exp")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--verbose", action="store_true", default=False)
    # TPU-native extensions
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--num_devices", type=int, default=None, help="data-parallel width (default: single device)")
    parser.add_argument("--segment_windows", type=int, default=1,
                        help=">1 batches consecutive windows per segment, shipping shared frames once (less H2D traffic)")
    parser.add_argument("--fast_bn", action="store_true", default=False,
                        help="apply BatchNorm in bf16 (stats stay f32): cuts two "
                        "full-res f32 memory round trips per conv layer")
    parser.add_argument("--no_split_up_entry", dest="split_up_entry",
                        action="store_false", default=True,
                        help="materialize the up-block concats instead of "
                        "splitting the entry conv kernel (slower; bit-matches "
                        "the concat formulation)")
    parser.add_argument("--resident_frames", action="store_true", default=False,
                        help="stage ALL split frames to device memory once; each "
                        "step then ships only window indices (TrackNet, single "
                        "device; falls back if the split exceeds the HBM budget)")
    parser.add_argument("--exact_decode", nargs="?", const="device",
                        default="", choices=["", "device", "host"],
                        help="validation decodes heatmaps with the reference's "
                        "exact largest-bbox-area blob rule (best-checkpoint "
                        "selection matches the reference on multi-blob "
                        "frames). Bare flag (= 'device') runs the rule on "
                        "device at the default decoder's fetch cost; 'host' "
                        "keeps the original host CCL oracle (slower val eval)")
    parser.add_argument("--profile", type=str, default="",
                        help="capture a jax.profiler trace into this directory")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="initialize jax.distributed for multi-host training "
                        "(coordinator/process env vars per JAX conventions); the "
                        "data mesh then spans all hosts")
    args = parser.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()
    else:
        from tracknetv3_tpu.parallel.mesh import apply_platform_override, ensure_virtual_devices

        apply_platform_override()  # TRACKNETV3_TPU_PLATFORM=cpu forces XLA-CPU
        ensure_virtual_devices(args.num_devices)  # sandbox shim, no-op elsewhere

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # cold-start: reload compiled executables from disk

    from tracknetv3_tpu.config import TrainConfig
    from tracknetv3_tpu.training.loop import train
    from tracknetv3_tpu.utils.profiling import trace

    cfg_kwargs = {
        k: v for k, v in vars(args).items() if k not in ("data_dir", "profile", "multihost")
    }
    cfg = TrainConfig(**cfg_kwargs)
    with trace(args.profile or None):
        train(cfg, data_dir=args.data_dir)
    print("Done......")


if __name__ == "__main__":
    main()
