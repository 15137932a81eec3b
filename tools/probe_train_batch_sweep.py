#!/usr/bin/env python
"""Train-step MFU vs batch size (VERDICT r4 item 4 follow-on).

Every formulation variant at batch 24 loses or ties (PROFILE "Round-4");
the one untried axis is the batch itself: the ~45 ms of non-conv
elementwise traffic per step (pool/up2x/BN chains and their VJPs,
probe_layer_budget) scales with batch like everything else, but larger
batches tile the 128-wide MXU better on the 64-channel top-res layers
whose starvation is the other half of the gap. Same instrument as
bench --train / probe_step_variants: K chained production steps
(resident loader, donated state, Pallas WBCE), one fetch per pass,
median of passes; FLOPs from each compiled step's own cost analysis.

Usage: python tools/probe_train_batch_sweep.py [--batches 24,32,48]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="24,32,48")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--data_dir", type=str, default="/tmp/bench_synthdata")
    args = ap.parse_args()

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if not os.path.exists(os.path.join(args.data_dir, "train")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "make_synthetic_dataset.py"),
             "--out", args.data_dir],
            check=True, env=env,
        )

    import jax

    from tracknetv3_tpu.data.dataset import (
        ResidentHeatmapLoader,
        build_split_index,
    )
    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.optim import build_optimizer
    from tracknetv3_tpu.training.steps import (
        create_train_state,
        make_tracknet_train_step,
    )

    L, bg_mode = 8, ""
    index = build_split_index(args.data_dir, "train", L, 1, "heatmap")
    _, variables = get_model("TrackNet", L, bg_mode)
    variables = jax.tree.map(np.asarray, variables)
    tx = build_optimizer("Adam", 1e-3)
    rng = jax.random.PRNGKey(0)

    results = {"steps": args.steps}
    for B in [int(v) for v in args.batches.split(",")]:
        loader = ResidentHeatmapLoader(
            index, bg_mode, B, shuffle=True, drop_last=True, seed=0,
            data_dir=args.data_dir,
        )
        batches = list(loader)
        if not batches:
            print(f"# batch {B}: split too small, skipped", flush=True)
            continue
        state = create_train_state(variables, tx)
        step = make_tracknet_train_step(tx, bg_mode, alpha=-1, fast_bn=True)
        t0 = time.time()
        compiled = step.lower(state, batches[0], rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        state, loss = compiled(state, batches[0], rng)
        float(np.asarray(loss))
        t_compile = time.time() - t0

        times = []
        for p in range(args.passes):
            t0 = time.time()
            for k in range(args.steps):
                b = batches[(p * args.steps + k) % len(batches)]
                state, loss = compiled(
                    state, b, jax.random.fold_in(rng, p * args.steps + k))
            float(np.asarray(loss))
            times.append((time.time() - t0) / args.steps)
        ms = statistics.median(times) * 1e3
        tfs = flops / (ms / 1e3) / 1e12
        mfu = 100.0 * tfs / V5E_BF16_PEAK_TFLOPS
        results[f"batch{B}"] = {
            "ms_per_step": round(ms, 1),
            "ms_per_window": round(ms / B, 2),
            "tflops_per_s": round(tfs, 1),
            "mfu_pct": round(mfu, 1),
            "compile_s": round(t_compile, 1),
        }
        print(
            f"# batch {B:3d}: {ms:7.1f} ms/step  {ms / B:6.2f} ms/window  "
            f"{tfs:6.1f} TF/s ({mfu:.1f}% peak)  compile {t_compile:.0f}s",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
