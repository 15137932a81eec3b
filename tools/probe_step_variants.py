#!/usr/bin/env python
"""Probe: full production train step vs TPU formulation variants.

probe_layer_budget.py (corrected methodology) attributes the train
step's gap to 45-50%-of-peak like this: the three top-resolution
288x512 convs are MXU-starved (64 output channels = half the 128-wide
array idle; 24 input channels on the first layer waste lanes on loads),
and roughly 45 ms of the ~170 ms step is non-conv elementwise traffic
(pool/up2x/concat + BN normalize chains and their VJPs - the composed
*forward* BN toll is ~0, but the backward stores and re-reads a second
full-size activation per layer).

This probe times the EXACT production step (make_tracknet_train_step:
resident gather + assemble + Pallas WBCE + Adam, donated state) under
the formulation flags implemented in models/fused_forward.py:

  base          production step as shipped
  remat         remat_layers: save conv outputs + BN stats only; the
                normalize+ReLU epilogue recomputes in the backward
  split         split_up_entry: up-block entry conv as
                conv(up2x(x)) + conv(skip); no concat materialized
  s2d           s2d_first: first conv in space-to-depth space
  (pairs/all)   the combinations

Timing matches bench.py --train: K chained steps per pass, ONE scalar
fetch at the end of each pass (block_until_ready does not block on this
runtime), median over passes; fetch overhead ~20 ms amortizes to <2 ms
per step at K=12. FLOPs are reported from the BASE step's compiled cost
analysis for every variant (the s2d lift quadruples the first layer's
padded MACs - counting those as work would inflate MFU).

Usage: python tools/probe_step_variants.py [--batch 24] [--steps 12]
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

VARIANTS = [
    ("base", {}),
    ("remat", {"remat_layers": True}),
    ("split", {"split_up_entry": True}),
    ("s2d", {"s2d_first": True}),
    ("remat+split", {"remat_layers": True, "split_up_entry": True}),
    ("split+s2d", {"split_up_entry": True, "s2d_first": True}),
    ("all", {"remat_layers": True, "split_up_entry": True, "s2d_first": True}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--data_dir", type=str, default="/tmp/bench_synthdata")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names to run")
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

    B, L, bg_mode = args.batch, 8, ""
    index = build_split_index(args.data_dir, "train", L, 1, "heatmap")
    # Stage before any device execution (H2D degrades after programs run).
    loader = ResidentHeatmapLoader(
        index, bg_mode, B, shuffle=True, drop_last=True, seed=0,
        data_dir=args.data_dir,
    )
    batches = list(loader)
    assert batches, "no full batches"
    _, variables = get_model("TrackNet", L, bg_mode)
    # Host snapshot: the donated train step DELETES the state buffers,
    # and create_train_state's device state aliases these arrays - a
    # second variant would otherwise see deleted arrays.
    variables = jax.tree.map(np.asarray, variables)
    tx = build_optimizer("Adam", 1e-3)
    rng = jax.random.PRNGKey(0)

    results = {"batch": B, "steps": args.steps}
    base_flops = None
    only = {v for v in args.only.split(",") if v}
    for name, kw in VARIANTS:
        if only and name not in only:
            continue
        state = create_train_state(variables, tx)
        step = make_tracknet_train_step(tx, bg_mode, alpha=-1, fast_bn=True,
                                        **kw)
        t0 = time.time()
        compiled = step.lower(state, batches[0], rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if name == "base":
            base_flops = flops
        state, loss = compiled(state, batches[0], rng)
        l0 = float(np.asarray(loss))
        t_compile = time.time() - t0

        times = []
        for p in range(args.passes):
            t0 = time.time()
            for k in range(args.steps):
                b = batches[(p * args.steps + k) % len(batches)]
                state, loss = compiled(
                    state, b, jax.random.fold_in(rng, p * args.steps + k))
            lv = float(np.asarray(loss))
            times.append((time.time() - t0) / args.steps)
        ms = statistics.median(times) * 1e3
        useful = base_flops if base_flops else flops
        tfs = useful / (ms / 1e3) / 1e12
        row = {
            "ms_per_step": ms,
            "tflops_per_s_useful": tfs,
            "mfu_pct": 100.0 * tfs / V5E_BF16_PEAK_TFLOPS,
            "xla_flops_per_step": flops,
            "compile_s": t_compile,
            "loss0": l0,
            "loss_end": lv,
        }
        results[name] = row
        print(
            f"# {name:<12} {ms:7.1f} ms/step  {tfs:6.1f} TF/s useful "
            f"({row['mfu_pct']:.1f}% peak)  xla_flops {flops/1e12:.2f}T  "
            f"compile {t_compile:.0f}s  loss {l0:.4f}->{lv:.4f}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
