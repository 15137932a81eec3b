"""Train-step ablation profiler: where do the milliseconds go?

Times variants of the TrackNet train step on the real chip to attribute
the gap between training MFU and the ~75%-of-peak inference forward
(VERDICT r2 weak item 4: "profile the backward - is BN-backward or the
u8 gather the gap?"). Reference hot loop: reference train.py:59-121.

Variants (all batch ``--batch``, resident frames, Pallas WBCE loss):
  full          the production step: gather + assemble + fwd + bwd + Adam
  no_gather     same but x pre-assembled on device (isolates the u8
                gather + /255 + channel stacking)
  fwd_only      assemble + forward + loss, no grad/optimizer (isolates
                the backward)
  slow_bn       full step with fast_bn=False (isolates the BN f32
                round-trips)
  no_bn_stats   full step with frozen BN (eval-mode normalization inside
                the grad; isolates the batch-statistics reductions +
                their backward)

Timing forces completion with a scalar fetch per pass
(block_until_ready does not block on this runtime - PROFILE.md).

Usage:  python tools/profile_train_step.py [--batch 24] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timed(label, fn, args_fn, steps, passes=3):
    """Median per-step wall time over ``passes`` chains of ``steps``."""
    out = None
    t_pass = []
    for p in range(passes):
        t0 = time.time()
        for k in range(steps):
            out = fn(*args_fn(p * steps + k, out))
        # force the chain: fetch one scalar from the last output
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(jax.numpy.ravel(leaf)[0])
        t_pass.append((time.time() - t0) / steps)
    ms = statistics.median(t_pass) * 1e3
    print(f"  {label:<12} {ms:8.1f} ms/step   (passes: "
          f"{['%.1f' % (t * 1e3) for t in t_pass]})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=10)
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

    global jax
    import jax
    import jax.numpy as jnp
    import optax

    from tracknetv3_tpu.data.dataset import (
        ResidentHeatmapLoader,
        build_split_index,
    )
    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.models.fused_forward import tracknet_train_forward
    from tracknetv3_tpu.ops import pallas_wbce as pw
    from tracknetv3_tpu.training.optim import build_optimizer
    from tracknetv3_tpu.training.steps import (
        TrainState,
        assemble_tracknet_inputs,
        create_train_state,
        make_tracknet_train_step,
    )

    B, L, bg_mode = args.batch, 8, ""
    index = build_split_index(args.data_dir, "train", L, 1, "heatmap")
    # Stage before ANY device execution (H2D degrades after the first
    # program runs on this runtime - PROFILE.md).
    loader = ResidentHeatmapLoader(
        index, bg_mode, B, shuffle=True, drop_last=True, seed=0,
        data_dir=args.data_dir,
    )
    batches = list(loader)
    model, variables = get_model("TrackNet", L, bg_mode)
    tx = build_optimizer("Adam", 1e-3)
    # host copy: donating steps consume their input state, so every
    # variant starts from a fresh device put of the same initial state
    state_host = jax.tree_util.tree_map(np.asarray, create_train_state(variables, tx))

    def fresh_state():
        return TrainState(*jax.tree_util.tree_map(jnp.asarray, tuple(state_host)))

    state0 = fresh_state()
    rng = jax.random.PRNGKey(0)
    n = len(batches)
    print(f"batch {B}, {n} resident batches, bg_mode='{bg_mode}'")

    # ---- full production step (fast_bn) --------------------------------
    step_full = make_tracknet_train_step(tx, bg_mode, alpha=-1, fast_bn=True)
    c_full = step_full.lower(state0, batches[0], rng).compile()
    ca = c_full.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    print(f"full-step FLOPs (XLA cost analysis): {flops / 1e12:.2f} TFLOP")
    s_full = fresh_state()
    ms_full = timed(
        "full", lambda s, b, r: c_full(s, b, r),
        lambda k, prev: ((prev[0] if prev else s_full), batches[k % n],
                         jax.random.fold_in(rng, k)),
        args.steps,
    )

    # ---- no_gather: x pre-assembled ------------------------------------
    x0 = jax.jit(lambda b: assemble_tracknet_inputs(b, bg_mode))(batches[0])
    targets0 = jax.jit(pw.pack_plain_targets)(batches[0]["cxcy"])

    def step_pre(state, x, targets, r):
        def loss_fn(params):
            logits, new_stats = tracknet_train_forward(
                params, state.batch_stats, x, train=True, fast_bn=True
            )
            return pw.wbce_disk_loss(logits, *targets), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(optax.apply_updates(state.params, updates), new_stats,
                       new_opt, state.step + 1),
            loss,
        )

    c_pre = (
        jax.jit(step_pre, donate_argnums=(0,))
        .lower(state0, x0, targets0, rng)
        .compile()
    )
    s_pre = fresh_state()
    ms_pre = timed(
        "no_gather", lambda s, r: c_pre(s, x0, targets0, r),
        lambda k, prev: ((prev[0] if prev else s_pre),
                         jax.random.fold_in(rng, k)),
        args.steps,
    )

    # ---- fwd_only: assemble + forward + loss, no backward --------------
    def fwd_only(state, batch):
        x = assemble_tracknet_inputs(batch, bg_mode)
        targets = pw.pack_plain_targets(batch["cxcy"])
        logits, new_stats = tracknet_train_forward(
            state.params, state.batch_stats, x, train=True, fast_bn=True
        )
        return pw.wbce_disk_loss(logits, *targets)

    c_fwd = jax.jit(fwd_only).lower(state0, batches[0]).compile()
    s_fwd = fresh_state()
    ms_fwd = timed(
        "fwd_only", lambda s, b: (c_fwd(s, b),),
        lambda k, prev: (s_fwd, batches[k % n]),
        args.steps,
    )

    # ---- slow_bn: f32 BN round-trips ------------------------------------
    step_slow = make_tracknet_train_step(tx, bg_mode, alpha=-1, fast_bn=False)
    c_slow = step_slow.lower(state0, batches[0], rng).compile()
    s_slow = fresh_state()
    ms_slow = timed(
        "slow_bn", lambda s, b, r: c_slow(s, b, r),
        lambda k, prev: ((prev[0] if prev else s_slow), batches[k % n],
                         jax.random.fold_in(rng, k)),
        args.steps,
    )

    # ---- no_bn_stats: frozen BN inside the grad -------------------------
    def step_frozen(state, batch, r):
        x = assemble_tracknet_inputs(batch, bg_mode)
        targets = pw.pack_plain_targets(batch["cxcy"])

        def loss_fn(params):
            logits, _ = tracknet_train_forward(
                params, state.batch_stats, x, train=False, fast_bn=True
            )
            return pw.wbce_disk_loss(logits, *targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(optax.apply_updates(state.params, updates),
                       state.batch_stats, new_opt, state.step + 1),
            loss,
        )

    c_frozen = (
        jax.jit(step_frozen, donate_argnums=(0,))
        .lower(state0, batches[0], rng)
        .compile()
    )
    s_frozen = fresh_state()
    ms_frozen = timed(
        "no_bn_stats", lambda s, b, r: c_frozen(s, b, r),
        lambda k, prev: ((prev[0] if prev else s_frozen), batches[k % n],
                         jax.random.fold_in(rng, k)),
        args.steps,
    )

    peak = 197.0  # v5e bf16 TFLOP/s
    print()
    print(f"full step:    {ms_full:.1f} ms = {flops / ms_full / 1e9:.1f} TFLOP/s "
          f"({100 * flops / ms_full / 1e9 / peak:.1f}% of v5e bf16 peak)")
    print(f"u8 gather+assemble:   {ms_full - ms_pre:+.1f} ms (full - no_gather)")
    print(f"backward+optimizer:   {ms_full - ms_fwd:+.1f} ms (full - fwd_only)")
    print(f"BN f32 round-trips:   {ms_slow - ms_full:+.1f} ms (slow_bn - full)")
    print(f"BN batch statistics:  {ms_full - ms_frozen:+.1f} ms (full - no_bn_stats)")


if __name__ == "__main__":
    main()
