#!/usr/bin/env python
"""Probe: reconcile the s2d paradox (VERDICT r4 next-round item 4).

Round-4 facts in tension:
  - probe_topres_variants: s2d halves d1c1's FORWARD in isolation
    (4.19 -> 2.57 ms at batch 24);
  - probe_step_variants: the full train step with ``s2d_first`` is
    6.8 ms SLOWER than base (178.9 vs 172.1 ms).

Never measured: the s2d layer's BACKWARD, the pack/unpack boundary
under autodiff, and the kernel-lift VJP. This probe splits them out
with the corrected slope methodology (chained reps, full-tensor
feedback so nothing DCEs, short/long-chain slope cancelling the ~20 ms
relay fetch constant - see probe_layer_budget.py).

Part A - per-layer fwd and fwd+bwd slopes, batch 24 bf16, for the three
top-resolution 288x512 layers:
  base      lax conv as the production step runs it
  s2d       conv in packed space, kernel LIFTED INSIDE the rep from the
            original (3,3,Ci,Co) weights (exactly what s2d_first does in
            tracknet_train_forward), chain stays packed - the lift VJP
            and 4x-MAC packed grads are included, the pack/unpack
            boundary is NOT
  s2d+bnd   same with pack(x)/unpack(y) inside every rep - the boundary
            cost under autodiff (unpack VJP = pack of the cotangent)

Part B - full-forward fwd-only slopes for the production formulation
variants (base / split / s2d / split+s2d), against the full-step times
from probe_step_variants: step - fwd ~= bwd + optimizer, attributing
each variant's full-step delta to forward vs backward.

Usage: python tools/probe_s2d_attribution.py [--batch 24]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--k-short", type=int, default=3)
    ap.add_argument("--k-long", type=int, default=9)
    ap.add_argument("--skip-full", action="store_true",
                    help="part A only (per-layer)")
    ap.add_argument("--layers", type=str, default="d1c1,d1c2,u3c1",
                    help="comma-separated layer subset (each variant "
                    "costs 2 remote compiles - on slow relay sessions "
                    "a ~5 min constant per program - so trim when the "
                    "session is degraded)")
    args = ap.parse_args()

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tracknetv3_tpu.models.fused_forward import (
        _pack_s2d,
        _s2d_kernel_3x3,
        _unpack_s2d,
    )

    N = args.batch
    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    results = {"batch": N}

    def fetch(x):
        return np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)

    def med_total(f, *a):
        fetch(f(*a))  # compile + warm
        ts = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fetch(f(*a))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    def slope(mk, *a):
        t_s = med_total(mk(args.k_short), *a)
        t_l = med_total(mk(args.k_long), *a)
        return (t_l - t_s) / (args.k_long - args.k_short)

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    # ---------------- Part A: per-layer fwd / fwd+bwd ----------------
    sel = {v for v in args.layers.split(",") if v}
    layers = [
        l for l in [
            ("d1c1", 288, 512, 24, 64),
            ("d1c2", 288, 512, 64, 64),
            ("u3c1", 288, 512, 192, 64),
        ] if l[0] in sel
    ]
    print("# layer  variant      f_ms    fb_ms   (slope, batch %d)" % N,
          flush=True)
    for name, H, W, Ci, Co in layers:
        x = jnp.asarray(rng.standard_normal((N, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.bfloat16)
        # partner kernel closes the Co -> Ci cycle so reps chain
        wb = jnp.asarray(rng.standard_normal((3, 3, Co, Ci)) * 0.05,
                         jnp.bfloat16)
        xp = _pack_s2d(x)
        wpb = None  # lifted partner built inside reps

        def mk_base_f(k, _w=w, _wb=wb):
            @jax.jit
            def f(x):
                for _ in range(k):
                    x = conv(conv(x, _w), _wb)
                return x
            return f

        def mk_base_fb(k, _w=w, _wb=wb):
            def one(x, w):
                y = conv(conv(x, w), _wb)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-12

            g = jax.grad(one, argnums=(0, 1))

            @jax.jit
            def f(x, w):
                for _ in range(k):
                    dx, dw = g(x, w)
                    x = x + dx.astype(x.dtype) * 1e-4
                    w = w + dw.astype(w.dtype) * 1e-4
                return x
            return f

        def mk_s2d_f(k, _w=w, _wb=wb):
            @jax.jit
            def f(xp):
                wp = _s2d_kernel_3x3(_w)
                wpb = _s2d_kernel_3x3(_wb)
                for _ in range(k):
                    xp = conv(conv(xp, wp), wpb)
                return xp
            return f

        def mk_s2d_fb(k, _w=w, _wb=wb):
            def one(xp, w):
                # the lift runs inside the differentiated fn, as in
                # tracknet_train_forward: its VJP cost is part of the
                # variant
                wp = _s2d_kernel_3x3(w)
                wpb = _s2d_kernel_3x3(_wb)
                y = conv(conv(xp, wp), wpb)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-12

            g = jax.grad(one, argnums=(0, 1))

            @jax.jit
            def f(xp, w):
                for _ in range(k):
                    dxp, dw = g(xp, w)
                    xp = xp + dxp.astype(xp.dtype) * 1e-4
                    w = w + dw.astype(w.dtype) * 1e-4
                return xp
            return f

        def mk_s2d_bnd_fb(k, _w=w, _wb=wb, _Ci=Ci):
            def one(x, w):
                wp = _s2d_kernel_3x3(w)
                yp = conv(_pack_s2d(x), wp)
                y = _unpack_s2d(yp, w.shape[3])
                y2 = conv(y, _wb)  # partner at ORIGINAL res closes cycle
                return jnp.sum(y2.astype(jnp.float32) ** 2) * 1e-12

            g = jax.grad(one, argnums=(0, 1))

            @jax.jit
            def f(x, w):
                for _ in range(k):
                    dx, dw = g(x, w)
                    x = x + dx.astype(x.dtype) * 1e-4
                    w = w + dw.astype(w.dtype) * 1e-4
                return x
            return f

        row = {}
        row["base_f"] = slope(mk_base_f, x) * 1e3 / 2  # /2: two convs per rep
        row["base_fb"] = slope(mk_base_fb, x, w) * 1e3 / 2
        row["s2d_f"] = slope(mk_s2d_f, xp) * 1e3 / 2
        row["s2d_fb"] = slope(mk_s2d_fb, xp, w) * 1e3 / 2
        row["s2d_bnd_fb"] = slope(mk_s2d_bnd_fb, x, w) * 1e3 / 2
        results[name] = row
        print(
            f"# {name}: base f {row['base_f']:.2f} fb {row['base_fb']:.2f} | "
            f"s2d f {row['s2d_f']:.2f} fb {row['s2d_fb']:.2f} | "
            f"s2d+boundary fb {row['s2d_bnd_fb']:.2f}  ms/conv",
            flush=True,
        )

    # ---------------- Part B: full-forward fwd-only slopes -------------
    if not args.skip_full:
        from tracknetv3_tpu.models import get_model
        from tracknetv3_tpu.models.fused_forward import tracknet_train_forward
        from tracknetv3_tpu.ops.losses import wbce_from_logits

        L, bg_mode = 8, ""
        _, variables = get_model("TrackNet", L, bg_mode)
        params, stats = variables["params"], variables["batch_stats"]
        x0 = jnp.asarray(
            rng.standard_normal((N, 288, 512, 3 * L)), jnp.bfloat16
        )
        y = jnp.asarray(
            (rng.random((N, 288, 512, L)) < 0.001), jnp.float32
        )

        VAR = [
            ("base", {}),
            ("split", {"split_up_entry": True}),
            ("s2d", {"s2d_first": True}),
            ("split+s2d", {"split_up_entry": True, "s2d_first": True}),
        ]
        print("# full-forward fwd-only slopes:", flush=True)
        for vname, kw in VAR:
            def mk_fwd(k, _kw=kw):
                @jax.jit
                def f(x, l):
                    for _ in range(k):
                        logits, _ = tracknet_train_forward(
                            params, stats, x + l * 1e-30, train=True,
                            fast_bn=True, **_kw,
                        )
                        l = wbce_from_logits(logits, y)
                    return l
                return f

            ms = slope(mk_fwd, x0, jnp.float32(0.0)) * 1e3
            results[f"fwd_{vname}"] = ms
            print(f"#   {vname:<10} {ms:7.1f} ms fwd", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
