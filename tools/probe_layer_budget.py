#!/usr/bin/env python
"""Probe: per-layer budget of the TrackNet train step + Pallas matmul ceiling.

PROFILE.md's round-3 ablations bounded the train-MFU gap (48% of peak vs
75% for the folded-BN inference forward) to "un-folded BN normalize
chains + skip/pool/upsample elementwise VJP traffic" — but never split
it per layer. This probe times, for every distinct conv shape in the
train-form U-Net at the production batch (bench --train: batch 24,
bg_mode '', fast_bn, bf16):

  conv_f    — the bare conv forward,
  chain_f   — conv + batch stats + fast_bn normalize + ReLU (the real
              per-layer train forward, models/fused_forward.py:196-236),
  conv_fb   — value + full vjp of conv_f,
  chain_fb  — value + full vjp of chain_f,

so (chain_* - conv_*) is exactly the BN+ReLU toll XLA cannot fuse into
the conv, per layer — the number a Pallas fused conv+BN+ReLU block must
beat. Layout ops (pool, nearest-up2x + skip concat) are timed fwd+bwd
the same way.

--matmul adds a Pallas ceiling probe: a minimal tiled matmul kernel at
the exact (K=9*Cin, N=Cout) GEMM shapes an im2col-in-VMEM conv kernel
would run, reporting achievable TF/s per shape — the MXU ceiling for a
hand-written conv at that layer (N=64 layers pad the 128-lane MXU).

Timing forces completion with a scalar fetch per pass; reps are chained
with an output-feedback perturbation so XLA cannot CSE the chain.
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--matmul", action="store_true")
    ap.add_argument("--layers", action="store_true")
    ap.add_argument("--layout", action="store_true")
    args = ap.parse_args()
    if not (args.matmul or args.layers or args.layout):
        args.matmul = args.layers = args.layout = True

    import jax
    import jax.numpy as jnp
    from jax import lax

    N = args.batch
    dn = ("NHWC", "HWIO", "NHWC")
    peak = 197e12  # v5e bf16

    def timed(jb, *xs):
        jb(*xs).item()
        ts = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            jb(*xs).item()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / args.reps

    results = {"batch": N}
    rng = np.random.default_rng(0)

    # ---- per-layer conv vs chain ----------------------------------------
    # (name, H, W, Cin, Cout, multiplicity in the net)
    layers = [
        ("d1c1", 288, 512, 24, 64, 1),
        ("d1c2", 288, 512, 64, 64, 2),   # + u3c2
        ("d2c1", 144, 256, 64, 128, 1),
        ("d2c2", 144, 256, 128, 128, 2),  # + u2c2
        ("d3c1", 72, 128, 128, 256, 1),
        ("d3c2", 72, 128, 256, 256, 5),  # d3c2,d3c3,u1c2,u1c3 + 1 spare slot
        ("bnc1", 36, 64, 256, 512, 1),
        ("bnc2", 36, 64, 512, 512, 2),
        ("u1c1", 72, 128, 768, 256, 1),
        ("u2c1", 144, 256, 384, 128, 1),
        ("u3c1", 288, 512, 192, 64, 1),
    ]

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)

    def chain(x, w, scale, bias):
        y = conv(x, w)
        yf = y.astype(jnp.float32)
        bmean = jnp.mean(yf, axis=(0, 1, 2))
        bvar = jnp.maximum(
            jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(bmean), 0.0)
        inv = lax.rsqrt(bvar + 1e-5) * scale
        z = y * inv.astype(y.dtype) + (bias - bmean * inv).astype(y.dtype)
        return jnp.maximum(z, 0.0)

    def run_layer(name, H, W, Cin, Cout, mult):
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
        scale = jnp.ones((Cout,), jnp.float32)
        bias = jnp.zeros((Cout,), jnp.float32)
        flops = 2.0 * N * H * W * 9 * Cin * Cout

        # CSE-blocker: perturb the (small) weight tensor by the previous
        # rep's output scalar. NOTE a channel-broadcast feedback into the
        # conv *input* (x + out[..., :1]) SIGABRTs the XLA-TPU conv
        # emitter at 288x512 spatial (S32 overflow in the input-fusion
        # broadcast chunk loader) - keep feedback on weights only.
        def fwd_body(fn, extra):
            def body(x, w):
                acc = jnp.float32(0)
                for _ in range(args.reps):
                    out = fn(x, w, *extra)
                    acc = acc + out.ravel()[0].astype(jnp.float32)
                    w = w + (1e-9 * acc).astype(w.dtype)
                return acc
            return jax.jit(body)

        def fb_body(fn, extra):
            def one(x, w):
                out = fn(x, w, *extra)
                return jnp.sum(out.astype(jnp.float32) * out.astype(jnp.float32)) * 1e-9

            g = jax.value_and_grad(one, argnums=(0, 1))

            def body(x, w):
                acc = jnp.float32(0)
                for _ in range(args.reps):
                    v, (dx, dw) = g(x, w)
                    w = w + (1e-6 * dw).astype(w.dtype)
                    acc = acc + v + dx.ravel()[0].astype(jnp.float32)
                return acc
            return jax.jit(body)

        row = {}
        t = timed(fwd_body(lambda x, w: conv(x, w), ()), x, w)
        row["conv_f"] = {"ms": t * 1e3, "pct_peak": flops / t / peak * 100}
        t = timed(fwd_body(chain, (scale, bias)), x, w)
        row["chain_f"] = {"ms": t * 1e3, "pct_peak": flops / t / peak * 100}
        t = timed(fb_body(lambda x, w: conv(x, w), ()), x, w)
        row["conv_fb"] = {"ms": t * 1e3, "pct_peak": 3 * flops / t / peak * 100}
        t = timed(fb_body(chain, (scale, bias)), x, w)
        row["chain_fb"] = {"ms": t * 1e3, "pct_peak": 3 * flops / t / peak * 100}
        row["mult"] = mult
        row["bn_toll_f_ms"] = row["chain_f"]["ms"] - row["conv_f"]["ms"]
        row["bn_toll_fb_ms"] = row["chain_fb"]["ms"] - row["conv_fb"]["ms"]
        results[name] = row
        print(f"# {name} {H}x{W} {Cin}->{Cout} x{mult}: "
              f"conv_f {row['conv_f']['ms']:.2f}ms ({row['conv_f']['pct_peak']:.0f}%) "
              f"chain_f {row['chain_f']['ms']:.2f}ms | "
              f"conv_fb {row['conv_fb']['ms']:.2f}ms ({row['conv_fb']['pct_peak']:.0f}%) "
              f"chain_fb {row['chain_fb']['ms']:.2f}ms | toll "
              f"f {row['bn_toll_f_ms']:.2f} fb {row['bn_toll_fb_ms']:.2f}",
              flush=True)

    if args.layers:
        tot = {"conv_f": 0.0, "chain_f": 0.0, "conv_fb": 0.0, "chain_fb": 0.0}
        for spec in layers:
            run_layer(*spec)
            for k in tot:
                tot[k] += results[spec[0]][k]["ms"] * spec[5]
        results["layer_totals_ms"] = tot
        print(f"# TOTALS (x mult): conv_f {tot['conv_f']:.1f} chain_f "
              f"{tot['chain_f']:.1f} conv_fb {tot['conv_fb']:.1f} chain_fb "
              f"{tot['chain_fb']:.1f}", flush=True)

    # ---- layout ops ------------------------------------------------------
    if args.layout:
        import tracknetv3_tpu.models.fused_forward as ff

        def pool(x):
            return lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        def upcat(xs, skip):
            return jnp.concatenate([ff._up2x(xs), skip], axis=-1)

        for name, shape in [
            ("pool_288x512c64", (N, 288, 512, 64)),
            ("pool_144x256c128", (N, 144, 256, 128)),
            ("pool_72x128c256", (N, 72, 128, 256)),
        ]:
            x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

            def body(x, _w):
                acc = jnp.float32(0)
                for _ in range(args.reps):
                    v, vjp = jax.vjp(pool, x)
                    (dx,) = vjp(v)
                    x = x + (1e-6 * dx).astype(x.dtype)
                    acc = acc + v.ravel()[0].astype(jnp.float32)
                return acc

            t = timed(jax.jit(body), x, x)
            results[name] = {"fb_ms": t * 1e3}
            print(f"# {name}: fwd+bwd {t*1e3:.2f} ms", flush=True)

        for name, small, skipc in [
            ("upcat_36x64c512", (N, 36, 64, 512), 256),
            ("upcat_72x128c256", (N, 72, 128, 256), 128),
            ("upcat_144x256c128", (N, 144, 256, 128), 64),
        ]:
            xs = jnp.asarray(rng.standard_normal(small), jnp.bfloat16)
            skip = jnp.asarray(
                rng.standard_normal(
                    (N, small[1] * 2, small[2] * 2, skipc)), jnp.bfloat16)

            def body(xs, skip):
                acc = jnp.float32(0)
                for _ in range(args.reps):
                    v, vjp = jax.vjp(upcat, xs, skip)
                    dxs, dskip = vjp(v)
                    xs = xs + (1e-6 * dxs).astype(xs.dtype)
                    skip = skip + (1e-6 * dskip).astype(skip.dtype)
                    acc = acc + v.ravel()[0].astype(jnp.float32)
                return acc

            t = timed(jax.jit(body), xs, skip)
            results[name] = {"fb_ms": t * 1e3}
            print(f"# {name}: fwd+bwd {t*1e3:.2f} ms", flush=True)

    # ---- Pallas matmul ceiling ------------------------------------------
    if args.matmul:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def mm(x, w, tile_m):
            M, K = x.shape
            _, Nc = w.shape

            def kernel(x_ref, w_ref, o_ref):
                o_ref[:] = jnp.dot(
                    x_ref[:], w_ref[:], preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

            return pl.pallas_call(
                kernel,
                grid=(M // tile_m,),
                in_specs=[
                    pl.BlockSpec((tile_m, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, Nc), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile_m, Nc), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, Nc), jnp.bfloat16),
            )(x, w)

        M = 36864  # = batch 24 x one 48x32 spatial tile per row-block
        for K, Nc in [(216, 64), (576, 64), (1728, 64), (576, 128),
                      (1152, 128), (3456, 128), (2304, 256), (4608, 512)]:
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((K, Nc)) * 0.05, jnp.bfloat16)
            flops = 2.0 * M * K * Nc
            best = None
            for tile_m in (256, 512, 1024):
                if (K + Nc) * tile_m * 2 * 3 > 14 * 2**20:
                    continue

                def body(x, w, tm=tile_m):
                    acc = jnp.float32(0)
                    for _ in range(args.reps):
                        o = mm(x, w, tm)
                        acc = acc + o.ravel()[0].astype(jnp.float32)
                        w = w + (1e-9 * acc).astype(w.dtype)
                    return acc

                try:
                    t = timed(jax.jit(body), x, w)
                except Exception as e:  # tile too big etc.
                    print(f"# mm K={K} N={Nc} tile {tile_m}: {type(e).__name__}",
                          flush=True)
                    continue
                tf = flops / t / 1e12
                if best is None or tf > best[1]:
                    best = (tile_m, tf, t)
            if best:
                results[f"mm_K{K}_N{Nc}"] = {
                    "tile_m": best[0], "tflops": best[1],
                    "pct_peak": best[1] / (peak / 1e12) * 100}
                print(f"# mm K={K} N={Nc}: {best[1]:.0f} TF/s "
                      f"({best[1]/(peak/1e12)*100:.0f}% peak, tile {best[0]})",
                      flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
