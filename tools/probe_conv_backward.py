#!/usr/bin/env python
"""Probe: can the dL/dW gradient convolutions beat XLA's native lowering?

PROFILE.md's train-step ablation pinned the train MFU gap (48% vs the
75%-of-peak inference forward) on the convolution backward itself: XLA
lowers dL/dW as a conv whose contraction runs over the (batch, space)
dims with transposed-filter shapes that tile the MXU poorly. The
classic alternative is im2col: materialize the input patches once and
compute dW as one large plain matmul

    dW[kykx ci, co] = sum_{n,h,w} patches[n,h,w, kykx ci] * dy[n,h,w, co]

which is a (9*Cin x N*H*W) @ (N*H*W x Cout) GEMM - exactly the shape
the MXU is built for - at the cost of writing the patch tensor to HBM
(9x the activation bytes, ~0.5 ms of bandwidth for the 512-channel
block vs ~1.3 ms of compute).

This probe times, for the U-Net's three heaviest conv shapes at the
production train batch:
  - XLA's native dL/dW (grad of lax.conv_general_dilated wrt w),
  - the im2col-matmul dW (patches via conv_general_dilated_patches),
  - the full (dx, dw) backward both ways (dx stays a conv in both),
checks the two agree numerically, and prints a JSON verdict. Timing
forces completion with a scalar fetch per pass (PROFILE.md:
block_until_ready is unreliable on this runtime).
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--reps", type=int, default=8, help="grads chained per pass")
    ap.add_argument("--batch", type=int, default=24,
                    help="train batch (bench --train default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    N = args.batch
    # Heaviest train-form conv shapes (NHWC, 3x3, stride 1, SAME).
    shapes = [
        ("72x128 c256", (N, 72, 128, 256), (3, 3, 256, 256)),
        ("36x64 c512", (N, 36, 64, 512), (3, 3, 512, 512)),
        ("144x256 c128", (N, 144, 256, 128), (3, 3, 128, 128)),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        # bf16 in, bf16 out - matches the flax train-form convs (the
        # cotangent arriving at each conv in the real backward is bf16).
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def dw_native(x, w, dy):
        _, vjp = jax.vjp(lambda w_: conv(x, w_), w)
        return vjp(dy)[0]

    def dw_im2col(x, w, dy):
        kh, kw, cin, cout = w.shape
        # patches: (N, H, W, Cin*kh*kw), feature order = channel-major
        # (ci varies slowest? -> verified numerically below, then reshaped
        # to match HWIO).
        p = lax.conv_general_dilated_patches(
            x, (kh, kw), (1, 1), "SAME",
            dimension_numbers=dn)
        n, h, wd, pf = p.shape
        p2 = p.reshape(n * h * wd, pf)
        dy2 = dy.reshape(n * h * wd, cout)
        dw = jax.lax.dot_general(
            p2, dy2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # conv_general_dilated_patches output features are ordered
        # (cin, kh, kw) -> reshape then transpose to HWIO.
        return dw.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3).astype(w.dtype)

    def full_native(x, w, dy):
        _, vjp = jax.vjp(conv, x, w)
        return vjp(dy)

    def full_im2col(x, w, dy):
        # dx is the same conv-with-flipped-kernel either way; only dW
        # changes formulation.
        _, vjp = jax.vjp(lambda x_: conv(x_, w), x)
        return vjp(dy)[0], dw_im2col(x, w, dy)

    # ---- numeric check (small shape, f32) ----
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 8, 10, 5)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    dys = jnp.asarray(rng.standard_normal((2, 8, 10, 7)), jnp.float32)
    a = np.asarray(dw_native(xs, ws, dys))
    b = np.asarray(dw_im2col(xs, ws, dys))
    err = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    if err > 1e-5:
        print(json.dumps({"error": "im2col dW mismatch", "rel_err": err}))
        sys.exit(1)

    results = {"dw_numeric_rel_err": err, "batch": N}

    def timed(fn, x, w, dy, reps):
        # Chain grads so per-dispatch overhead amortizes; fold each grad
        # back into the operand so XLA cannot CSE the chain away.
        def body(x, w, dy):
            acc = jnp.float32(0)
            for i in range(reps):
                out = fn(x, w, dy)
                out = out if isinstance(out, tuple) else (out,)
                g = out[-1]  # dW
                w = (w + 1e-6 * g.astype(w.dtype))
                acc = acc + g.ravel()[0].astype(jnp.float32)
            return acc
        jb = jax.jit(body)
        jb(x, w, dy).item()  # compile + warm
        ts = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            jb(x, w, dy).item()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    for name, xshape, wshape in shapes:
        n, h, wd, cin = xshape
        cout = wshape[3]
        flops_dw = 2.0 * n * h * wd * 9 * cin * cout * args.reps
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(wshape), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal(xshape[:3] + (cout,)), jnp.bfloat16)
        row = {}
        for label, fn in (("dw_native", dw_native), ("dw_im2col", dw_im2col)):
            t = timed(fn, x, w, dy, args.reps)
            row[label] = {"ms": t * 1e3 / args.reps,
                          "tflops": flops_dw / t / 1e12}
        row["dw_speedup"] = row["dw_native"]["ms"] / row["dw_im2col"]["ms"]
        for label, fn in (("full_native", full_native), ("full_im2col", full_im2col)):
            t = timed(fn, x, w, dy, args.reps)
            # full backward = dW + dX, 2x the conv FLOPs
            row[label] = {"ms": t * 1e3 / args.reps,
                          "tflops": 2 * flops_dw / t / 1e12}
        row["full_speedup"] = row["full_native"]["ms"] / row["full_im2col"]["ms"]
        results[name] = row
        print(f"# {name}: dW native {row['dw_native']['ms']:.2f} ms "
              f"({row['dw_native']['tflops']:.1f} TF/s) vs im2col "
              f"{row['dw_im2col']['ms']:.2f} ms ({row['dw_im2col']['tflops']:.1f} TF/s) "
              f"-> {row['dw_speedup']:.2f}x | full bwd {row['full_speedup']:.2f}x",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
