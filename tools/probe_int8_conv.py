#!/usr/bin/env python
"""Probe: does XLA-TPU lower int8 2-D convolutions to the MXU's int8 path?

v5e's int8 peak is ~2x its bf16 peak (394 vs 197 TOPS). If an
s8 x s8 -> s32 `lax.conv_general_dilated` runs ~2x the bf16 conv, a
quantized TrackNet inference path is worth building; if XLA upcasts
int8 convs internally, it is not. This probe times the U-Net's heaviest
conv shapes in both dtypes on the real chip and prints a JSON verdict.

Timing forces completion with a scalar fetch per pass (PROFILE.md:
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
    ap.add_argument("--reps", type=int, default=8, help="convs chained per pass")
    ap.add_argument("--batch", type=int, default=16,
                    help="conv batch (the production pipeline runs ~120 "
                    "windows per dispatch - small batches underfill the MXU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    # The three heaviest TrackNet conv shapes (NHWC, 3x3, batch = the
    # inference pipeline's per-window composition at batch 16 windows):
    # down_block_3/up_block_1 at 72x128x256->256 and the 512-channel
    # bottleneck at 36x64. FLOPs/conv: 2*N*H*W*K*K*Cin*Cout.
    N = args.batch
    shapes = [
        ("72x128 c256", (N, 72, 128, 256), (3, 3, 256, 256)),
        ("36x64 c512", (N, 36, 64, 512), (3, 3, 512, 512)),
        ("144x256 c128", (N, 144, 256, 128), (3, 3, 128, 128)),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    results = {}
    for name, xs, ws in shapes:
        n, h, w, cin = xs
        cout = ws[3]
        flops = 2.0 * n * h * w * 9 * cin * cout * args.reps
        row = {}
        for dtype, acc in (("bfloat16", jnp.bfloat16), ("int8", jnp.int32)):
            rng = np.random.default_rng(0)
            if dtype == "int8":
                x = jnp.asarray(rng.integers(-127, 127, xs, np.int8))
                k = jnp.asarray(rng.integers(-127, 127, ws, np.int8))
            else:
                x = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
                k = jnp.asarray(rng.standard_normal(ws), jnp.bfloat16)

            @jax.jit
            def run(x, k):
                y = x
                for _ in range(args.reps):
                    y = lax.conv_general_dilated(
                        y.astype(x.dtype) if dtype == "int8" else y,
                        k,
                        (1, 1),
                        "SAME",
                        dimension_numbers=dn,
                        preferred_element_type=acc,
                    )
                    if dtype == "int8":
                        # clamp back to int8 between convs (as a quantized
                        # pipeline would, keeping every conv on the s8 path)
                        y = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
                    else:
                        y = y.astype(jnp.bfloat16)
                return jnp.sum(y.astype(jnp.float32))

            run(x, k)  # compile + warm
            times = []
            for _ in range(args.passes):
                t0 = time.time()
                float(np.asarray(run(x, k)))
                times.append(time.time() - t0)
            dt = statistics.median(times)
            row[dtype] = {
                "ms": round(dt * 1e3, 3),
                "tops": round(flops / dt / 1e12, 2),
            }
            print(f"# {name} {dtype}: {dt*1e3:.2f} ms, "
                  f"{flops/dt/1e12:.1f} T(FL)OP/s", file=sys.stderr)
        row["speedup"] = round(row["bfloat16"]["ms"] / row["int8"]["ms"], 3)
        results[name] = row

    verdict = all(r["speedup"] > 1.4 for r in results.values())
    print(json.dumps({"int8_wins": verdict, "shapes": results}))


if __name__ == "__main__":
    main()
