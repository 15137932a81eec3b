#!/usr/bin/env python
"""Probe: can Winograd F(2x2, 3x3) break the 64-output-channel MXU lane
ceiling on the top-resolution TrackNet convs?

Background (tools/probe_layer_budget.py, corrected): the train step's
MFU gap concentrates in the 288x512 layers with 64 output channels
(d1c1 12%, d1c2 33%, u3c1 50% of bf16 peak for fwd+bwd). Any direct
formulation of a 64-out conv leaves >=half of the 128-wide MXU columns
idle - a hard 50% ceiling. Winograd computes the same outputs with
4/9 of the MACs (16 multiplies per 2x2 output tile vs 36), so even a
50%-efficient Winograd core yields 9/4 * 50% = 112% effective
throughput against the direct conv's flop count... IF the tile
transforms are free. In plain XLA they are not (the 16-point transform
tensors are materialized in HBM: ~4x the activation bytes). This probe
measures, on the real chip at the real shapes:

  1. direct lax.conv forward (the baseline);
  2. the im2col matmul (M, 9*Ci) x (9*Ci, Co) - the direct ceiling;
  3. the Winograd core batched matmul (16, M, Ci) x (16, Ci, Co) -
     the Winograd ceiling, lane-limited the same way but 2.25x fewer
     useful MACs... per MAC;
  4. full plain-XLA Winograd forward (pad -> 16 strided views ->
     input transform -> batched matmul -> output transform), with a
     numerics check vs the direct conv;

for the three offender shapes. If (4) < (1), plain XLA already pays and
a fused Pallas version (transforms in VMEM, zero extra HBM traffic)
pays more. If even (3)'s effective rate is below (1)'s achieved rate,
Winograd cannot help regardless of fusion and the 50% lane ceiling
stands.

Usage: python tools/probe_winograd.py [--batch 24]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015).
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_fwd(x, k, core_dtype):
    """F(2x2,3x3) SAME conv, NHWC, even H and W. Plain XLA formulation:
    transform tensors are materialized; the core is a 16-batch matmul in
    ``core_dtype`` with f32 accumulation semantics left to XLA."""
    import jax.numpy as jnp

    B, H, W, Ci = x.shape
    Co = k.shape[-1]
    ho, wo = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 16 strided views: d[a, b][n, i, j, c] = xp[n, 2i+a, 2j+b, c]
    views = [
        xp[:, a : a + 2 * ho : 2, b : b + 2 * wo : 2, :]
        for a in range(4)
        for b in range(4)
    ]
    d = jnp.stack(views)  # (16, B, ho, wo, Ci)
    t_in = jnp.asarray(np.kron(BT, BT), x.dtype)  # (16, 16)
    v = jnp.einsum("pq,qbijc->pbijc", t_in, d)  # input transform
    u = jnp.einsum("pi,ijcd,qj->pqcd", G, k.astype(jnp.float32), G)
    u = u.reshape(16, Ci, Co).astype(core_dtype)
    m = jnp.einsum(
        "pbijc,pcd->pbijd", v.astype(core_dtype), u
    )  # (16, B, ho, wo, Co) - the MXU core
    t_out = jnp.asarray(np.kron(AT, AT), m.dtype)  # (4, 16)
    y = jnp.einsum("rp,pbijd->rbijd", t_out, m)  # (4, B, ho, wo, Co)
    # scatter the 2x2 output phases back: y[r = 2*dy + dx] -> (2i+dy, 2j+dx)
    y = y.reshape(2, 2, B, ho, wo, Co)
    y = jnp.moveaxis(y, (0, 1), (2, 4))  # (B, ho, 2, wo, 2, Co)
    return y.reshape(B, H, W, Co)


def timeit(fn, *args, passes=5, reps=6):
    """Output-feedback chained timing (probe_layer_budget methodology):
    one jitted body runs ``reps`` dependent invocations, a scalar fetch
    forces completion; the fetch constant amortizes over reps."""
    import jax
    import jax.numpy as jnp

    def body(*xs):
        x0, rest = xs[0], xs[1:]
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(x0, *rest)
            acc = acc + out.ravel()[0].astype(jnp.float32)
            x0 = x0 + (1e-6 * acc).astype(x0.dtype)
        return acc
    jb = jax.jit(body)
    jb(*args).item()
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        jb(*args).item()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B = args.batch
    shapes = [
        ("d1c1", 288, 512, 24, 64),
        ("d1c2", 288, 512, 64, 64),
        ("u3c1", 288, 512, 192, 64),
    ]
    results = {"batch": B}
    rng = np.random.default_rng(0)
    for name, H, W, Ci, Co in shapes:
        x = jnp.asarray(
            rng.standard_normal((B, H, W, Ci), np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((3, 3, Ci, Co), np.float32) * 0.06, jnp.bfloat16
        )
        direct_flops = 2.0 * B * H * W * 9 * Ci * Co

        def direct(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ms_direct = timeit(direct, x, k)
        y_ref = jax.jit(direct)(x, k)

        # im2col ideal: one dense matmul at the same useful MACs
        xm = jnp.asarray(
            rng.standard_normal((B * H * W, 9 * Ci), np.float32), jnp.bfloat16
        )
        km = jnp.asarray(
            rng.standard_normal((9 * Ci, Co), np.float32), jnp.bfloat16
        )
        ms_im2col = timeit(lambda a, b: a @ b, xm, km)

        # Winograd core ideal: the batched (16, M, Ci) x (16, Ci, Co)
        M = B * (H // 2) * (W // 2)
        vw = jnp.asarray(
            rng.standard_normal((16, M, Ci), np.float32), jnp.bfloat16
        )
        uw = jnp.asarray(
            rng.standard_normal((16, Ci, Co), np.float32), jnp.bfloat16
        )
        ms_wcore = timeit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,)))
            ),
            vw, uw,
        )
        wino_core_flops = 2.0 * 16 * M * Ci * Co

        # full plain-XLA Winograd + numerics vs direct
        wf = functools.partial(winograd_fwd, core_dtype=jnp.bfloat16)
        ms_wino = timeit(wf, x, k)
        y_w = jax.jit(wf)(x, k)
        err = float(
            jnp.max(jnp.abs(y_w.astype(jnp.float32) - y_ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))

        row = {
            "direct_ms": ms_direct,
            "direct_pct": 100 * direct_flops / (ms_direct / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "im2col_ms": ms_im2col,
            "im2col_pct": 100 * direct_flops / (ms_im2col / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "wino_core_ms": ms_wcore,
            "wino_core_pct_raw": 100 * wino_core_flops / (ms_wcore / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "wino_core_pct_effective": 100 * direct_flops / (ms_wcore / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "wino_full_ms": ms_wino,
            "wino_full_pct_effective": 100 * direct_flops / (ms_wino / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "wino_maxerr": err,
            "ref_scale": scale,
        }
        results[name] = row
        print(
            f"# {name}: direct {ms_direct:.2f}ms ({row['direct_pct']:.0f}%) | "
            f"im2col {ms_im2col:.2f}ms ({row['im2col_pct']:.0f}%) | "
            f"wino core {ms_wcore:.2f}ms (raw {row['wino_core_pct_raw']:.0f}%, "
            f"eff {row['wino_core_pct_effective']:.0f}%) | "
            f"wino full {ms_wino:.2f}ms (eff {row['wino_full_pct_effective']:.0f}%) "
            f"err {err:.3f}/{scale:.1f}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
