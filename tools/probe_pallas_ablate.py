#!/usr/bin/env python
"""Probe: decompose the Pallas wide-conv kernel's per-tile time.

probe_pallas_conv measured the full kernel (DMA + im2col sheet build +
3 K=3C matmuls) SLOWER than XLA's direct conv at the C>=128 shapes.
This probe ablates the kernel at the d3c2 shape (24, 72, 128, 256->256)
to find the component responsible:

  mm-only     resident VMEM sheet, 3 matmuls (the Mosaic MXU ceiling)
  mm1-only    resident sheet, ONE big (M, 9C) x (9C, C) matmul
  dma+mm      manual DMA slab, matmuls on a dummy resident sheet
  sheet+mm    resident slab, build sheet via offset stores, matmuls
  full        everything (reference point)
  full-9mm    no sheet: 9 matmuls on offset-sliced strips

If mm-only >= ~80% of peak, Mosaic's MXU pipeline is fine and the
im2col data movement is the enemy; if mm-only itself sits at ~30%,
a hand conv cannot beat XLA here and the Pallas-conv direction dies.

Usage: python tools/probe_pallas_ablate.py [--batch 24]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B = args.batch
    H, W, Ci, Co, TH = 72, 128, 256, 256, 8
    flops = 2.0 * B * H * W * 9 * Ci * Co
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci), np.float32), jnp.bfloat16)
    k = jnp.asarray(
        rng.standard_normal((3, 3, Ci, Co), np.float32) * 0.06, jnp.bfloat16
    )

    def make(variant):
        def kernel(xp_hbm, k_ref, out_ref, xt, xcat, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            want_dma = variant in ("dma+mm", "full", "full-9mm")
            if want_dma:
                dma = pltpu.make_async_copy(
                    xp_hbm.at[b, pl.ds(i * TH, TH + 2)], xt, sem
                )
                dma.start()
                dma.wait()
            if variant in ("sheet+mm", "full"):
                for dx in range(3):
                    xcat[:, :, dx * Ci : (dx + 1) * Ci] = xt[:, dx : dx + W]
            acc = jnp.zeros((TH * W, Co), jnp.float32)
            if variant == "full-9mm":
                for dy in range(3):
                    for dx in range(3):
                        strip = xt[dy : dy + TH, dx : dx + W].reshape(
                            TH * W, Ci
                        )
                        acc = acc + jnp.dot(
                            strip,
                            k_ref[dy][dx * Ci : (dx + 1) * Ci],
                            preferred_element_type=jnp.float32,
                        )
            elif variant == "mm1-only":
                sheet = xcat[0:TH].reshape(TH * W, 3 * Ci)
                big = jnp.concatenate([k_ref[0], k_ref[1], k_ref[2]], axis=0)
                # one (M, 9C) x (9C, C) matmul: reuse the 3C sheet 3x as
                # a stand-in for the 9C sheet (same MACs)
                for _ in range(3):
                    acc = acc + jnp.dot(
                        sheet, k_ref[0], preferred_element_type=jnp.float32
                    )
                del big
            else:
                for dy in range(3):
                    strip = xcat[dy : dy + TH].reshape(TH * W, 3 * Ci)
                    acc = acc + jnp.dot(
                        strip, k_ref[dy], preferred_element_type=jnp.float32
                    )
            out_ref[0] = acc.reshape(TH, W, Co).astype(out_ref.dtype)

        @jax.jit
        def conv(x, k):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
            kt = k.reshape(3, 3 * Ci, Co)
            return pl.pallas_call(
                kernel,
                grid=(B, H // TH),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (3, 3 * Ci, Co),
                        lambda b, i: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, TH, W, Co), lambda b, i: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((B, H, W, Co), jnp.bfloat16),
                scratch_shapes=[
                    pltpu.VMEM((TH + 2, W + 8, Ci), jnp.bfloat16),
                    pltpu.VMEM((TH + 2, W, 3 * Ci), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA,
                ],
            )(xp, kt)

        return conv

    def timeit(fn, *fargs, passes=5, reps=6):
        def body(*xs):
            x0, rest = xs[0], xs[1:]
            acc = jnp.float32(0)
            for _ in range(reps):
                out = fn(x0, *rest)
                acc = acc + out.ravel()[0].astype(jnp.float32)
                x0 = x0 + (1e-6 * acc).astype(x0.dtype)
            return acc

        jb = jax.jit(body)
        jb(*fargs).item()
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            jb(*fargs).item()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / reps * 1e3

    results = {"batch": B, "shape": "d3c2"}
    for variant in ("mm-only", "mm1-only", "dma+mm", "sheet+mm", "full", "full-9mm"):
        ms = timeit(make(variant), x, k)
        pct = 100 * flops / (ms / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS
        results[variant] = {"ms": ms, "pct_peak": pct}
        print(f"# {variant}: {ms:.2f} ms ({pct:.0f}% of peak)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
