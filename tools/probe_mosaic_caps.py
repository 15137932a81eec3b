#!/usr/bin/env python
"""Probe: which halo/shift mechanisms does this chip's Mosaic support?

The Pallas conv kernels need dy/dx-shifted (stride-1 offsets) views of
NHWC tiles. Mosaic constrains sliced DMAs: the copy's shape on *tiled*
dims (the last two: sublane, lane) must be tile-aligned, while leading
dims are unconstrained. First probe run (C=64, W+2=514) confirmed the
walls: "Slice shape along dimension 1 must be aligned to tiling (8),
but is 514" / "... dimension 3 ... (128), but is 24"; pltpu.roll is
"not implemented: Rotate with non-32-bit data" for bf16.

This run pins down the exact rules at C=128 (the d2c2/d3/bottleneck
layer widths, all lane-aligned):

  U1  rows(leading)-slice DMA, arbitrary shape+offset, aligned minor dims
  U2  column (sublane) slice at offset dx=1, aligned shape
  U3  in-kernel value slice at a sublane offset (relayout path)
  U4  in-kernel lane slice at an aligned offset (128)
  U5  pltpu.repeat x2 on sublane+lane (the nearest-upsample primitive)
  U6  f32 sublane roll (Winograd/pool option: 32-bit rotates)
  U7  sublane slice with offset dx=1 *in the DMA* on dim -2 of rank-4

Usage: python tools/probe_mosaic_caps.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def short_err(e):
    msg = str(e)
    for line in msg.splitlines():
        low = line.lower()
        if "must be aligned" in low or "not implemented" in low:
            return line.strip()[-140:]
        if "Mosaic failed" in line:
            keep = line.split("Mosaic failed to compile TPU kernel:")[-1].strip()
            if keep:
                return keep[:140]
    return msg.splitlines()[0][:140] if msg else "?"


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W, C = 32, 256, 128
    TH = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W + 8, C), np.float32), jnp.bfloat16)
    results = {}

    def run(name, fn, arg, expect):
        try:
            out = np.asarray(jax.jit(fn)(arg), np.float32)
            ok = np.array_equal(out, np.asarray(expect, np.float32))
            results[name] = "ok" if ok else "WRONG-VALUES"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {short_err(e)}"
        print(f"# {name}: {results[name]}", flush=True)

    def simple_call(kernel, out_shape, out_block, scratch):
        def fn(x):
            return pl.pallas_call(
                kernel,
                grid=(H // TH,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    out_block, lambda i: (i,) + (0,) * (len(out_block) - 1),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
                scratch_shapes=scratch,
            )(x)

        return fn

    # U1: leading-dim slice, odd offset+shape; minor dims whole+aligned
    def u1_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        # rows [i*TH .. i*TH+TH) plus one extra row at odd offset:
        # fetch TH rows starting at i*TH (leading dim offset/shape free?)
        d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH)], xt, sem)
        d.start()
        d.wait()
        o_ref[:] = xt[:]

    run(
        "U1 leading-slice DMA",
        simple_call(
            u1_kernel, (H, W + 8, C), (TH, W + 8, C),
            [pltpu.VMEM((TH, W + 8, C), jnp.bfloat16), pltpu.SemaphoreType.DMA],
        ),
        x, x,
    )

    # U2: sublane slice at offset 1, aligned shape W
    def u2_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TH, TH), pl.ds(1, W)], xt, sem
        )
        d.start()
        d.wait()
        o_ref[:] = xt[:]

    run(
        "U2 sublane-offset-1 DMA",
        simple_call(
            u2_kernel, (H, W, C), (TH, W, C),
            [pltpu.VMEM((TH, W, C), jnp.bfloat16), pltpu.SemaphoreType.DMA],
        ),
        x, x[:, 1 : W + 1],
    )

    # U3: in-kernel value slice at sublane offset 1
    def u3_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH)], xt, sem)
        d.start()
        d.wait()
        o_ref[:] = xt[:, 1 : W + 1]

    run(
        "U3 in-kernel sublane-offset slice",
        simple_call(
            u3_kernel, (H, W, C), (TH, W, C),
            [pltpu.VMEM((TH, W + 8, C), jnp.bfloat16), pltpu.SemaphoreType.DMA],
        ),
        x, x[:, 1 : W + 1],
    )

    # U4: in-kernel lane slice at aligned offset (channels 0:128 of 256)
    x2 = jnp.asarray(
        rng.standard_normal((H, W, 256), np.float32), jnp.bfloat16
    )

    def u4_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH)], xt, sem)
        d.start()
        d.wait()
        o_ref[:] = xt[:, :, 128:256]

    run(
        "U4 in-kernel lane-slice aligned",
        simple_call(
            u4_kernel, (H, W, 128), (TH, W, 128),
            [pltpu.VMEM((TH, W, 256), jnp.bfloat16), pltpu.SemaphoreType.DMA],
        ),
        x2, x2[:, :, 128:256],
    )

    # U5: pltpu.repeat x2 along sublane and lane (nearest upsample)
    def u5_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH)], xt, sem)
        d.start()
        d.wait()
        v = xt[:]  # (TH, W, C)
        v = pltpu.repeat(v, 2, 0)
        o_ref[:] = v

    xs = x[:, : W, :]

    def u5(x):
        return pl.pallas_call(
            u5_kernel,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (2 * TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((2 * H, W, C), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((TH, W, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    expect_u5 = np.concatenate(
        [
            np.repeat(np.asarray(xs, np.float32)[i * TH : (i + 1) * TH], 2, 0)
            for i in range(H // TH)
        ]
    )
    run("U5 pltpu.repeat sublane x2", u5, xs, expect_u5)

    # U6: f32 sublane roll (32-bit rotate)
    xf = jnp.asarray(rng.standard_normal((H, W, C), np.float32), jnp.float32)

    def u6_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH)], xt, sem)
        d.start()
        d.wait()
        o_ref[:] = pltpu.roll(xt[:], 1, 1)

    def u6(x):
        return pl.pallas_call(
            u6_kernel,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TH, W, C), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    run("U6 f32 sublane roll", u6, xf, np.roll(np.asarray(xf), 1, 1))

    # U7: rank-4 DMA with sublane (dim -2) offset 1 (the conv fetch form)
    x4 = jnp.asarray(
        rng.standard_normal((2, H, W + 8, C), np.float32), jnp.bfloat16
    )

    def u7_kernel(x_hbm, o_ref, xt, sem):
        i = pl.program_id(0)
        d = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * TH, TH), pl.ds(1, W)], xt, sem
        )
        d.start()
        d.wait()
        o_ref[0] = xt[:]

    def u7(x):
        return pl.pallas_call(
            u7_kernel,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, TH, W, C), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, H, W, C), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((TH, W, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    run("U7 rank4 sublane-offset DMA", u7, x4, np.asarray(x4)[0:1, :, 1 : W + 1])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
