#!/usr/bin/env python
"""Probe: hand-tiled Pallas conv3x3 vs XLA's direct conv at the
top-resolution TrackNet layer shapes.

Background: the train step's MFU gap concentrates in the 288x512 layers
with 64 output channels (tools/probe_layer_budget.py), and
tools/probe_winograd.py showed every XLA *matmul* reformulation of
those convs (im2col GEMM, Winograd batched core) is catastrophically
slower than the direct conv - an XLA GEMM-tiling pathology at
M~3.5e6, N=64, not a hardware limit (the same contraction inside XLA's
conv-backward emitters runs fine). So the remaining question this probe
answers on the real chip: does a hand-tiled Pallas implicit-GEMM conv -
halo-DMA'd input rows, im2col strips built in VMEM, one (TM, 3*Ci) x
(3*Ci, Co) MXU matmul per dy tap, f32 accumulation - beat XLA's 8-33%
of peak at these shapes?

Ceiling: with Co=64 the MXU's 128 lanes are half idle in any matmul
formulation -> ~50% of bf16 peak is the realistic cap.

Usage: python tools/probe_pallas_conv.py [--batch 24] [--interpret]
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


def make_conv3x3(TH: int, interpret: bool = False):
    """Returns conv(x, k) = SAME conv3x3, NHWC bf16, f32 accumulation,
    bf16 output. x must be pre-padded by 1 on H and W (zeros)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xp_hbm, k_ref, out_ref, xt3, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        H = out_ref.shape[1]
        W = out_ref.shape[2]
        Ci = xp_hbm.shape[3]
        Co = out_ref.shape[3]
        # Three column-shifted halo DMAs (dx = 0, 1, 2). Mosaic cannot
        # shift bf16 tiles in VMEM (concat of offset slices and
        # pltpu.roll both hit "not implemented" walls), but the DMA
        # engine slices HBM at arbitrary offsets for free - so fetch the
        # dx-shifted windows as three separate copies at offset 0.
        for dx in range(3):
            pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(i * TH, TH + 2), pl.ds(dx, W)],
                xt3.at[dx],
                sems.at[dx],
            ).start()
        for dx in range(3):
            pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(i * TH, TH + 2), pl.ds(dx, W)],
                xt3.at[dx],
                sems.at[dx],
            ).wait()
        # im2col sheet: (TH+2, W, 3*Ci), channel index dx*Ci + ci,
        # matching k[dy].reshape(3*Ci, Co)
        xcat = jnp.concatenate([xt3[0], xt3[1], xt3[2]], axis=-1)
        acc = jnp.zeros((TH * W, Co), jnp.float32)
        for dy in range(3):
            strip = xcat[dy : dy + TH].reshape(TH * W, 3 * Ci)
            acc = acc + jnp.dot(
                strip, k_ref[dy], preferred_element_type=jnp.float32
            )
        out_ref[0] = acc.reshape(TH, W, Co).astype(out_ref.dtype)

    @jax.jit
    def conv(x, k):
        B, H, W, Ci = x.shape
        Co = k.shape[-1]
        assert H % TH == 0, (H, TH)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        kt = k.reshape(3, 3 * Ci, Co)  # dy-major, rows (dx, ci)
        return pl.pallas_call(
            kernel,
            grid=(B, H // TH),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
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
                pltpu.VMEM((3, TH + 2, W, Ci), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(xp, kt)

    return conv


def make_conv3x3_wide(TH: int, interpret: bool = False, sheet: bool = True):
    """conv3x3 for C >= 128 (lane-aligned channels): one rows-slab DMA,
    halo shifts as plain in-kernel value slices (supported at aligned
    lane widths), K = 3*Ci matmul per dy tap. ``sheet=True`` builds the
    dx-concat im2col sheet via stores into a scratch (offset-free
    operands); ``sheet=False`` runs 9 separate K=Ci matmuls instead.

    x must be pre-padded: H+2 rows, and width padded to W+8 (1 left,
    7 right) so the minor dims of the DMA'd slab are tile-aligned."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xp_hbm, k_ref, out_ref, xt, xcat, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        W = out_ref.shape[2]
        Ci = xp_hbm.shape[3]
        Co = out_ref.shape[3]
        dma = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(i * TH, TH + 2)], xt, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((TH * W, Co), jnp.float32)
        if sheet:
            for dx in range(3):
                xcat[:, :, dx * Ci : (dx + 1) * Ci] = xt[:, dx : dx + W]
            for dy in range(3):
                strip = xcat[dy : dy + TH].reshape(TH * W, 3 * Ci)
                acc = acc + jnp.dot(
                    strip, k_ref[dy], preferred_element_type=jnp.float32
                )
        else:
            for dy in range(3):
                for dx in range(3):
                    strip = xt[dy : dy + TH, dx : dx + W].reshape(TH * W, Ci)
                    acc = acc + jnp.dot(
                        strip,
                        k_ref[dy][dx * Ci : (dx + 1) * Ci],
                        preferred_element_type=jnp.float32,
                    )
        out_ref[0] = acc.reshape(TH, W, Co).astype(out_ref.dtype)

    @jax.jit
    def conv(x, k):
        B, H, W, Ci = x.shape
        Co = k.shape[-1]
        assert H % TH == 0, (H, TH)
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
            interpret=interpret,
        )(xp, kt)

    return conv


def timeit(fn, *args, passes=5, reps=6):
    """Output-feedback chained timing (probe_layer_budget methodology)."""
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
    ap.add_argument("--interpret", action="store_true",
                    help="tiny-shape CPU interpreter numerics check only")
    args = ap.parse_args()

    if args.interpret:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    if not args.interpret:
        enable_persistent_cache()

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    if args.interpret:
        rng = np.random.default_rng(0)
        for (H, W, Ci, Co, TH) in [(16, 128, 24, 64, 8), (8, 256, 64, 64, 8)]:
            x = jnp.asarray(
                rng.standard_normal((2, H, W, Ci), np.float32), jnp.bfloat16
            )
            k = jnp.asarray(
                rng.standard_normal((3, 3, Ci, Co), np.float32) * 0.1,
                jnp.bfloat16,
            )
            y_p = make_conv3x3(TH, interpret=True)(x, k)
            y_d = direct(x, k)
            err = float(
                jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_d.astype(jnp.float32)))
            )
            scale = float(jnp.max(jnp.abs(y_d.astype(jnp.float32))))
            print(f"# interpret {H}x{W} {Ci}->{Co}: maxerr {err:.4f} / {scale:.1f}")
            assert err <= 0.03 * scale, (err, scale)
        for sheet in (True, False):
            H, W, Ci, Co, TH = 16, 128, 128, 128, 8
            x = jnp.asarray(
                rng.standard_normal((2, H, W, Ci), np.float32), jnp.bfloat16
            )
            k = jnp.asarray(
                rng.standard_normal((3, 3, Ci, Co), np.float32) * 0.1,
                jnp.bfloat16,
            )
            y_p = make_conv3x3_wide(TH, interpret=True, sheet=sheet)(x, k)
            y_d = direct(x, k)
            err = float(
                jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_d.astype(jnp.float32)))
            )
            scale = float(jnp.max(jnp.abs(y_d.astype(jnp.float32))))
            print(f"# interpret wide sheet={sheet}: maxerr {err:.4f} / {scale:.1f}")
            assert err <= 0.03 * scale, (err, scale)
        print("# interpret parity OK")
        return

    B = args.batch
    # (name, H, W, Ci, Co, TH, kernel-kind): narrow = the C<64-lane
    # variant (known to hit the Mosaic DMA alignment wall - kept for
    # the record); wide-sheet / wide-9mm = the lane-aligned C>=128
    # production candidates.
    shapes = [
        ("d2c2", 144, 256, 128, 128, 16, "wide"),
        ("d3c1", 72, 128, 128, 256, 8, "wide"),
        ("d3c2", 72, 128, 256, 256, 8, "wide"),
        ("bnc1", 36, 64, 256, 512, 12, "wide"),
        ("bnc2", 36, 64, 512, 512, 12, "wide"),
    ]
    results = {"batch": B}
    rng = np.random.default_rng(0)
    for name, H, W, Ci, Co, TH, kind in shapes:
        x = jnp.asarray(
            rng.standard_normal((B, H, W, Ci), np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((3, 3, Ci, Co), np.float32) * 0.06, jnp.bfloat16
        )
        flops = 2.0 * B * H * W * 9 * Ci * Co

        ms_direct = timeit(direct, x, k)
        y_ref = jax.jit(direct)(x, k)

        pconv = (
            make_conv3x3_wide(TH) if kind == "wide" else make_conv3x3(TH)
        )
        y_p = pconv(x, k)
        err = float(
            jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
        ms_pallas = timeit(pconv, x, k)

        row = {
            "direct_ms": ms_direct,
            "direct_pct": 100 * flops / (ms_direct / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "pallas_ms": ms_pallas,
            "pallas_pct": 100 * flops / (ms_pallas / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS,
            "maxerr": err,
            "ref_scale": scale,
        }
        results[name] = row
        print(
            f"# {name}: direct {ms_direct:.2f}ms ({row['direct_pct']:.0f}%) | "
            f"pallas {ms_pallas:.2f}ms ({row['pallas_pct']:.0f}%) | "
            f"err {err:.3f}/{scale:.1f}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
