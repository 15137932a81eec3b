#!/usr/bin/env python
"""Probe: decompose the BN+ReLU toll and the pool/upsample layout costs.

probe_layer_budget.py measured the toll of (batch-stats + normalize +
ReLU) around each conv but not WHERE it goes; this probe times the
pieces in isolation at the top-resolution 64-channel shape (the U-Net's
dominant activation, 24x288x512x64 bf16 = 453 MB) and pits XLA
formulations against Pallas kernels:

  stats_xla      jnp mean/mean-of-squares over (N,H,W) (f32 upcast)
  norm_xla       y * inv + shift, ReLU (bf16, constants given)
  chain_xla      stats + norm (the production fast_bn layer epilogue)
  stats_pl       one-pass Pallas sum/sumsq accumulation
  norm_pl        one-pass Pallas normalize+ReLU
  pool_rw        lax.reduce_window 2x2 max (production)
  pool_rs        reshape-split max (x.reshape(n,h/2,2,w/2,2,c).max((2,4)))
  pool_pl        Pallas row-pair max kernel
  up2x_xla       broadcast_to+reshape nearest-2x (production _up2x)
  up2x_pl        Pallas row-duplicating upsample

Each timed form runs fwd only and fwd+bwd (via jax.vjp with a fixed
cotangent) with output-feedback chaining like probe_layer_budget (so XLA
cannot CSE the rep chain); completion forced by a scalar fetch.
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
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, C = args.batch, 288, 512, 64
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    inv = jnp.asarray(rng.standard_normal((C,)) * 0.1 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    results = {"batch": N, "shape": [N, H, W, C]}

    def timed(jb, *xs):
        jb(*xs).item()
        ts = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            jb(*xs).item()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / args.reps

    def fwd_body(fn):
        def body(x):
            acc = jnp.float32(0)
            for _ in range(args.reps):
                out = fn(x)
                leaf = out[0] if isinstance(out, tuple) else out
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
                x = x + (1e-6 * acc).astype(x.dtype)
            return acc
        return jax.jit(body)

    def fb_body(fn):
        def one(x):
            out = fn(x)
            leaf = out[0] if isinstance(out, tuple) else out
            return jnp.sum(leaf.astype(jnp.float32) * leaf.astype(jnp.float32)) * 1e-9

        g = jax.value_and_grad(one)

        def body(x):
            acc = jnp.float32(0)
            for _ in range(args.reps):
                v, dx = g(x)
                x = x + (1e-5 * dx).astype(x.dtype)
                acc = acc + v
            return acc
        return jax.jit(body)

    def report(name, fn, x, fb=True):
        row = {}
        row["f_ms"] = timed(fwd_body(fn), x) * 1e3
        if fb:
            row["fb_ms"] = timed(fb_body(fn), x) * 1e3
        results[name] = row
        print(f"# {name}: f {row['f_ms']:.2f} ms"
              + (f", fb {row['fb_ms']:.2f} ms" if fb else ""), flush=True)

    # ---- XLA formulations -------------------------------------------------
    def stats_xla(x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        v = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(m), 0.0)
        return m + v  # tiny; forces both

    def norm_xla(x):
        z = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return jnp.maximum(z, 0.0)

    def chain_xla(x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        v = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(m), 0.0)
        iv = lax.rsqrt(v + 1e-5) * inv
        z = x * iv.astype(x.dtype) + (shift - m * iv).astype(x.dtype)
        return jnp.maximum(z, 0.0)

    report("stats_xla", stats_xla, y)
    report("norm_xla", norm_xla, y)
    report("chain_xla", chain_xla, y)

    # ---- Pallas stats: one-pass sum + sumsq -------------------------------
    ROWS = N * H * W  # flat rows over C lanes
    TILE = 2048  # rows per grid step: TILE*C*2B = 256 KB block

    def stats_kernel(x_ref, s_ref, q_ref):
        i = pl.program_id(0)
        xf = x_ref[:].astype(jnp.float32)
        s = jnp.sum(xf, axis=0, keepdims=True)
        q = jnp.sum(xf * xf, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            s_ref[:] = s
            q_ref[:] = q

        @pl.when(i > 0)
        def _():
            s_ref[:] = s_ref[:] + s
            q_ref[:] = q_ref[:] + q

    def stats_pl(x):
        x2 = x.reshape(ROWS, C)
        s, q = pl.pallas_call(
            stats_kernel,
            grid=(ROWS // TILE,),
            in_specs=[pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
        )(x2)
        m = s[0] / ROWS
        v = jnp.maximum(q[0] / ROWS - m * m, 0.0)
        return m + v

    report("stats_pl", stats_pl, y, fb=False)

    # ---- Pallas normalize + ReLU ------------------------------------------
    def norm_kernel(x_ref, iv_ref, sh_ref, o_ref):
        z = x_ref[:] * iv_ref[0, :].astype(x_ref.dtype) + sh_ref[0, :].astype(
            x_ref.dtype
        )
        o_ref[:] = jnp.maximum(z, 0.0)

    def norm_pl(x):
        x2 = x.reshape(ROWS, C)
        z = pl.pallas_call(
            norm_kernel,
            grid=(ROWS // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, C), jnp.bfloat16),
        )(x2, inv.reshape(1, C), shift.reshape(1, C))
        return z

    report("norm_pl", norm_pl, y, fb=False)

    # ---- pooling -----------------------------------------------------------
    def pool_rw(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                                 "VALID")

    def pool_rs(x):
        n, h, w, c = x.shape
        return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))

    report("pool_rw", pool_rw, y)
    report("pool_rs", pool_rs, y)

    def pool_kernel(x_ref, o_ref):
        # block: (2, W, C) input rows -> (1, W//2, C) output row
        a = x_ref[0]
        b = x_ref[1]
        m = jnp.maximum(a, b)  # (W, C) vertical max
        m2 = m.reshape(W // 2, 2, C)
        o_ref[0] = jnp.maximum(m2[:, 0, :], m2[:, 1, :])

    def pool_pl(x):
        x3 = x.reshape(N * H, W, C)
        out = pl.pallas_call(
            pool_kernel,
            grid=(N * H // 2,),
            in_specs=[pl.BlockSpec((2, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, W // 2, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N * H // 2, W // 2, C), jnp.bfloat16),
        )(x3)
        return out

    report("pool_pl", pool_pl, y, fb=False)

    # ---- upsample (at the pre-up3 shape: 144x256x128 -> 288x512) ----------
    xs = jnp.asarray(rng.standard_normal((N, 144, 256, 128)), jnp.bfloat16)

    def up2x_xla(x):
        n, h, w, c = x.shape
        xb = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        return xb.reshape(n, h * 2, w * 2, c)

    report("up2x_xla", up2x_xla, xs)

    def up_kernel(x_ref, o_ref):
        # block: (1, w, c) -> (2, 2w, c): duplicate row and columns
        row = x_ref[0]  # (w, c)
        wide = pltpu.repeat(row, repeats=2, axis=0)  # hmm: repeats interleave?
        o_ref[0] = wide
        o_ref[1] = wide

    def up2x_pl(x):
        n, h, w, c = x.shape
        x3 = x.reshape(n * h, w, c)
        out = pl.pallas_call(
            up_kernel,
            grid=(n * h,),
            in_specs=[pl.BlockSpec((1, w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, 2 * w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * n * h, 2 * w, c), jnp.bfloat16),
        )(x3)
        return out

    try:
        # verify duplication semantics before timing (repeat may tile
        # rather than interleave; fall back to manual interleave if wrong)
        small = jnp.arange(8, dtype=jnp.bfloat16).reshape(1, 2, 2, 2)
        ref = up2x_xla(small)
        got = up2x_pl(small.astype(jnp.bfloat16))
        ok = bool(jnp.all(ref.reshape(-1) == got.reshape(-1)))
        print(f"# up2x_pl parity: {ok}", flush=True)
        if ok:
            report("up2x_pl", up2x_pl, xs, fb=False)
    except Exception as e:
        print(f"# up2x_pl failed: {type(e).__name__}: {e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
