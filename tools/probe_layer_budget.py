#!/usr/bin/env python
"""Probe: per-layer cost of the TrackNet train step's conv shapes.

METHODOLOGY (round-4 correction). Two artifacts invalidated the first
version of this probe (and the per-op sections of earlier PROFILE
notes):

1. **DCE**: feeding only ``out.ravel()[0]`` back into the rep chain lets
   XLA slice the producer - a "conv" rep chain that only needs one
   output element compiles to (almost) nothing, and the measured time is
   pure dispatch+fetch overhead. Every rep here therefore feeds the FULL
   output tensor forward (next conv consumes it, or the full gradient is
   added back to the inputs).
2. **Relay fetch overhead**: on this runtime a result fetch costs ~20 ms
   round-trip and ``block_until_ready`` does not actually block, so any
   per-pass timing carries a large constant. All numbers here are SLOPES
   between a short and a long chain ((T_long - T_short) / (k_long -
   k_short)), which cancels the constant exactly.

Measured per layer shape (batch 24 bf16, the bench --train config):
  f_ms    one conv forward (chain of same-shape convs; for Cin != Cout
          shapes, a (Cout -> Cin) partner conv closes the cycle and its
          cost - measured separately where possible - is reported too)
  fb_ms   one value_and_grad(sum(conv^2)) step: fwd + dX + dY convs with
          FULL dx/dw fed back (no DCE)
  Also: the conv+BN+ReLU composed-chain toll (spoiler: ~0 - XLA fuses
  the train-BN epilogue into the composed program; the round-3 toll
  numbers were fetch-overhead artifacts), pool and upsample+concat costs.
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
    ap.add_argument("--k-short", type=int, default=4)
    ap.add_argument("--k-long", type=int, default=12)
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    N = args.batch
    dn = ("NHWC", "HWIO", "NHWC")
    peak = 197e12  # v5e bf16
    rng = np.random.default_rng(0)
    results = {"batch": N}

    def fetch(x):
        return np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)

    def med_total(f, *a):
        fetch(f(*a))
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
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)

    # (name, H, W, Cin, Cout, multiplicity in the net)
    layers = [
        ("d1c1", 288, 512, 24, 64, 1),
        ("d1c2", 288, 512, 64, 64, 2),   # + u3c2
        ("d2c1", 144, 256, 64, 128, 1),
        ("d2c2", 144, 256, 128, 128, 2),  # + u2c2
        ("d3c1", 72, 128, 128, 256, 1),
        ("d3c2", 72, 128, 256, 256, 5),  # d3c2,d3c3,u1c2,u1c3 + 1 spare
        ("bnc1", 36, 64, 256, 512, 1),
        ("bnc2", 36, 64, 512, 512, 2),
        ("u1c1", 72, 128, 768, 256, 1),
        ("u2c1", 144, 256, 384, 128, 1),
        ("u3c1", 288, 512, 192, 64, 1),
    ]

    tot = {"f": 0.0, "fb": 0.0}
    for name, H, W, Cin, Cout, mult in layers:
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)
        flops = 2.0 * N * H * W * 9 * Cin * Cout
        square = Cin == Cout

        if square:
            def mk_f(k, _w=w):
                @jax.jit
                def f(x):
                    for _ in range(k):
                        x = conv(x, _w)
                    return x
                return f

            t_f = slope(mk_f, x)
        else:
            # close the cycle with a Cout->Cin partner; per-pair slope,
            # then subtract the partner's own cost estimated at equal
            # FLOPs share (reported as pair time; the table uses /2-by-
            # flops split, honest enough for ranking)
            wb = jnp.asarray(
                rng.standard_normal((3, 3, Cout, Cin)) * 0.02, jnp.bfloat16)

            def mk_f(k, _w=w, _wb=wb):
                @jax.jit
                def f(x):
                    for _ in range(k):
                        x = conv(conv(x, _w), _wb)
                    return x
                return f

            pair = slope(mk_f, x)
            # both directions have identical FLOPs; split evenly
            t_f = pair / 2.0

        def mk_fb(k, _w=w):
            def one(x, w):
                y = conv(x, w)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

            g = jax.value_and_grad(one, argnums=(0, 1))

            @jax.jit
            def f(x):
                w = _w
                for _ in range(k):
                    v, (dx, dw) = g(x, w)
                    x = x + (1e-5 * dx).astype(x.dtype)
                    w = w + (1e-5 * dw).astype(w.dtype)
                return x
            return f

        t_fb = slope(mk_fb, x)
        row = {
            "f_ms": t_f * 1e3,
            "f_pct": flops / t_f / peak * 100,
            "fb_ms": t_fb * 1e3,
            "fb_pct": 3 * flops / t_fb / peak * 100,
            "mult": mult,
        }
        results[name] = row
        tot["f"] += t_f * 1e3 * mult
        tot["fb"] += t_fb * 1e3 * mult
        print(
            f"# {name} {H}x{W} {Cin}->{Cout} x{mult}: "
            f"f {row['f_ms']:.2f}ms ({row['f_pct']:.0f}%) | "
            f"fb {row['fb_ms']:.2f}ms ({row['fb_pct']:.0f}%)",
            flush=True,
        )
    results["totals_ms"] = tot
    print(f"# TOTALS (x mult): f {tot['f']:.1f} ms, fb {tot['fb']:.1f} ms",
          flush=True)

    # ---- composed BN toll: conv chain vs conv+train-BN+ReLU chain ----------
    x = jnp.asarray(rng.standard_normal((N, 288, 512, 64)), jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.02, jnp.bfloat16)

    def mk_plain(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = conv(x, w64)
            return x
        return f

    def mk_bn(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                y = conv(x, w64)
                yf = y.astype(jnp.float32)
                m = jnp.mean(yf, axis=(0, 1, 2))
                v = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2)) - m * m, 0.0)
                iv = lax.rsqrt(v + 1e-5)
                x = jnp.maximum(
                    y * iv.astype(y.dtype) + (-m * iv).astype(y.dtype), 0.0)
            return x
        return f

    t_plain = slope(mk_plain, x)
    t_bn = slope(mk_bn, x)
    results["bn_toll_composed_ms"] = (t_bn - t_plain) * 1e3
    print(
        f"# composed 288x512c64: conv {t_plain*1e3:.2f} ms, conv+BN+ReLU "
        f"{t_bn*1e3:.2f} ms -> toll {(t_bn-t_plain)*1e3:.2f} ms",
        flush=True,
    )

    # ---- pool + upsample-concat (chained, full feedback) -------------------
    def mk_pool(k):
        @jax.jit
        def f(x):
            acc = x
            for _ in range(k):
                p = lax.reduce_window(
                    acc, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                # re-expand so the chain keeps shape (adds an up2x cost)
                n, h, w, c = p.shape
                up = jnp.broadcast_to(
                    p[:, :, None, :, None, :], (n, h, 2, w, 2, c)
                ).reshape(n, 2 * h, 2 * w, c)
                acc = acc + up * jnp.bfloat16(1e-3)
            return acc
        return f

    t_poolup = slope(mk_pool, x)
    results["pool_plus_up2x_288x512c64_ms"] = t_poolup * 1e3
    print(f"# pool+up2x chain 288x512c64: {t_poolup*1e3:.2f} ms/iter "
          "(pool fwd + nearest-up2x + add)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
