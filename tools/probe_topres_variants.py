#!/usr/bin/env python
"""Probe: alternative formulations for the three slow 288x512 convs.

probe_layer_budget (corrected methodology) shows every TrackNet conv
running at 64-105% of v5e peak EXCEPT the three top-resolution layers:

    d1c1  288x512  24->64   12% fwd / 12% fb
    d1c2  288x512  64->64   36% / 33%   (x2: also u3c2)
    u3c1  288x512 192->64   46% / 50%

Together ~60 ms of the 127.6 ms per-step conv total. Candidate
reformulations, all mathematically exact (same outputs up to bf16
rounding):

  nchw       same conv, NCHW dimension_numbers (C in sublanes, W in lanes)
  f32        f32 activations (MXU f32 path, half peak but maybe better
             utilization at these shapes)
  s2d3x3     space-to-depth: x packed to (H/2, W/2, 4*Cin), one 3x3 conv
             with a sparsity-padded kernel producing the packed output
             (H/2, W/2, 4*Cout). 4x the MACs at (hopefully) full MXU
             utilization; exact because every original 3x3 tap appears
             exactly once in the packed kernel.
  pair2x2    space-to-depth with TWO 2x2 convs (one per output row
             parity), 1.78x the MACs.
  cout128    zero-padded output channels 64->128 (lane-cap probe).

Timing: slope method (chained reps, full-tensor feedback, fetch-constant
cancelled) - see probe_layer_budget.py docstring for why.
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np


def pack_s2d(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel blocks ordered
    (a, b) = (0,0), (0,1), (1,0), (1,1) for original (2i+a, 2j+b)."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, (2, 4), (3, 4))  # (n, h2, w2, 2, 2, c)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def unpack_s2d(y, c):
    import jax.numpy as jnp

    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, c)
    y = jnp.moveaxis(y, (3, 4), (2, 4))  # (n, h2, 2, w2, 2, c)
    return y.reshape(n, h2 * 2, w2 * 2, c)


def s2d_kernel_3x3(w):
    """Original (3, 3, Cin, Cout) -> packed (3, 3, 4Cin, 4Cout).

    Packed output block (a, b) at packed position (I, J) is original
    output (2I+a, 2J+b); its original tap (di, dj) in {-1,0,1}^2 reads
    original pixel (2I+a+di, 2J+b+dj) = packed position
    (I + (a+di+2)//2 - 1 + ... ) -- computed below -- channel block
    ((a+di) % 2, (b+dj) % 2). The packed 3x3 window (offsets -1..1)
    covers original rows 2I-2 .. 2I+3, a superset of the needed
    2I+a-1 .. 2I+a+1, so every tap lands inside it; unused packed taps
    stay zero."""
    import numpy as onp

    w = onp.asarray(w, onp.float32)
    cin, cout = w.shape[2], w.shape[3]
    wp = onp.zeros((3, 3, 4 * cin, 4 * cout), onp.float32)
    for a in (0, 1):
        for b in (0, 1):
            ob = a * 2 + b  # output channel block
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    r, s = a + di, b + dj  # original offset from (2I, 2J)
                    pi, ia = divmod(r + 2, 2)
                    pi -= 1  # packed row offset in {-1, 0, 1}
                    pj, jb = divmod(s + 2, 2)
                    pj -= 1
                    ib = ia * 2 + jb  # input channel block
                    wp[pi + 1, pj + 1, ib * cin:(ib + 1) * cin,
                       ob * cout:(ob + 1) * cout] = w[di + 1, dj + 1]
    return wp


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
    peak = 197e12
    rng = np.random.default_rng(0)
    results = {"batch": N}

    def fetch(x):
        return np.asarray(x.ravel()[0])

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

    def conv(x, w, dn=("NHWC", "HWIO", "NHWC")):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    shapes = [("d1c1", 24, 64), ("d1c2", 64, 64), ("u3c1", 192, 64)]
    H, W = 288, 512

    for name, Cin, Cout in shapes:
        flops = 2.0 * N * H * W * 9 * Cin * Cout
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02,
                        jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, Cout, Cin)) * 0.02,
                         jnp.bfloat16)
        row = {}

        def mk_base(k):
            @jax.jit
            def f(x):
                for _ in range(k):
                    x = conv(conv(x, w), wb) if Cin != Cout else conv(x, w)
                return x
            return f

        pair = Cin != Cout
        t = slope(mk_base, x)
        t_base = t / (2 if pair else 1)
        row["base_ms"] = t_base * 1e3
        row["base_pct"] = flops / t_base / peak * 100

        # NCHW
        xc = jnp.moveaxis(x, -1, 1)
        wn = w  # HWIO stays; dims: NCHW io
        dn_nchw = ("NCHW", "HWIO", "NCHW")

        def mk_nchw(k):
            @jax.jit
            def f(xc):
                for _ in range(k):
                    y = conv(xc, w, dn_nchw)
                    xc = conv(y, wb, dn_nchw) if pair else y
                return xc
            return f

        try:
            t = slope(mk_nchw, xc) / (2 if pair else 1)
            row["nchw_ms"] = t * 1e3
            row["nchw_pct"] = flops / t / peak * 100
        except Exception as e:
            row["nchw_err"] = f"{type(e).__name__}"

        # f32
        xf = x.astype(jnp.float32)
        wf = w.astype(jnp.float32)
        wbf = wb.astype(jnp.float32)

        def mk_f32(k):
            @jax.jit
            def f(x):
                for _ in range(k):
                    y = conv(x, wf)
                    x = conv(y, wbf) if pair else y
                return x
            return f

        t = slope(mk_f32, xf) / (2 if pair else 1)
        row["f32_ms"] = t * 1e3
        row["f32_pct"] = flops / t / peak * 100

        # space-to-depth 3x3 (packed in AND out; chain stays packed)
        wp = jnp.asarray(s2d_kernel_3x3(np.asarray(w, np.float32)),
                         jnp.bfloat16)
        wpb = jnp.asarray(s2d_kernel_3x3(np.asarray(wb, np.float32)),
                          jnp.bfloat16)
        xp = pack_s2d(x)

        def mk_s2d(k):
            @jax.jit
            def f(xp):
                for _ in range(k):
                    y = conv(xp, wp)
                    xp = conv(y, wpb) if pair else y
                return xp
            return f

        t = slope(mk_s2d, xp) / (2 if pair else 1)
        row["s2d3x3_ms"] = t * 1e3
        row["s2d3x3_pct_useful"] = flops / t / peak * 100  # useful flops only

        # parity check of the s2d formulation (once, small batch)
        xs = jnp.asarray(rng.standard_normal((2, H, W, Cin)), jnp.bfloat16)
        ref = conv(xs, w)
        got = unpack_s2d(conv(pack_s2d(xs), wp), Cout)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        row["s2d3x3_maxerr"] = err

        # cout128: zero-pad output channels to 128 (lane-cap probe)
        if Cout == 64:
            w128 = jnp.concatenate([w, jnp.zeros_like(w)], axis=-1)
            wb128 = jnp.concatenate(
                [wb, jnp.zeros((3, 3, Cout, Cin), jnp.bfloat16)], axis=2)

            def mk_c128(k):
                @jax.jit
                def f(x):
                    for _ in range(k):
                        y = conv(x, w128)[..., :Cout]
                        x = conv(y, wb) if pair else y
                    return x
                return f

            t = slope(mk_c128, x)
            t = t - (t_base if pair else 0)  # subtract the partner conv
            row["cout128_ms"] = t * 1e3
            row["cout128_pct_useful"] = flops / t / peak * 100

        results[name] = row
        print(f"# {name}: " + " ".join(
            f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in row.items()), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
