#!/usr/bin/env python
"""Wall-clock of the three decode rules at eval batch shape (VERDICT r4
item 7's cost bar: device exact decode within ~10% of the default
decoder, vs the host path's full-heatmap fetch).

Times, on (B, H, W) = (128, 288, 512) sparse-peak heatmaps resident on
device (one val batch of 16 windows x L=8 frames):

  peak    decode_heatmaps        (production kernel) + packed fetch
  exact   decode_heatmaps_exact  (device largest-bbox-area) + packed fetch
  host    full-heatmap D2H fetch + decode_heatmaps_host (native CCL/scipy)

Medians over --passes timed passes after an untimed compile/warm pass.

Usage: python tools/probe_exact_decode_cost.py [--frames 128] [--passes 5]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from tracknetv3_tpu.ops.detect import (
        decode_heatmaps,
        decode_heatmaps_exact,
        decode_heatmaps_host,
    )

    B, H, W = args.frames, 288, 512
    rng = np.random.default_rng(0)
    maps = np.zeros((B, H, W), np.float32)
    for i in range(B):
        # 1-3 blobs: the ensembled-output regime (mostly single-blob,
        # occasional ghost) plus a near-threshold noise floor
        for _ in range(int(rng.integers(1, 4))):
            cy = int(rng.integers(8, H - 8))
            cx = int(rng.integers(8, W - 8))
            r, c = np.ogrid[:H, :W]
            blob = ((r - cy) ** 2 + (c - cx) ** 2) <= int(rng.integers(4, 25))
            maps[i][blob] = float(rng.uniform(0.55, 1.0))
        maps[i] += rng.uniform(0, 0.45, (H, W)).astype(np.float32) * (
            maps[i] == 0
        )
    dev = jnp.asarray(maps)

    def pack(d):
        return jnp.concatenate(
            [
                d["cx"][:, None].astype(jnp.float32),
                d["cy"][:, None].astype(jnp.float32),
                d["conf"][:, None].astype(jnp.float32),
                d["bbox"].astype(jnp.float32),
            ],
            axis=1,
        )

    peak_fn = jax.jit(lambda p: pack(decode_heatmaps(p)))
    exact_fn = jax.jit(lambda p: pack(decode_heatmaps_exact(p)))

    def timed(f):
        f()  # compile/warm, untimed
        ts = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t_peak = timed(lambda: np.asarray(peak_fn(dev)))
    t_exact = timed(lambda: np.asarray(exact_fn(dev)))
    t_host = timed(lambda: decode_heatmaps_host(np.asarray(dev)))

    # sanity: the two exact rules agree on this corpus
    a = decode_heatmaps_exact(dev)
    b = decode_heatmaps_host(np.asarray(dev))
    agree = bool(
        (np.asarray(a["cx"]) == b["cx"]).all()
        and (np.asarray(a["cy"]) == b["cy"]).all()
    )

    print(
        f"# {B} frames {H}x{W}: peak {t_peak * 1e3:.1f} ms | "
        f"exact-device {t_exact * 1e3:.1f} ms "
        f"({t_exact / t_peak:.2f}x peak) | "
        f"host fetch+CCL {t_host * 1e3:.1f} ms "
        f"({t_host / t_peak:.1f}x peak); exact==host: {agree}",
        file=sys.stderr,
    )
    print(json.dumps({
        "frames": B,
        "peak_ms": round(t_peak * 1e3, 2),
        "exact_device_ms": round(t_exact * 1e3, 2),
        "host_ms": round(t_host * 1e3, 2),
        "exact_over_peak": round(t_exact / t_peak, 3),
        "host_over_peak": round(t_host / t_peak, 3),
        "exact_matches_host": agree,
    }))


if __name__ == "__main__":
    main()
