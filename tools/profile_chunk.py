#!/usr/bin/env python
"""Per-stage timing of one inference chunk (VERDICT r1 item: where do the
~3 ms/frame go?).

Decomposes the resident overlap step (resize+gather -> U-Net forward ->
temporal ensemble -> decode) into separately-jitted stages and times each
with a forced fetch. Each stage is wrapped to return only a tiny reduction
(on this runtime ``block_until_ready`` does not actually block, and
fetching a large output rides the degraded ~36 MB/s D2H path, so the only
honest timing is compute-everything-return-a-scalar; see PROFILE.md).

Results are summarized in PROFILE.md; run with a real chip.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=3):
    """Min-of-n wall time of fn(*args) with a forced (small) fetch."""
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf)
        ts.append(time.time() - t0)
    return min(ts), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import get_checkpoint, make_frames
    from tracknetv3_tpu.inference import TrackNetPredictor
    from tracknetv3_tpu.models.fused_forward import tracknet_fused_forward
    from tracknetv3_tpu.ops.detect import decode_heatmaps
    from tracknetv3_tpu.ops.ensemble import ensemble_chunk

    B = args.batch_size
    ckpt = get_checkpoint("/tmp", bg_mode="concat")
    p = TrackNetPredictor(ckpt, eval_mode="weight", batch_size=B)
    L = p.seq_len

    frames = make_frames(args.frames)
    t0 = time.time()
    raw = p.upload_frames(frames)
    # block_until_ready lies on this relay (see module docstring); a tiny
    # fetch is the only honest completion barrier for the transfer
    np.asarray(raw[0, 0, 0, 0])
    print(f"upload {frames.nbytes/1e6:.0f} MB: {time.time()-t0:.2f}s")

    all_dev, meta = p.build_resident(raw, frames.shape[0])
    del raw
    median = p.median_of_resident(all_dev, meta["T"])
    med_dev = jnp.asarray(median, jnp.float32)

    # RPC floor: trivial program round trip
    tiny = jax.jit(lambda x: x + 1)
    xs = jnp.zeros((8,), jnp.float32)
    tiny(xs)  # compile
    t, ts = timed(tiny, xs, n=5)
    print(f"dispatch+fetch floor: {t*1000:.1f} ms  {['%.1f' % (x*1000) for x in ts]}")

    nwin = B + L - 1
    S_dev = jnp.int32(max(meta["T"] - L + 1, 1))
    t0j = jnp.int32(B * 2)

    # Stage A: full resident step (output already tiny: (B, 3))
    p._overlap_step_resident(all_dev, med_dev, t0j, S_dev)  # compile
    t, ts = timed(p._overlap_step_resident, all_dev, med_dev, t0j, S_dev)
    print(f"full chunk (B={B}): {t*1000:.1f} ms  {['%.0f' % (x*1000) for x in ts]}")

    # Stage B: preprocessing only (slice + resize + gather + stack)
    @jax.jit
    def preproc_only(all_frames, med, t0):
        chunk = jax.lax.dynamic_slice_in_dim(all_frames, t0, B + 2 * L - 2, axis=0)
        x = p._preproc(chunk, med, jnp.arange(nwin))
        return jnp.mean(x)  # tiny fetch; forces the whole stage

    preproc_only(all_dev, med_dev, t0j)
    t, ts = timed(preproc_only, all_dev, med_dev, t0j)
    print(f"preproc only: {t*1000:.1f} ms  {['%.0f' % (x_*1000) for x_ in ts]}")

    # Materialize a model input for the downstream stages.
    @jax.jit
    def preproc_full(all_frames, med, t0):
        chunk = jax.lax.dynamic_slice_in_dim(all_frames, t0, B + 2 * L - 2, axis=0)
        return p._preproc(chunk, med, jnp.arange(nwin))

    x = preproc_full(all_dev, med_dev, t0j)

    # Stage C: forward only (from prebuilt model input)
    fwd = jax.jit(lambda xx: jnp.mean(tracknet_fused_forward(p._folded, xx)))
    fwd(x)
    t, ts = timed(fwd, x)
    print(f"forward only ({nwin} win): {t*1000:.1f} ms  {['%.0f' % (x_*1000) for x_ in ts]}")

    wins = jnp.moveaxis(jax.jit(lambda xx: tracknet_fused_forward(p._folded, xx))(x), -1, 1)

    # Stage D: ensemble only
    ens = jax.jit(lambda w, t0: jnp.mean(ensemble_chunk(w, p._weights, t0, S_dev)))
    ens(wins, t0j)
    t, ts = timed(ens, wins, t0j)
    print(f"ensemble only: {t*1000:.1f} ms  {['%.0f' % (x_*1000) for x_ in ts]}")

    fr = jax.jit(lambda w, t0: ensemble_chunk(w, p._weights, t0, S_dev))(wins, t0j)

    # Stage E: decode only (output already tiny)
    dec = jax.jit(lambda f: decode_heatmaps(f)["cx"])
    dec(fr)
    t, ts = timed(dec, fr, n=3)
    print(f"decode only (B={B}): {t*1000:.1f} ms  {['%.0f' % (x_*1000) for x_ in ts]}")

    # Stage F: forward at double batch for batch-scaling
    x2 = jnp.concatenate([x, x], axis=0)
    fwd(x2)
    t, ts = timed(fwd, x2)
    print(f"forward only ({2*nwin} win): {t*1000:.1f} ms  {['%.0f' % (x_*1000) for x_ in ts]}")


if __name__ == "__main__":
    main()
