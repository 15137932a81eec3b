"""Jitted training/eval steps for both models.

One device program per optimizer step: batch assembly (channel stacking,
normalization), label-heatmap generation, sample mixup, forward, loss,
backward, and the optimizer update all fuse under a single ``jit``. Under a
data-parallel sharding the gradient all-reduce and the global BatchNorm
statistics are inserted by XLA automatically (see parallel/mesh.py).

Reference behavior mirrored:
- TrackNet: optional sample mixup with per-sample Beta(alpha, alpha) lambda
  (reference: train.py:19-40), WBCE loss (train.py:93).
- InpaintNet: Bernoulli(mask_ratio) random mask AND-ed with GT visibility,
  masked coords zeroed before the forward pass, MSE on masked positions
  only, grad-norm clip 1.0 (reference: train.py:147-166).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.heatmap import make_heatmaps
from ..ops.losses import masked_mse, wbce, wbce_from_logits
from ..ops.preprocess import window_channels


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def _blend_slots(frames: jax.Array, pair: jax.Array, pix_w: jax.Array) -> jax.Array:
    """Frame-mixup pixel blending on device.

    frames (B, L, h, w, c); pair (B, L, 2) indices (ja, jb);
    out[b, l] = w * frames[b, ja] + (1-w) * frames[b, jb].
    """
    idx_a = pair[..., 0][..., None, None, None]
    idx_b = pair[..., 1][..., None, None, None]
    fa = jnp.take_along_axis(frames, idx_a, axis=1)
    fb = jnp.take_along_axis(frames, idx_b, axis=1)
    w = pix_w[..., None, None, None]
    return fa * w + fb * (1.0 - w)


def assemble_tracknet_inputs(batch: Dict[str, jax.Array], bg_mode: str) -> jax.Array:
    """Device-side input assembly: stack channels (+ frame-mixup pixel
    blending, + segmented-batch window expansion). Returns x (B,H,W,C)
    f32 in [0,1]."""
    rgb = batch.get("rgb")
    diff = batch.get("diff")
    median = batch.get("median")

    if "res_idx" in batch:
        # Device-resident split frames (ResidentHeatmapLoader): the batch
        # carries only (B, L) flat frame indices; pixels never leave HBM.
        idx = batch["res_idx"]
        if "res_rgb_buf" in batch:
            rgb = jnp.take(batch["res_rgb_buf"], idx, axis=0)
        if "res_diff_buf" in batch:
            diff = jnp.take(batch["res_diff_buf"], idx, axis=0)
        if "res_median_buf" in batch:
            median = jnp.take(batch["res_median_buf"], batch["res_median_idx"], axis=0)

    if "seg_rgb" in batch or "seg_diff" in batch:
        # Segmented batches: (n_seg, seg+L-1, h, w, c) unique frames ->
        # (B, L, h, w, c) overlapping windows by device gather.
        from ..ops.preprocess import gather_windows

        L = batch["cxcy"].shape[1]

        def expand(segs):
            n_seg, span = segs.shape[0], segs.shape[1]
            seg = span - L + 1
            wins = jax.vmap(
                lambda f: gather_windows(f, jnp.arange(seg), L)
            )(segs.astype(jnp.float32))
            return wins.reshape((n_seg * seg, L) + segs.shape[2:])

        if "seg_rgb" in batch:
            rgb = expand(batch["seg_rgb"])
        if "seg_diff" in batch:
            diff = expand(batch["seg_diff"])
        if median is not None:
            seg_n = (batch.get("seg_rgb", batch.get("seg_diff"))).shape[1] - L + 1
            median = jnp.repeat(median.astype(jnp.float32), seg_n, axis=0)

    if rgb is not None:
        rgb = rgb.astype(jnp.float32)
    if diff is not None:
        diff = diff.astype(jnp.float32)
    if median is not None:
        median = median.astype(jnp.float32)

    if "mix_pair" in batch:
        pair = batch["mix_pair"]
        pix_w = batch["mix_pix_w"].astype(jnp.float32)
        if rgb is not None:
            rgb = _blend_slots(rgb, pair, pix_w)
        if diff is not None:
            diff = _blend_slots(diff, pair, pix_w)
    return window_channels(rgb, diff, median, bg_mode)


def assemble_tracknet_labels(batch: Dict[str, jax.Array], h: int, w: int) -> jax.Array:
    """Materialized label heatmaps y (B, h, w, L) (XLA path)."""
    if "mix_pair" in batch:
        centers = batch["mix_centers"]  # (B, L, 2, 2)
        hm_w = batch["mix_hm_w"].astype(jnp.float32)[..., None, None]
        map_a = make_heatmaps(centers[..., 0, 0], centers[..., 0, 1], h, w)
        map_b = make_heatmaps(centers[..., 1, 0], centers[..., 1, 1], h, w)
        maps = map_a * hm_w + map_b * (1.0 - hm_w)
    else:
        cxcy = batch["cxcy"]
        maps = make_heatmaps(cxcy[..., 0], cxcy[..., 1], h, w)  # (B, L, h, w)
    return jnp.moveaxis(maps, 1, -1)  # (B, h, w, L)


def assemble_tracknet_batch(batch: Dict[str, jax.Array], bg_mode: str):
    """Input + materialized-label assembly (XLA path; the Pallas loss path
    skips the label tensor entirely)."""
    x = assemble_tracknet_inputs(batch, bg_mode)
    h, w = x.shape[-3:-1]
    return x, assemble_tracknet_labels(batch, h, w)


def sample_mixup_inputs(rng, x, alpha: float):
    """Per-sample Beta(alpha, alpha) mixup of the inputs; returns the
    (perm, lam) needed to mix the targets the same way
    (reference: train.py:19-40)."""
    B = x.shape[0]
    r_lam, r_perm = jax.random.split(rng)
    lam = jnp.maximum(
        (l := jax.random.beta(r_lam, alpha, alpha, (B,))), 1.0 - l
    )
    perm = jax.random.permutation(r_perm, B)
    lx = lam.reshape((B,) + (1,) * (x.ndim - 1))
    return x * lx + x[perm] * (1.0 - lx), perm, lam


def sample_mixup(rng, x, y, alpha: float):
    """Input+target mixup (XLA path)."""
    x_mix, perm, lam = sample_mixup_inputs(rng, x, alpha)
    ly = lam.reshape((y.shape[0],) + (1,) * (y.ndim - 1))
    return x_mix, y * ly + y[perm] * (1.0 - ly)


def make_tracknet_train_step(
    tx, bg_mode: str, alpha: float, pallas_loss: Optional[bool] = None,
    fast_bn: bool = False, dtype=jnp.bfloat16,
    remat_layers: bool = False, split_up_entry: bool = False,
    s2d_first: bool = False,
):
    """Jitted TrackNet train step.

    The forward is the explicit-lax ``tracknet_train_forward`` (the flax
    module is only the parameter-shape/init definition - unlike the
    InpaintNet step, no module object is needed here).

    With ``pallas_loss`` (default: on TPU backends) the WBCE is computed
    by the fused virtual-label Pallas kernel (ops/pallas_wbce.py) - the
    (B, H, W, L) label tensor never exists. Falls back to the XLA
    composition on other backends, when both mixup modes are active at
    once, or when H is not a multiple of the kernel's row tile.
    """
    from ..models.fused_forward import tracknet_train_forward
    from ..ops import pallas_wbce as pw

    if pallas_loss is None:
        pallas_loss = jax.default_backend() == "tpu"

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, jax.Array]:
        frame_mix = "mix_pair" in batch
        x = assemble_tracknet_inputs(batch, bg_mode)
        h, w = x.shape[-3:-1]
        use_pallas = (
            pallas_loss and not (frame_mix and alpha > 0) and h % pw._ROW_TILE == 0
        )

        perm = lam = None
        if alpha > 0:
            x, perm, lam = sample_mixup_inputs(rng, x, alpha)

        if use_pallas:
            if frame_mix:
                targets = pw.pack_frame_mixup_targets(
                    batch["mix_centers"], batch["mix_hm_w"]
                )
            elif alpha > 0:
                targets = pw.pack_mixup_targets(batch["cxcy"], perm, lam)
            else:
                targets = pw.pack_plain_targets(batch["cxcy"])
        else:
            y = assemble_tracknet_labels(batch, h, w)
            if alpha > 0:
                ly = lam.reshape((y.shape[0],) + (1,) * (y.ndim - 1))
                y = y * ly + y[perm] * (1.0 - ly)

        def loss_fn(params):
            logits, new_stats = tracknet_train_forward(
                params, state.batch_stats, x, train=True, fast_bn=fast_bn,
                dtype=dtype, remat_layers=remat_layers,
                split_up_entry=split_up_entry, s2d_first=s2d_first,
            )
            if use_pallas:
                return pw.wbce_disk_loss(logits, *targets), new_stats
            return wbce_from_logits(logits, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            loss,
        )

    return step


def make_tracknet_eval_step(bg_mode: str):
    """Eval forward: returns (loss, probs) without touching batch stats."""
    from ..models.fused_forward import tracknet_train_forward

    @jax.jit
    def step(state: TrainState, batch):
        x, y = assemble_tracknet_batch(batch, bg_mode)
        logits, _ = tracknet_train_forward(
            state.params, state.batch_stats, x, train=False
        )
        probs = jax.nn.sigmoid(logits)
        loss = wbce(probs, y)
        return loss, probs

    return step


def make_inpaintnet_train_step(model, tx, mask_ratio: float):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, jax.Array]:
        coor_pred = batch["coor_pred"]
        coor_gt = batch["coor"]
        vis_gt = batch["vis"]  # (B, L, 1)
        mask = jax.random.bernoulli(rng, mask_ratio, vis_gt.shape).astype(
            jnp.float32
        )
        inpaint_mask = (vis_gt > 0).astype(jnp.float32) * mask
        coor_in = coor_pred * (1.0 - inpaint_mask)

        def loss_fn(params):
            refine = model.apply({"params": params}, coor_in, inpaint_mask)
            return masked_mse(refine, coor_gt, inpaint_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, state.batch_stats, new_opt, state.step + 1),
            loss,
        )

    return step


def make_inpaintnet_eval_step(model):
    """Eval forward with composite + COOR_TH threshold
    (reference: test.py:396-408)."""
    from ..config import COOR_TH

    @jax.jit
    def step(state: TrainState, batch):
        coor_pred = batch["coor_pred"]
        coor_gt = batch["coor"]
        inpaint_mask = batch["inpaint_mask"]
        out = model.apply({"params": state.params}, coor_pred, inpaint_mask)
        coor_inpaint = out * inpaint_mask + coor_pred * (1.0 - inpaint_mask)
        loss = masked_mse(coor_inpaint, coor_gt, inpaint_mask)
        th = (coor_inpaint[..., 0] < COOR_TH) & (coor_inpaint[..., 1] < COOR_TH)
        coor_inpaint = jnp.where(th[..., None], 0.0, coor_inpaint)
        return loss, coor_inpaint

    return step
