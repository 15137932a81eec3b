"""Pallas TPU kernel: fused WBCE loss against *virtual* disk labels.

The training loss compares sigmoid heatmaps with binary-disk labels. The
straightforward composition materializes the (B, H, W, L) label tensor in
HBM, reads it back for the loss, and keeps sigmoid activations alive for
the backward pass. This kernel computes the label membership on the fly
from integer centers inside VMEM, fusing

    disk(centers) -> sigmoid -> clamped WBCE -> partial-sum reduction

into one pass over the logits (and the analytic gradient into one pass in
the backward kernel). Labels support the blended form

    y = w * disk(center_a) + (1 - w) * disk(center_b)

which covers plain training (a == b, w == 1), sample mixup (b = centers of
the permuted sample, w = lambda_b) and frame mixup (two carried centers,
w = lambda) - see training/steps.py.

Loss semantics match ops.losses.wbce_from_logits exactly (clamp to
[1e-7, 1] with zero gradient through the clamp, mean reduction); verified
by tests against the make_heatmaps + wbce composition, values and grads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SIGMA

_EPS = 1e-7
_ROW_TILE = 16  # rows per grid step: body temporaries must fit 16 MB VMEM


def _disk(cx, cy, rows, cols, sigma):
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    d2 = (rows - cyf) ** 2 + (cols - cxf) ** 2
    vis = jnp.logical_or(cxf != 0, cyf != 0).astype(jnp.float32)
    return (d2 <= sigma * sigma).astype(jnp.float32) * vis


def _membership(centers_ref, w_ref, b, L, l, row0, shape, sigma):
    """Blended disk membership y for a (TILE, W) block of sample b, ch l.

    centers_ref: SMEM (B, 4L) int32 laid out [cxa | cya | cxb | cyb];
    w_ref: SMEM (B, L) float32 blend weight of disk A.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    ya = _disk(centers_ref[b, l], centers_ref[b, L + l], rows, cols, sigma)
    yb = _disk(
        centers_ref[b, 2 * L + l], centers_ref[b, 3 * L + l], rows, cols, sigma
    )
    wa = w_ref[b, l]
    return ya * wa + yb * (1.0 - wa)


def _loss_terms(z, y):
    """Clamped WBCE per element from logits z and labels y (f32)."""
    p = jax.nn.sigmoid(z)
    log_p = jnp.maximum(jax.nn.log_sigmoid(z), jnp.float32(jnp.log(_EPS)))
    log_1mp = jnp.maximum(jax.nn.log_sigmoid(-z), jnp.float32(jnp.log(_EPS)))
    one_m_p = 1.0 - p
    return -(one_m_p * one_m_p * y * log_p + p * p * (1.0 - y) * log_1mp)


def _fwd_kernel(sigma, L, centers_ref, w_ref, z_ref, out_ref):
    b = pl.program_id(0)
    l = pl.program_id(1)
    row0 = pl.program_id(2) * _ROW_TILE
    z = z_ref[0, 0].astype(jnp.float32)  # (TILE, W)
    y = _membership(centers_ref, w_ref, b, L, l, row0, z.shape, sigma)
    s = jnp.sum(_loss_terms(z, y))
    rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    # Partial sum in one (8, 128) VMEM tile (TPU block tiling forbids
    # scalar output blocks); the caller sums everything.
    out_ref[0, 0, 0] = jnp.where((rr == 0) & (cc == 0), s, 0.0)


def _bwd_kernel(sigma, L, scale_ref, centers_ref, w_ref, z_ref, dz_ref):
    b = pl.program_id(0)
    l = pl.program_id(1)
    row0 = pl.program_id(2) * _ROW_TILE
    z = z_ref[0, 0].astype(jnp.float32)
    y = _membership(centers_ref, w_ref, b, L, l, row0, z.shape, sigma)
    p = jax.nn.sigmoid(z)
    one_m_p = 1.0 - p
    # Clamp masks: the log terms are constant once the clamp engages, so
    # their derivative contribution vanishes there. The masks must test
    # EXACTLY the condition the forward's maximum() uses (raw log-sigmoid
    # vs log eps) - testing p/1-p directly disagrees in the f32 tails.
    log_floor = jnp.float32(jnp.log(_EPS))
    raw_log_p = jax.nn.log_sigmoid(z)
    raw_log_1mp = jax.nn.log_sigmoid(-z)
    in_lo = (raw_log_p > log_floor).astype(jnp.float32)
    in_hi = (raw_log_1mp > log_floor).astype(jnp.float32)
    log_p = jnp.maximum(raw_log_p, log_floor)
    log_1mp = jnp.maximum(raw_log_1mp, log_floor)
    # dL/dz = dL/dp * p * (1 - p), expanded per label branch:
    dz = y * (
        2.0 * p * one_m_p * one_m_p * log_p - one_m_p * one_m_p * one_m_p * in_lo
    ) + (1.0 - y) * (-2.0 * p * p * one_m_p * log_1mp + p * p * p * in_hi)
    dz_ref[0, 0] = dz * scale_ref[0, 0]


def _grids(B, H, W, L):  # noqa: C901
    assert H % _ROW_TILE == 0, f"H={H} must be a multiple of {_ROW_TILE}"
    grid = (B, L, H // _ROW_TILE)
    z_spec = pl.BlockSpec(
        (1, 1, _ROW_TILE, W), lambda b, l, r: (b, l, r, 0), memory_space=pltpu.VMEM
    )
    # SMEM scalar tables must be whole-array blocks (TPU tiling rules);
    # kernels index them with program_id(0).
    centers_spec = pl.BlockSpec(
        (B, 4 * L), lambda b, l, r: (0, 0), memory_space=pltpu.SMEM
    )
    w_spec = pl.BlockSpec((B, L), lambda b, l, r: (0, 0), memory_space=pltpu.SMEM)
    return grid, z_spec, centers_spec, w_spec


def _flatten_targets(cxcy2, w):
    """(B, 2, 2, L) centers + (B, 1, L) weights -> SMEM-friendly layouts
    (B, 4L) int32 [cxa | cya | cxb | cyb] and (B, L) f32."""
    B, _, _, L = cxcy2.shape
    flat = jnp.concatenate(
        [cxcy2[:, 0, 0], cxcy2[:, 0, 1], cxcy2[:, 1, 0], cxcy2[:, 1, 1]], axis=-1
    ).astype(jnp.int32)
    return flat, w.reshape(B, L).astype(jnp.float32)


def _forward(logits, cxcy2, w, sigma, interpret):
    B, H, W, L = logits.shape
    grid, z_spec, centers_spec, w_spec = _grids(B, H, W, L)
    zt = jnp.moveaxis(logits.astype(jnp.float32), -1, 1)  # (B, L, H, W)
    centers, wf = _flatten_targets(cxcy2, w)
    sums = pl.pallas_call(
        partial(_fwd_kernel, float(sigma), L),
        grid=grid,
        in_specs=[centers_spec, w_spec, z_spec],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 8, 128), lambda b, l, r: (b, l, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, L, H // _ROW_TILE, 8, 128), jnp.float32
        ),
        interpret=interpret,
    )(centers, wf, zt)
    return jnp.sum(sums) / (B * H * W * L)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def wbce_disk_loss(logits, cxcy2, w, sigma=SIGMA, interpret=False):
    """Mean WBCE of ``logits`` vs blended virtual disk labels.

    Args:
        logits: (B, H, W, L) heatmap logits (H multiple of the row tile).
        cxcy2: (B, 2, 2, L) int32 centers, [:, 0] = (cx, cy) of disk A,
            [:, 1] = disk B. (0, 0) centers mean "no ball".
        w: (B, 1, L) float blend weight of disk A (1.0 = only A).
        sigma: disk radius.
        interpret: run the kernels in interpreter mode (CPU testing).
    """
    return _forward(logits, cxcy2, w, sigma, interpret)


def _vjp_fwd(logits, cxcy2, w, sigma, interpret):
    return _forward(logits, cxcy2, w, sigma, interpret), (logits, cxcy2, w)


def _vjp_bwd(sigma, interpret, res, g):
    logits, cxcy2, w = res
    B, H, W, L = logits.shape
    grid, z_spec, centers_spec, w_spec = _grids(B, H, W, L)
    zt = jnp.moveaxis(logits.astype(jnp.float32), -1, 1)
    centers, wf = _flatten_targets(cxcy2, w)
    scale = (g / (B * H * W * L)).astype(jnp.float32).reshape(1, 1)
    dz = pl.pallas_call(
        partial(_bwd_kernel, float(sigma), L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, l, r: (0, 0), memory_space=pltpu.SMEM),
            centers_spec,
            w_spec,
            z_spec,
        ],
        out_specs=z_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, H, W), jnp.float32),
        interpret=interpret,
    )(scale, centers, wf, zt)
    return jnp.moveaxis(dz, 1, -1).astype(logits.dtype), None, None


wbce_disk_loss.defvjp(_vjp_fwd, _vjp_bwd)


def pack_plain_targets(cxcy):
    """(B, L, 2) int centers -> (cxcy2, w) for the un-mixed case."""
    c = jnp.moveaxis(cxcy, -1, 1)  # (B, 2, L)
    cxcy2 = jnp.stack([c, c], axis=1).astype(jnp.int32)  # (B, 2, 2, L)
    w = jnp.ones((cxcy.shape[0], 1, cxcy.shape[1]), jnp.float32)
    return cxcy2, w


def pack_mixup_targets(cxcy, perm, lam):
    """Sample-mixup targets: disk A = own centers, disk B = permuted
    sample's centers, weight = per-sample lambda."""
    c = jnp.moveaxis(cxcy, -1, 1).astype(jnp.int32)  # (B, 2, L)
    cxcy2 = jnp.stack([c, c[perm]], axis=1)  # (B, 2, 2, L)
    w = jnp.broadcast_to(
        lam.astype(jnp.float32)[:, None, None], (cxcy.shape[0], 1, cxcy.shape[1])
    )
    return cxcy2, w


def pack_frame_mixup_targets(mix_centers, mix_hm_w):
    """Frame-mixup targets from the loader's blend plan
    (mix_centers (B, L, 2, 2), mix_hm_w (B, L))."""
    c = jnp.moveaxis(mix_centers, 1, -1).astype(jnp.int32)  # (B, 2, 2, L)
    w = mix_hm_w.astype(jnp.float32)[:, None, :]  # (B, 1, L)
    return c, w
