"""Hand-scheduled TrackNet inference forward with folded BatchNorm.

At inference, BatchNorm is an affine transform with constant parameters,
so it folds into the preceding (bias-free) convolution:

    W' = W * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - mean * gamma / sqrt(var + eps)

yielding a pure conv+bias+relu chain: fewer ops, no f32<->bf16 ping-pong,
and one fused kernel per block on the MXU. Produces the same outputs as
``TrackNet.apply(..., train=False)`` up to bf16 rounding (verified by
tests). Used by the inference engine and the bench.

Architecture contract: reference model.py:44-73 (see models/tracknet.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BLOCKS = [
    ("down_block_1", 2),
    ("down_block_2", 2),
    ("down_block_3", 3),
    ("bottleneck", 3),
    ("up_block_1", 3),
    ("up_block_2", 2),
    ("up_block_3", 2),
]


def fold_batchnorm(variables: Dict[str, Any], eps: float = 1e-5) -> Dict[str, Any]:
    """Fold BN statistics/affine params into conv kernels + biases.

    Returns {block: [(kernel, bias), ...], 'predictor': (kernel, bias)}.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    folded: Dict[str, Any] = {}
    for block, n in _BLOCKS:
        convs: List[Tuple[np.ndarray, np.ndarray]] = []
        for i in range(1, n + 1):
            sub = f"conv_{i}"
            kernel = np.asarray(params[block][sub]["conv"]["kernel"], np.float32)
            gamma = np.asarray(params[block][sub]["bn"]["scale"], np.float32)
            beta = np.asarray(params[block][sub]["bn"]["bias"], np.float32)
            mean = np.asarray(stats[block][sub]["bn"]["mean"], np.float32)
            var = np.asarray(stats[block][sub]["bn"]["var"], np.float32)
            inv = gamma / np.sqrt(var + eps)
            convs.append((kernel * inv, beta - mean * inv))
        folded[block] = convs
    folded["predictor"] = (
        np.asarray(params["predictor"]["kernel"], np.float32),
        np.asarray(params["predictor"]["bias"], np.float32),
    )
    return folded


def _conv_relu(x: jax.Array, kernel, bias, dtype=jnp.bfloat16) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        jnp.asarray(kernel, dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + jnp.asarray(bias, jnp.float32)
    return jnp.maximum(y, 0.0).astype(dtype)


def _block(x, convs, dtype):
    for kernel, bias in convs:
        x = _conv_relu(x, kernel, bias, dtype)
    return x


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


# single source of truth for the nearest-2x upsample: the flax reference
# model and these fused forwards must stay bit-identical
from .tracknet import _upsample2x_nearest as _up2x


def _subpixel_kernels(k):
    """Split a 3x3 kernel meant for a nearest-2x-upsampled input into four
    2x2 kernels, one per output parity class.

    conv3x3(SAME) on nearest-2x(X) computes, at output (2i+a, 2j+b), a
    weighted sum of duplicated X values; collapsing the duplicates gives a
    2x2 conv on X per parity (a, b) - 9/4 = 2.25x fewer MACs, bit-identical
    math (zero SAME-padding maps to zero padding of X at the borders).
    """
    rows = {
        0: jnp.stack([k[0], k[1] + k[2]], axis=0),  # taps X[i-1], X[i]
        1: jnp.stack([k[0] + k[1], k[2]], axis=0),  # taps X[i],   X[i+1]
    }
    out = {}
    for a in (0, 1):
        r = rows[a]  # (2, 3, Ci, Co)
        out[(a, 0)] = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
        out[(a, 1)] = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
    return out  # {(a, b): (2, 2, Ci, Co)}


def _conv_raw(x, kernel, padding, dtype, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype or jnp.float32,
    )


def _up_block_fused(x_small, skip, convs, dtype):
    """First conv of an up block computed WITHOUT materializing the 2x
    nearest-upsample: conv(concat([up2x(x), skip])) = subpixel-conv(x)
    + conv(skip), splitting the kernel along its input channels. Saves
    2.25x on the upsampled half's MACs (16% of the whole forward across
    the three up blocks). Exactly equivalent to the reference topology
    (model.py:57-73: Upsample -> concat -> conv block) up to the working
    dtype's rounding: the parity convs emit ``dtype`` (MXU accumulation is
    still f32) to halve the interleave's HBM traffic.
    """
    (k1, b1) = convs[0]
    cx = x_small.shape[-1]
    k1 = jnp.asarray(k1)
    kx, ks = k1[:, :, :cx, :], k1[:, :, cx:, :]

    parts = _subpixel_kernels(kx)
    ys = {
        (a, b): _conv_raw(
            x_small, parts[(a, b)], [(1 - a, a), (1 - b, b)], dtype, out_dtype=dtype
        )
        for a in (0, 1)
        for b in (0, 1)
    }
    # Interleave parities with trailing-axis stacks + reshape (no transpose).
    n, h, w, co = ys[(0, 0)].shape
    row0 = jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=-2)  # (n, h, w, 2, co)
    row1 = jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=-2)
    y_up = jnp.stack([row0, row1], axis=2).reshape(n, 2 * h, 2 * w, co)

    y = (
        y_up.astype(jnp.float32)
        + _conv_raw(skip, ks, "SAME", dtype)
        + jnp.asarray(b1, jnp.float32)
    )
    x = jnp.maximum(y, 0.0).astype(dtype)
    for kernel, bias in convs[1:]:
        x = _conv_relu(x, kernel, bias, dtype)
    return x


def tracknet_train_forward(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    x: jax.Array,
    *,
    train: bool = True,
    momentum: float = 0.9,
    eps: float = 1e-5,
    dtype=jnp.bfloat16,
    fast_bn: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Functional TrackNet forward over the flax parameter tree.

    Same math as ``TrackNet.apply`` (conv->BN->ReLU blocks; batch
    statistics over (N, H, W) with running-average update, flax
    momentum=0.9 semantics) but written as explicit lax ops - the flax
    module's op pattern executes ~100x slower on this TPU runtime. Used by
    the jitted train/eval steps; the flax module remains the
    definition/init/parity reference.

    ``fast_bn`` keeps the BatchNorm *statistics* in f32 (reductions
    upcast on the fly - nothing f32 is materialized) but applies the
    normalization in the working dtype: the standard path round-trips
    every activation tensor through f32 twice per layer, which is pure
    HBM traffic. Opt-in (config.fast_bn): activation values pick up one
    extra bf16 rounding per layer.

    Returns (logits f32, new_batch_stats).
    """
    new_stats = {k: {} for k, _ in _BLOCKS}

    def conv_bn_relu(x, block, i):
        sub = f"conv_{i}"
        kernel = params[block][sub]["conv"]["kernel"].astype(dtype)
        # No preferred_element_type here: its mixed-dtype backward conv is
        # rejected by lax. bf16 output + f32 BN matches flax's semantics.
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Statistics dtype: f32 for the production bf16/f32 paths, f64
        # when the working dtype is f64 (the multi-host numerics dryrun
        # runs the whole step in f64 to bound cross-process
        # reduction-order error; a hardwired f32 here would reintroduce
        # f32 noise into that bound).
        stats_dtype = jnp.result_type(jnp.float32, jnp.dtype(dtype))
        if not fast_bn:
            y = y.astype(stats_dtype)
        scale = params[block][sub]["bn"]["scale"]
        bias = params[block][sub]["bn"]["bias"]
        if train:
            yf = y.astype(stats_dtype)  # reductions upcast; fused by XLA
            bmean = jnp.mean(yf, axis=(0, 1, 2))
            bvar = jnp.maximum(
                jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(bmean), 0.0
            )
            new_stats[block][sub] = {
                "bn": {
                    "mean": momentum * batch_stats[block][sub]["bn"]["mean"]
                    + (1.0 - momentum) * bmean,
                    "var": momentum * batch_stats[block][sub]["bn"]["var"]
                    + (1.0 - momentum) * bvar,
                }
            }
            mean, var = bmean, bvar
        else:
            mean = batch_stats[block][sub]["bn"]["mean"]
            var = batch_stats[block][sub]["bn"]["var"]
        inv = jax.lax.rsqrt(var + eps) * scale
        if fast_bn:
            # fold (mean, inv, bias) into a single bf16 multiply-add
            y = y * inv.astype(dtype) + (bias - mean * inv).astype(dtype)
            return jnp.maximum(y, 0.0)
        y = (y - mean) * inv + bias
        return jnp.maximum(y, 0.0).astype(dtype)

    def block(x, name, n):
        for i in range(1, n + 1):
            x = conv_bn_relu(x, name, i)
        return x

    x = x.astype(dtype)
    x1 = block(x, "down_block_1", 2)
    x = _pool(x1)
    x2 = block(x, "down_block_2", 2)
    x = _pool(x2)
    x3 = block(x, "down_block_3", 3)
    x = _pool(x3)
    x = block(x, "bottleneck", 3)
    x = jnp.concatenate([_up2x(x), x3], axis=-1)
    x = block(x, "up_block_1", 3)
    x = jnp.concatenate([_up2x(x), x2], axis=-1)
    x = block(x, "up_block_2", 2)
    x = jnp.concatenate([_up2x(x), x1], axis=-1)
    x = block(x, "up_block_3", 2)
    logits = (
        jax.lax.conv_general_dilated(
            x,
            params["predictor"]["kernel"].astype(dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.result_type(jnp.float32, jnp.dtype(dtype)))
        + params["predictor"]["bias"]
    )
    return logits, (new_stats if train else batch_stats)


def tracknet_fused_forward(
    folded: Dict[str, Any],
    x: jax.Array,
    *,
    dtype=jnp.bfloat16,
    apply_sigmoid: bool = True,
    num_stages: int = 7,
    subpixel: bool = False,
) -> jax.Array:
    """Folded-BN TrackNet forward. ``num_stages`` truncates the network
    (1..7 blocks) for stage-wise profiling; 7 = full model. ``subpixel``
    computes each up block's first conv directly on the un-upsampled
    tensor (see _up_block_fused; exactly equivalent, 2.25x fewer MACs on
    the upsampled half - but measured SLOWER than XLA's plain conv on the
    upsampled tensor on TPU v5e (176 vs 159 ms at 64 windows): the parity
    interleave's extra HBM round trip outweighs the MAC saving, so it is
    off by default and kept for A/B)."""

    def up(x_small, skip, convs):
        if subpixel:
            return _up_block_fused(x_small, skip, convs, dtype)
        return _block(jnp.concatenate([_up2x(x_small), skip], axis=-1), convs, dtype)

    x = x.astype(dtype)
    x1 = _block(x, folded["down_block_1"], dtype)
    if num_stages == 1:
        return x1
    x = _pool(x1)
    x2 = _block(x, folded["down_block_2"], dtype)
    if num_stages == 2:
        return x2
    x = _pool(x2)
    x3 = _block(x, folded["down_block_3"], dtype)
    if num_stages == 3:
        return x3
    x = _pool(x3)
    x = _block(x, folded["bottleneck"], dtype)
    if num_stages == 4:
        return x
    x = up(x, x3, folded["up_block_1"])
    if num_stages == 5:
        return x
    x = up(x, x2, folded["up_block_2"])
    if num_stages == 6:
        return x
    x = up(x, x1, folded["up_block_3"])
    kernel, bias = folded["predictor"]
    logits = (
        jax.lax.conv_general_dilated(
            x,
            jnp.asarray(kernel, dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        + jnp.asarray(bias, jnp.float32)
    )
    if apply_sigmoid:
        return jax.nn.sigmoid(logits)
    return logits
