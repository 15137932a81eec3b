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


def _pack_s2d(x: jax.Array) -> jax.Array:
    """Space-to-depth: (N, H, W, C) -> (N, H/2, W/2, 4C), channel blocks
    ordered (a, b) = (0,0), (0,1), (1,0), (1,1) for original (2i+a, 2j+b)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, (2, 4), (3, 4))  # (n, h2, w2, 2, 2, c)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _unpack_s2d(y: jax.Array, c: int) -> jax.Array:
    """Inverse of :func:`_pack_s2d` for the last-axis block count 4."""
    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, c)
    y = jnp.moveaxis(y, (3, 4), (2, 4))  # (n, h2, 2, w2, 2, c)
    return y.reshape(n, h2 * 2, w2 * 2, c)


def _s2d_kernel_3x3(k: jax.Array) -> jax.Array:
    """Lift a 3x3 SAME conv kernel to packed space-to-depth space.

    (3, 3, Ci, Co) -> (3, 3, 4Ci, 4Co) such that
    ``conv(pack(x), lifted) == pack(conv(x, k))`` exactly for even H, W
    (zero SAME-padding in packed space corresponds to zero rows/cols of
    the original image). Packed output block (a, b) at packed (I, J) is
    original output (2I+a, 2J+b); its original tap (di, dj) reads the
    packed position (I + (a+di+2)//2 - 1, ...) channel block
    ((a+di) % 2, (b+dj) % 2). 9 of 36 packed tap/block combinations are
    nonzero (4x the MACs) - a net win only where the original shape
    starves the MXU (see tools/probe_topres_variants.py). The lift is
    pure jnp (differentiable), so autodiff yields exact gradients for
    the ORIGINAL kernel.
    """
    ci, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for a in (0, 1):
        for b in (0, 1):
            ob = 2 * a + b
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    pi, ia = divmod(a + di + 2, 2)
                    pj, jb = divmod(b + dj + 2, 2)
                    ib = 2 * ia + jb
                    kp = kp.at[
                        pi - 1 + 1,
                        pj - 1 + 1,
                        ib * ci : (ib + 1) * ci,
                        ob * co : (ob + 1) * co,
                    ].set(k[di + 1, dj + 1])
    return kp


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
    remat_layers: bool = False,
    split_up_entry: bool = False,
    s2d_first: bool = False,
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

    TPU formulation options (all produce the same function values up to
    the working dtype's rounding; measured in
    tools/probe_step_variants.py, wired via config where they win):

    - ``remat_layers``: per conv layer, save only the conv output and the
      batch statistics for the backward; the normalize+ReLU epilogue is
      recomputed, letting XLA fuse it into the gradient convs instead of
      storing a second full-size activation per layer.
    - ``split_up_entry``: each up block's first conv splits its kernel
      along input channels into conv(up2x(x)) + conv(skip) - the (N, H,
      W, Cup+Cskip) concatenation is never materialized (nor stored as a
      backward residual).
    - ``s2d_first``: the first conv (whose 24 input channels waste 104 of
      128 MXU/VPU lanes) runs in space-to-depth space with a lifted
      kernel; statistics and normalize happen in packed space and the
      result is unpacked after the ReLU. Requires even H, W (asserted).

    Returns (logits f32, new_batch_stats).
    """
    # Statistics dtype: f32 for the production bf16/f32 paths, f64
    # when the working dtype is f64 (the multi-host numerics dryrun
    # runs the whole step in f64 to bound cross-process
    # reduction-order error; a hardwired f32 here would reintroduce
    # f32 noise into that bound).
    stats_dtype = jnp.result_type(jnp.float32, jnp.dtype(dtype))
    new_stats = {k: {} for k, _ in _BLOCKS}

    def conv_out(x, block, i):
        kernel = params[block][f"conv_{i}"]["conv"]["kernel"].astype(dtype)
        # No preferred_element_type here: its mixed-dtype backward conv is
        # rejected by lax. bf16 output + f32 BN matches flax's semantics.
        return jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def batch_moments(y, repeats: int = 1):
        """(mean, var) over (N, H, W); with ``repeats`` > 1 the channel
        axis holds ``repeats`` stacked blocks of the true channels (the
        space-to-depth layout) that all belong to the same statistic."""
        yf = y.astype(stats_dtype)  # reductions upcast; fused by XLA
        if repeats > 1:
            c = y.shape[-1] // repeats
            yf = yf.reshape(yf.shape[:-1] + (repeats, c))
            axes = tuple(range(yf.ndim - 1))
        else:
            axes = (0, 1, 2)
        m = jnp.mean(yf, axis=axes)
        v = jnp.maximum(jnp.mean(jnp.square(yf), axis=axes) - jnp.square(m), 0.0)
        return m, v

    def record_stats(block, i, mean, var):
        sub = f"conv_{i}"
        new_stats[block][sub] = {
            "bn": {
                "mean": momentum * batch_stats[block][sub]["bn"]["mean"]
                + (1.0 - momentum) * mean,
                "var": momentum * batch_stats[block][sub]["bn"]["var"]
                + (1.0 - momentum) * var,
            }
        }

    def bn_relu(y, block, i, mean, var, repeats: int = 1):
        """Normalize + ReLU given the statistics to normalize with."""
        sub = f"conv_{i}"
        scale = params[block][sub]["bn"]["scale"]
        bias = params[block][sub]["bn"]["bias"]
        inv = jax.lax.rsqrt(var + eps) * scale
        if fast_bn:
            # fold (mean, inv, bias) into a single working-dtype FMA
            shift = bias - mean * inv
            if repeats > 1:
                inv, shift = jnp.tile(inv, repeats), jnp.tile(shift, repeats)
            z = y * inv.astype(dtype) + shift.astype(dtype)
            return jnp.maximum(z, 0.0)
        if repeats > 1:
            inv, mean, bias = (
                jnp.tile(inv, repeats), jnp.tile(mean, repeats),
                jnp.tile(bias, repeats),
            )
        # keep the (y - mean) * inv + bias association: bit-identical to
        # the pre-variant formulation of this forward
        z = (y.astype(stats_dtype) - mean) * inv + bias
        return jnp.maximum(z, 0.0).astype(dtype)

    if remat_layers:
        from jax.ad_checkpoint import checkpoint_name

        saveable = jax.checkpoint_policies.save_only_these_names(
            "conv_out", "bn_stats"
        )
    else:
        checkpoint_name = None
        saveable = None

    def conv_bn_relu(x, block, i, y_pre=None):
        """One conv->BN->ReLU layer. ``y_pre`` supplies an externally
        computed pre-activation (the split up-block entry) - the conv is
        then skipped and only the BN+ReLU epilogue runs."""

        def layer(x, y_pre):
            y = conv_out(x, block, i) if y_pre is None else y_pre
            if remat_layers:
                y = checkpoint_name(y, "conv_out")
            if train:
                mean, var = batch_moments(y)
                if remat_layers:
                    mean = checkpoint_name(mean, "bn_stats")
                    var = checkpoint_name(var, "bn_stats")
            else:
                mean = batch_stats[block][f"conv_{i}"]["bn"]["mean"]
                var = batch_stats[block][f"conv_{i}"]["bn"]["var"]
            return bn_relu(y, block, i, mean, var), (mean, var)

        if remat_layers:
            layer = jax.checkpoint(layer, policy=saveable)
        out, (mean, var) = layer(x, y_pre)
        if train:
            record_stats(block, i, mean, var)
        return out

    def block(x, name, n, start=1):
        for i in range(start, n + 1):
            x = conv_bn_relu(x, name, i)
        return x

    def first_layer(x):
        """down_block_1/conv_1 - optionally in space-to-depth space."""
        h, w = x.shape[1:3]
        if not (s2d_first and h % 2 == 0 and w % 2 == 0):
            return conv_bn_relu(x, "down_block_1", 1)
        co = params["down_block_1"]["conv_1"]["conv"]["kernel"].shape[-1]

        def layer(x):
            kernel = params["down_block_1"]["conv_1"]["conv"]["kernel"]
            kp = _s2d_kernel_3x3(kernel.astype(dtype))
            yp = jax.lax.conv_general_dilated(
                _pack_s2d(x.astype(dtype)),
                kp,
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if remat_layers:
                yp = checkpoint_name(yp, "conv_out")
            if train:
                mean, var = batch_moments(yp, repeats=4)
                if remat_layers:
                    mean = checkpoint_name(mean, "bn_stats")
                    var = checkpoint_name(var, "bn_stats")
            else:
                mean = batch_stats["down_block_1"]["conv_1"]["bn"]["mean"]
                var = batch_stats["down_block_1"]["conv_1"]["bn"]["var"]
            zp = bn_relu(yp, "down_block_1", 1, mean, var, repeats=4)
            return _unpack_s2d(zp, co), (mean, var)

        if remat_layers:
            layer = jax.checkpoint(layer, policy=saveable)
        out, (mean, var) = layer(x)
        if train:
            record_stats("down_block_1", 1, mean, var)
        return out

    def up_entry(x_small, skip, name, n):
        """Up block: 2x nearest-upsample, concat with the skip, then the
        conv block (reference model.py:57-73). With ``split_up_entry``
        the entry conv's kernel is split along input channels so the
        concatenation is never built: conv(concat([u, s]), k) ==
        conv(u, k[:, :, :Cu]) + conv(s, k[:, :, Cu:]) (same MACs; the
        two partial sums round once more in the working dtype)."""
        if not split_up_entry:
            x = jnp.concatenate([_up2x(x_small), skip], axis=-1)
            return block(x, name, n)
        kernel = params[name]["conv_1"]["conv"]["kernel"].astype(dtype)
        cu = x_small.shape[-1]
        y = jax.lax.conv_general_dilated(
            _up2x(x_small).astype(dtype),
            kernel[:, :, :cu],
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jax.lax.conv_general_dilated(
            skip.astype(dtype),
            kernel[:, :, cu:],
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = conv_bn_relu(None, name, 1, y_pre=y)
        return block(x, name, n, start=2)

    x = x.astype(dtype)
    x1 = first_layer(x)
    x1 = conv_bn_relu(x1, "down_block_1", 2)
    x = _pool(x1)
    x2 = block(x, "down_block_2", 2)
    x = _pool(x2)
    x3 = block(x, "down_block_3", 3)
    x = _pool(x3)
    x = block(x, "bottleneck", 3)
    x = up_entry(x, x3, "up_block_1", 3)
    x = up_entry(x, x2, "up_block_2", 2)
    x = up_entry(x, x1, "up_block_3", 2)
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
