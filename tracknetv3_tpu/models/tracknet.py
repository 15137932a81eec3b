"""TrackNet: VGG-style U-Net heatmap regressor, TPU-native (flax/NHWC/bf16).

Capability parity with the reference TrackNet (reference: model.py:44-73):
encoder Double(in->64) -> pool -> Double(64->128) -> pool -> Triple(128->256)
-> pool -> Triple(256->512) bottleneck; decoder 3x [nearest-2x upsample ->
channel-concat skip -> conv block] (768->256, 384->128, 192->64); 1x1 conv
head to ``out_dim`` channels; sigmoid output. Each conv block is 3x3
same-padding conv (no bias) + BatchNorm + ReLU (reference: model.py:4-16).

TPU-first design choices (not ports):
- NHWC layout: channels last maps to TPU lanes; W=512 is 4x the 128-lane
  width so every row tiles exactly.
- bfloat16 compute with float32 parameters and float32 BatchNorm statistics:
  convolutions hit the MXU at 2x the f32 rate while the numerics-sensitive
  normalization runs in f32.
- The model returns *logits* by default so the loss can be computed with a
  numerically-stable fused sigmoid+WBCE; ``apply(..., method=forward)`` with
  ``apply_sigmoid=True`` reproduces the reference's sigmoid output.
- BatchNorm can compute cross-replica (global-batch) statistics: under
  ``jit`` with a sharded batch axis the batch mean/variance are global means,
  which XLA lowers to ICI all-reduces automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNRelu(nn.Module):
    """3x3 same conv (no bias) + BatchNorm + ReLU (reference: model.py:4-16)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # BatchNorm in f32: cast up, normalize, cast back. momentum=0.9 and
        # eps=1e-5 match the reference framework defaults for running stats.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        return nn.relu(x).astype(self.dtype)


class ConvStack(nn.Module):
    """N consecutive ConvBNRelu blocks (reference: model.py:18-42)."""

    features: int
    num_blocks: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        for i in range(self.num_blocks):
            x = ConvBNRelu(self.features, dtype=self.dtype, name=f"conv_{i + 1}")(
                x, train=train
            )
        return x


def _upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsampling in NHWC.

    Matches torch nn.Upsample(scale_factor=2) semantics (mode='nearest',
    reference: model.py:65-69). Implemented as reshape+broadcast, which XLA
    fuses into the consumer conv rather than materializing the copy.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class TrackNet(nn.Module):
    """U-Net heatmap regressor over channel-stacked frame sequences.

    Input:  (N, H, W, C_in) with C_in from ``config.tracknet_in_channels``.
    Output: (N, H, W, out_dim) heatmap logits (or probabilities when
            ``apply_sigmoid=True``), one channel per frame of the window.
    """

    out_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, apply_sigmoid: bool = False
    ) -> jax.Array:
        x = x.astype(self.dtype)
        x1 = ConvStack(64, 2, dtype=self.dtype, name="down_block_1")(x, train=train)
        x = nn.max_pool(x1, (2, 2), strides=(2, 2))
        x2 = ConvStack(128, 2, dtype=self.dtype, name="down_block_2")(x, train=train)
        x = nn.max_pool(x2, (2, 2), strides=(2, 2))
        x3 = ConvStack(256, 3, dtype=self.dtype, name="down_block_3")(x, train=train)
        x = nn.max_pool(x3, (2, 2), strides=(2, 2))
        x = ConvStack(512, 3, dtype=self.dtype, name="bottleneck")(x, train=train)
        x = jnp.concatenate([_upsample2x_nearest(x), x3], axis=-1)  # 768 ch
        x = ConvStack(256, 3, dtype=self.dtype, name="up_block_1")(x, train=train)
        x = jnp.concatenate([_upsample2x_nearest(x), x2], axis=-1)  # 384 ch
        x = ConvStack(128, 2, dtype=self.dtype, name="up_block_2")(x, train=train)
        x = jnp.concatenate([_upsample2x_nearest(x), x1], axis=-1)  # 192 ch
        x = ConvStack(64, 2, dtype=self.dtype, name="up_block_3")(x, train=train)
        logits = nn.Conv(
            self.out_dim,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="predictor",
        )(x)
        logits = logits.astype(jnp.float32)
        if apply_sigmoid:
            return jax.nn.sigmoid(logits)
        return logits


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
