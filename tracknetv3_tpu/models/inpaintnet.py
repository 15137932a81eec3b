"""InpaintNet: 1-D conv encoder-decoder for trajectory gap repair.

Capability parity with the reference InpaintNet (reference: model.py:100-129):
input is a (N, L, 2) normalized-coordinate sequence plus a (N, L, 1) inpaint
mask, concatenated to (N, L, 3); down 3->32->64->128 (Conv1D k=3 'same',
bias=True, LeakyReLU), Double1DConv bottleneck 128->256; decoder concatenates
encoder features (only x3 is a true skip; up_2/up_3 concat x2/x1 at full
length L - there is no pooling anywhere); head Conv1d(32->2, k=3) + sigmoid.

TPU note: L is tiny (16) and the whole network is ~0.5M params, so the
design goal is a single fused XLA program (NLC layout, channels-last) rather
than custom kernels; the entire forward runs out of VMEM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Conv1DBlock(nn.Module):
    """Conv1D k=3 same (bias) + LeakyReLU (reference: model.py:76-86)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3,),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class InpaintNet(nn.Module):
    """Trajectory inpainting network. Input (N, L, 2) coords + (N, L, 1) mask."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords: jax.Array, mask: jax.Array) -> jax.Array:
        x = jnp.concatenate([coords, mask], axis=-1).astype(self.dtype)  # (N, L, 3)
        x1 = Conv1DBlock(32, dtype=self.dtype, name="down_1")(x)
        x2 = Conv1DBlock(64, dtype=self.dtype, name="down_2")(x1)
        x3 = Conv1DBlock(128, dtype=self.dtype, name="down_3")(x2)
        x = Conv1DBlock(256, dtype=self.dtype, name="bottleneck_1")(x3)
        x = Conv1DBlock(256, dtype=self.dtype, name="bottleneck_2")(x)
        x = jnp.concatenate([x, x3], axis=-1)  # 384 ch
        x = Conv1DBlock(128, dtype=self.dtype, name="up_1")(x)
        x = jnp.concatenate([x, x2], axis=-1)  # 192 ch
        x = Conv1DBlock(64, dtype=self.dtype, name="up_2")(x)
        x = jnp.concatenate([x, x1], axis=-1)  # 96 ch
        x = Conv1DBlock(32, dtype=self.dtype, name="up_3")(x)
        x = nn.Conv(
            2,
            kernel_size=(3,),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="predictor",
        )(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))  # (N, L, 2)
