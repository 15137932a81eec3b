"""Heatmap label generation: binary disk, fully vectorized on device.

The reference generates one (H, W) map per frame on the CPU inside DataLoader
workers (reference: dataset.py:401-410): squared distance from (cx, cy) on a
1-based meshgrid, thresholded at SIGMA^2 -> {0, 1}, and an all-zero map when
(cx, cy) == (0, 0) (invisible ball).

Here the whole (N, L) batch of labels is produced in one fused XLA program
from integer center coordinates - two broadcasted iotas, a squared-distance
compare, and a visibility mask. This removes the per-frame Python/numpy work
from the input pipeline entirely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import HEIGHT, SIGMA, WIDTH


@partial(jax.jit, static_argnames=("height", "width", "sigma"))
def make_heatmaps(
    cx: jax.Array,
    cy: jax.Array,
    height: int = HEIGHT,
    width: int = WIDTH,
    sigma: float = SIGMA,
) -> jax.Array:
    """Generate binary-disk heatmaps for integer centers.

    Args:
        cx, cy: integer center coordinates in input space, any matching
            shape ``S`` (e.g. ``(N, L)``). (0, 0) means "no ball" and
            produces an all-zero map, matching reference dataset.py:403-404.

    Returns:
        float32 array of shape ``S + (height, width)`` with values in {0, 1}.
    """
    cx = jnp.asarray(cx)
    cy = jnp.asarray(cy)
    batch_shape = cx.shape
    cxf = cx.reshape(-1).astype(jnp.float32)
    cyf = cy.reshape(-1).astype(jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    # (B, H, W) squared distance; the reference's 1-based grid minus (c+1)
    # reduces to 0-based index minus c.
    d2 = (rows[None] - cyf[:, None, None]) ** 2 + (cols[None] - cxf[:, None, None]) ** 2
    disk = (d2 <= jnp.float32(sigma) ** 2).astype(jnp.float32)
    visible = jnp.logical_or(cxf != 0, cyf != 0).astype(jnp.float32)
    maps = disk * visible[:, None, None]
    return maps.reshape(*batch_shape, height, width)
