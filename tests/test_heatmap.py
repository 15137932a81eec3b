"""Golden tests for binary-disk heatmap generation."""

import jax.numpy as jnp
import numpy as np

from tracknetv3_tpu.config import SIGMA
from tracknetv3_tpu.ops import make_heatmaps


def _np_disk(cx, cy, h, w, sigma):
    # Independent reimplementation of the reference label recipe
    # (contract: dataset.py:401-410 - 1-based meshgrid, <= sigma^2).
    if cx == 0 and cy == 0:
        return np.zeros((h, w))
    x, y = np.meshgrid(np.linspace(1, w, w), np.linspace(1, h, h))
    d2 = (y - (cy + 1)) ** 2 + (x - (cx + 1)) ** 2
    return (d2 <= sigma**2).astype(np.float64)


def test_heatmap_matches_reference_recipe():
    h, w = 36, 64
    for cx, cy in [(10, 20), (0, 5), (5, 0), (63, 35), (1, 1)]:
        got = np.asarray(make_heatmaps(jnp.array(cx), jnp.array(cy), h, w, SIGMA))
        want = _np_disk(cx, cy, h, w, SIGMA)
        np.testing.assert_array_equal(got, want), (cx, cy)


def test_heatmap_invisible_is_zero():
    got = np.asarray(make_heatmaps(jnp.array(0), jnp.array(0), 16, 16))
    assert got.sum() == 0


def test_heatmap_batched_shape():
    cx = jnp.array([[3, 0], [7, 9]])
    cy = jnp.array([[4, 0], [2, 9]])
    maps = make_heatmaps(cx, cy, 16, 32)
    assert maps.shape == (2, 2, 16, 32)
    assert maps[0, 1].sum() == 0  # (0,0) -> invisible
    # Disk area for sigma=2.5: 21 pixels (5x5 cross-ish disk) when interior.
    assert int(maps[0, 0].sum()) == 21
    assert int(maps[1, 0].sum()) == 21


def test_heatmap_disk_at_border_is_clipped():
    maps = make_heatmaps(jnp.array(0), jnp.array(8), 16, 32)
    # Center on the left edge: only the in-bounds half of the disk remains.
    assert 0 < int(maps.sum()) < 21
