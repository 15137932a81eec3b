"""Fused virtual-label WBCE kernel vs the make_heatmaps + wbce composition.

Runs the Pallas kernels in interpreter mode (CPU CI); on TPU the same
code path compiles natively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tracknetv3_tpu.ops import make_heatmaps, wbce_from_logits
from tracknetv3_tpu.ops.pallas_wbce import (
    pack_frame_mixup_targets,
    pack_mixup_targets,
    pack_plain_targets,
    wbce_disk_loss,
)

B, H, W, L = 2, 32, 128, 3
SIGMA = 2.5


def _logits(seed=0, scale=3.0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, L)) * scale


def _centers(seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    cx = jax.random.randint(k1, (B, L), 0, W)
    cy = jax.random.randint(k2, (B, L), 0, H)
    # make one frame invisible
    cx = cx.at[0, 1].set(0)
    cy = cy.at[0, 1].set(0)
    return jnp.stack([cx, cy], axis=-1).astype(jnp.int32)  # (B, L, 2)


def _ref_loss(logits, y_maps):
    y = jnp.moveaxis(y_maps, 1, -1)  # (B, H, W, L)
    return wbce_from_logits(logits, y)


def test_plain_forward_matches_composition():
    logits = _logits()
    cxcy = _centers()
    cxcy2, w = pack_plain_targets(cxcy)
    got = wbce_disk_loss(logits, cxcy2, w, SIGMA, True)
    maps = make_heatmaps(cxcy[..., 0], cxcy[..., 1], H, W, SIGMA)
    want = _ref_loss(logits, maps)
    assert abs(float(got) - float(want)) < 1e-6


def test_plain_gradient_matches_composition():
    logits = _logits(scale=5.0)
    cxcy = _centers()
    cxcy2, w = pack_plain_targets(cxcy)
    maps = make_heatmaps(cxcy[..., 0], cxcy[..., 1], H, W, SIGMA)

    g_kernel = jax.grad(lambda z: wbce_disk_loss(z, cxcy2, w, SIGMA, True))(logits)
    g_ref = jax.grad(lambda z: _ref_loss(z, maps))(logits)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref), atol=1e-6)


def test_mixup_targets_match_blended_composition():
    logits = _logits(seed=2)
    cxcy = _centers(seed=3)
    perm = jnp.array([1, 0])
    lam = jnp.array([0.8, 0.6])
    cxcy2, w = pack_mixup_targets(cxcy, perm, lam)
    got = wbce_disk_loss(logits, cxcy2, w, SIGMA, True)

    maps = make_heatmaps(cxcy[..., 0], cxcy[..., 1], H, W, SIGMA)
    y = maps * lam[:, None, None, None] + maps[perm] * (1 - lam)[:, None, None, None]
    want = _ref_loss(logits, y)
    assert abs(float(got) - float(want)) < 1e-6


def test_frame_mixup_targets():
    logits = _logits(seed=4)
    rng = np.random.default_rng(0)
    centers = rng.integers(1, 30, size=(B, L, 2, 2)).astype(np.int32)
    hm_w = rng.uniform(0, 1, size=(B, L)).astype(np.float32)
    cxcy2, w = pack_frame_mixup_targets(jnp.asarray(centers), jnp.asarray(hm_w))
    got = wbce_disk_loss(logits, cxcy2, w, SIGMA, True)

    map_a = make_heatmaps(centers[..., 0, 0], centers[..., 0, 1], H, W, SIGMA)
    map_b = make_heatmaps(centers[..., 1, 0], centers[..., 1, 1], H, W, SIGMA)
    y = map_a * hm_w[..., None, None] + map_b * (1 - hm_w[..., None, None])
    want = _ref_loss(logits, y)
    assert abs(float(got) - float(want)) < 1e-6


def test_gradient_finite_at_saturation():
    logits = jnp.full((B, H, W, L), 40.0)  # deeply saturated
    cxcy2, w = pack_plain_targets(_centers())
    g = jax.grad(lambda z: wbce_disk_loss(z, cxcy2, w, SIGMA, True))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
