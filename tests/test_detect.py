"""Decoder tests: device flood-fill decode vs the exact host rule."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracknetv3_tpu.ops import make_heatmaps
from tracknetv3_tpu.ops.detect import decode_heatmaps, decode_heatmaps_host


def test_roundtrip_label_centers():
    # Heatmap generated at (cx, cy) must decode back to exactly (cx, cy):
    # the disk bbox is symmetric around the center.
    rng = np.random.default_rng(0)
    cx = rng.integers(6, 120, size=(4, 3))
    cy = rng.integers(6, 90, size=(4, 3))
    maps = make_heatmaps(jnp.asarray(cx), jnp.asarray(cy), 96, 128)
    dec = decode_heatmaps(maps)
    np.testing.assert_array_equal(np.asarray(dec["cx"]), cx)
    np.testing.assert_array_equal(np.asarray(dec["cy"]), cy)
    np.testing.assert_array_equal(np.asarray(dec["vis"]), np.ones_like(cx))


def test_empty_heatmap():
    dec = decode_heatmaps(jnp.zeros((2, 32, 48)))
    for k in ("cx", "cy", "vis"):
        assert np.all(np.asarray(dec[k]) == 0)
    assert np.all(np.asarray(dec["bbox"]) == 0)


def test_two_blobs_picks_peak_host_picks_area():
    # Big dim blob + small bright blob: device picks the bright one,
    # host (reference rule) picks the larger bbox.
    m = np.zeros((64, 64), np.float32)
    m[10:20, 10:22] = 0.6  # large blob, bbox 12x10
    m[40:43, 40:43] = 0.9  # small bright blob, bbox 3x3
    dev = decode_heatmaps(jnp.asarray(m))
    host = decode_heatmaps_host(m)
    assert (int(dev["cx"]), int(dev["cy"])) == (41, 41)
    assert (int(host["cx"]), int(host["cy"])) == (16, 15)


def test_agreement_on_single_blob_maps():
    rng = np.random.default_rng(1)
    maps = np.zeros((8, 48, 64), np.float32)
    for i in range(8):
        cx, cy = rng.integers(5, 59), rng.integers(5, 43)
        r, c = np.ogrid[:48, :64]
        blob = ((r - cy) ** 2 + (c - cx) ** 2) <= rng.integers(2, 20)
        maps[i][blob] = rng.uniform(0.6, 1.0)
    dev = decode_heatmaps(jnp.asarray(maps))
    host = decode_heatmaps_host(maps)
    for k in ("cx", "cy", "vis"):
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k])
    np.testing.assert_array_equal(np.asarray(dev["bbox"]), host["bbox"])
    np.testing.assert_allclose(np.asarray(dev["conf"]), host["conf"], rtol=1e-6)


def test_irregular_blob_bbox_and_conf():
    # L-shaped blob: bbox covers the whole component.
    m = np.zeros((32, 32), np.float32)
    m[5:15, 5:8] = 0.7
    m[12:15, 5:20] = 0.8
    dev = decode_heatmaps(jnp.asarray(m))
    host = decode_heatmaps_host(m)
    np.testing.assert_array_equal(np.asarray(dev["bbox"]), host["bbox"])
    assert float(dev["conf"]) == pytest.approx(0.8)


def test_visibility_zero_when_center_is_origin():
    # A blob whose bbox center lands exactly on (0, 0) reads as invisible,
    # matching the reference's (cx==0 and cy==0) convention.
    m = np.zeros((16, 16), np.float32)
    m[0, 0] = 1.0
    dec = decode_heatmaps(jnp.asarray(m))
    assert int(dec["vis"]) == 0
