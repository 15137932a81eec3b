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

# ------------------------- exact device decoder --------------------------


def _random_multiblob_corpus(rng, n, h=96, w=128, max_blobs=5):
    """Random multi-blob maps: rectangles + disks of varied size/intensity,
    including overlapping components and area ties."""
    maps = np.zeros((n, h, w), np.float32)
    for i in range(n):
        for _ in range(int(rng.integers(0, max_blobs + 1))):
            v = float(rng.uniform(0.55, 1.0))
            if rng.random() < 0.5:
                y0 = int(rng.integers(0, h - 12))
                x0 = int(rng.integers(0, w - 12))
                bh = int(rng.integers(1, 12))
                bw = int(rng.integers(1, 12))
                maps[i, y0 : y0 + bh, x0 : x0 + bw] = v
            else:
                cy = int(rng.integers(3, h - 3))
                cx = int(rng.integers(3, w - 3))
                r, c = np.ogrid[:h, :w]
                blob = ((r - cy) ** 2 + (c - cx) ** 2) <= int(rng.integers(2, 30))
                maps[i][blob] = v
    return maps


def test_exact_device_matches_host_on_multiblob_corpus():
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    rng = np.random.default_rng(7)
    maps = _random_multiblob_corpus(rng, 64)
    dev = decode_heatmaps_exact(jnp.asarray(maps))
    host = decode_heatmaps_host(maps)
    for k in ("cx", "cy", "vis", "bbox"):
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k], err_msg=k)
    np.testing.assert_allclose(np.asarray(dev["conf"]), host["conf"], rtol=1e-6)


def test_exact_device_two_blobs_picks_area():
    # The adversarial case where the PRODUCTION kernel diverges from the
    # reference (test_two_blobs_picks_peak_host_picks_area above): the
    # exact device rule must side with the host.
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    m = np.zeros((64, 64), np.float32)
    m[10:20, 10:22] = 0.6  # large blob, bbox 12x10
    m[40:43, 40:43] = 0.9  # small bright blob, bbox 3x3
    dev = decode_heatmaps_exact(jnp.asarray(m))
    host = decode_heatmaps_host(m)
    assert (int(dev["cx"]), int(dev["cy"])) == (16, 15)
    np.testing.assert_array_equal(np.asarray(dev["bbox"]), host["bbox"])
    assert float(dev["conf"]) == pytest.approx(float(host["conf"]))


def test_exact_device_area_tie_keeps_raster_first():
    # Two equal-area components: scipy/native CCL label in raster-scan
    # order of the first pixel and the host keeps the EARLIEST label on
    # strict-greater comparison; the device rule must reproduce that even
    # though it extracts blobs in descending-peak order (the brighter blob
    # here is the LATER one in raster order).
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    m = np.zeros((48, 48), np.float32)
    m[5:9, 5:9] = 0.6  # first in raster order, dimmer
    m[30:34, 30:34] = 0.95  # equal 4x4 bbox, brighter peak
    dev = decode_heatmaps_exact(jnp.asarray(m))
    host = decode_heatmaps_host(m)
    assert (int(host["cx"]), int(host["cy"])) == (7, 7)
    assert (int(dev["cx"]), int(dev["cy"])) == (7, 7)
    np.testing.assert_array_equal(np.asarray(dev["bbox"]), host["bbox"])


def test_exact_device_empty_and_origin():
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    dec = decode_heatmaps_exact(jnp.zeros((2, 32, 48)))
    for k in ("cx", "cy", "vis"):
        assert np.all(np.asarray(dec[k]) == 0)
    m = np.zeros((16, 16), np.float32)
    m[0, 0] = 1.0
    assert int(decode_heatmaps_exact(jnp.asarray(m))["vis"]) == 0


def test_exact_device_roundtrip_label_centers():
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    rng = np.random.default_rng(3)
    cx = rng.integers(6, 120, size=(4, 3))
    cy = rng.integers(6, 90, size=(4, 3))
    maps = make_heatmaps(jnp.asarray(cx), jnp.asarray(cy), 96, 128)
    dec = decode_heatmaps_exact(maps)
    np.testing.assert_array_equal(np.asarray(dec["cx"]), cx)
    np.testing.assert_array_equal(np.asarray(dec["cy"]), cy)


def test_exact_device_giant_blob_exceeds_crop():
    # A component far larger than the crop window (and an extra small
    # blob) must still decode exactly: the full-res expansion phase makes
    # the rule crop-independent.
    from tracknetv3_tpu.ops.detect import decode_heatmaps_exact

    m = np.zeros((96, 160), np.float32)
    m[8:88, 10:150] = 0.7  # 140x80 blob >> 16-px crop
    m[2:4, 2:4] = 0.99  # brighter but tiny
    dev = decode_heatmaps_exact(jnp.asarray(m), crop=16)
    host = decode_heatmaps_host(m)
    for k in ("cx", "cy", "bbox"):
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k], err_msg=k)
    assert float(dev["conf"]) == pytest.approx(float(host["conf"]))
