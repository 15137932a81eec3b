"""Native C++ CCL decoder vs the scipy reference-rule implementation."""

import numpy as np
import pytest

from tracknetv3_tpu.native_ccl import available, decode_heatmaps_native
from tracknetv3_tpu.ops.detect import decode_heatmaps_host

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)


def test_matches_scipy_on_fuzz():
    rng = np.random.default_rng(0)
    # random blobby heatmaps: smooth noise thresholded at various levels
    n, h, w = 24, 48, 64
    maps = np.zeros((n, h, w), np.float32)
    for i in range(n):
        pts = rng.integers(0, [h, w], size=(rng.integers(0, 5), 2))
        for (r, c) in pts:
            rr, cc = np.ogrid[:h, :w]
            maps[i] += np.exp(-(((rr - r) ** 2 + (cc - c) ** 2) / 12.0)).astype(
                np.float32
            )
    native = decode_heatmaps_native(maps, 0.5)
    scipy_out = decode_heatmaps_host(maps, 0.5, use_native=False)
    for k in ("cx", "cy", "vis", "bbox"):
        np.testing.assert_array_equal(native[k], scipy_out[k], err_msg=k)
    np.testing.assert_allclose(native["conf"], scipy_out["conf"], rtol=1e-6)


def test_empty_and_full():
    maps = np.zeros((2, 16, 16), np.float32)
    maps[1] = 1.0
    out = decode_heatmaps_native(maps, 0.5)
    assert out["vis"][0] == 0 and out["bbox"][0].sum() == 0
    # full map: one component covering everything
    np.testing.assert_array_equal(out["bbox"][1], [0, 0, 16, 16])
    assert out["cx"][1] == 8 and out["cy"][1] == 8


def test_diagonal_connectivity():
    m = np.zeros((8, 8), np.float32)
    m[1, 1] = m[2, 2] = m[3, 3] = 0.9  # diagonal chain = one component
    out = decode_heatmaps_native(m, 0.5)
    np.testing.assert_array_equal(out["bbox"], [1, 1, 3, 3])


def test_picks_largest_bbox_area():
    m = np.zeros((32, 32), np.float32)
    m[2:4, 2:4] = 0.9  # 2x2
    m[10:20, 10:14] = 0.6  # 10x4 = larger bbox
    out = decode_heatmaps_native(m, 0.5)
    np.testing.assert_array_equal(out["bbox"], [10, 10, 4, 10])
    assert out["cx"] == 12 and out["cy"] == 15
