"""Frame-mixup plan tests (contract: reference dataset.py:476-594)."""

import numpy as np

from tracknetv3_tpu.data.frame_mixup import plan_frame_mixup


def _plan(coor, vis, alpha=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return plan_frame_mixup(
        np.asarray(coor, np.float32), np.asarray(vis, np.float32), 1.0, 1.0, alpha, rng
    )


def test_plan_shapes():
    L = 4
    coor = [(10 * i + 10, 20) for i in range(L)]
    p = _plan(coor, [1] * L)
    assert p.frame_pair.shape == (L, 2)
    assert p.pix_w.shape == (L,)
    assert p.centers.shape == (L, 2, 2)
    assert p.hm_w.shape == (L,)
    # slot ordering: frame pairs must be non-decreasing in source index
    assert np.all(np.diff(p.frame_pair[:, 1]) >= 0)


def test_large_motion_blends_heatmaps():
    # consecutive points 30px apart -> blended slots get two centers
    coor = [(10, 50), (40, 50), (70, 50), (100, 50)]
    rng = np.random.default_rng(1)
    found_blend = False
    for seed in range(20):
        p = _plan(coor, [1, 1, 1, 1], seed=seed)
        for k in range(len(p.hm_w)):
            if p.pix_w[k] not in (0.0, 1.0):  # a blended slot was sampled
                if p.hm_w[k] not in (0.0, 1.0):
                    assert not np.array_equal(p.centers[k, 0], p.centers[k, 1])
                    found_blend = True
    assert found_blend


def test_small_motion_no_heatmap_blend():
    # < 10 px motion -> blended slots take the current frame's disk only
    coor = [(10, 50), (12, 50), (14, 50), (16, 50)]
    for seed in range(10):
        p = _plan(coor, [1, 1, 1, 1], seed=seed)
        np.testing.assert_array_equal(p.hm_w, np.ones_like(p.hm_w))
        for k in range(len(p.hm_w)):
            np.testing.assert_array_equal(p.centers[k, 0], p.centers[k, 1])


def test_invisible_frame_carries_previous_disk():
    coor = [(50, 50), (0, 0), (90, 50), (130, 50)]
    vis = [1, 0, 1, 1]
    p = _plan(coor, vis, seed=3)
    # any slot whose real source is the invisible frame 1 must use the
    # carried-forward center (50, 50)
    for k in range(len(p.hm_w)):
        ja, jb = p.frame_pair[k]
        if jb == 1 and p.pix_w[k] == 1.0:  # the real slot of frame 1
            np.testing.assert_array_equal(p.centers[k, 0], [50, 50])


def test_scaler_applied_to_centers():
    coor = [(100, 60), (104, 60), (108, 60), (112, 60)]
    p = plan_frame_mixup(
        np.asarray(coor, np.float32),
        np.ones(4, np.float32),
        2.0,
        2.0,
        0.5,
        np.random.default_rng(0),
    )
    # centers are in input space: label / scaler
    assert p.centers[..., 0].max() <= 56
    assert p.centers[..., 1].max() == 30
