"""Inpaint-mask generation and linear-interp golden tests
(contract: reference test.py:223-286)."""

import numpy as np

from tracknetv3_tpu.ops.postprocess import generate_inpaint_mask, linear_interp


def _pd(vis, y):
    return {"Visibility": list(vis), "Y": list(y), "X": [0] * len(vis)}


def test_mid_gap_marked_when_high():
    # gap at 3..5, flanked by y > threshold on both sides
    vis = [1, 1, 1, 0, 0, 0, 1, 1]
    y = [50, 50, 60, 0, 0, 0, 70, 50]
    mask = generate_inpaint_mask(_pd(vis, y), th_h=30)
    assert mask == [0, 0, 0, 1, 1, 1, 0, 0]


def test_gap_near_camera_exit_not_marked():
    # flanking y below threshold => ball left the view, no inpainting
    vis = [1, 1, 1, 0, 0, 0, 1, 1]
    y = [50, 50, 10, 0, 0, 0, 10, 50]
    mask = generate_inpaint_mask(_pd(vis, y), th_h=30)
    assert mask == [0] * 8


def test_leading_gap_marked():
    vis = [0, 0, 1, 1, 1, 1, 1, 1]
    y = [0, 0, 60, 60, 60, 60, 60, 60]
    mask = generate_inpaint_mask(_pd(vis, y), th_h=30)
    assert mask[:2] == [1, 1] and sum(mask[2:]) == 0


def test_no_gaps_no_mask():
    vis = [1] * 6
    y = [50] * 6
    assert generate_inpaint_mask(_pd(vis, y)) == [0] * 6


def test_multiple_gaps():
    vis = [1, 0, 0, 1, 1, 0, 1, 1]
    y = [50, 0, 0, 60, 60, 0, 70, 50]
    mask = generate_inpaint_mask(_pd(vis, y), th_h=30)
    # Reference quirk: the i > 1 guard means a gap starting at index 1 is
    # never marked (reference test.py:251); only the gap at index 5 is.
    assert mask == [0, 0, 0, 0, 0, 1, 0, 0]


def test_linear_interp_interior_gap():
    target = [10.0, 0.0, 0.0, 0.0, 50.0, 60.0]
    mask = [0, 1, 1, 1, 0, 0]
    out = linear_interp(target, mask)
    # run i=1..3 (inclusive of 3? run end j=4): interp between
    # target[0]=10 and target[4]=50 over 3 points: 10, 30, 50
    np.testing.assert_allclose(out[1:4], [10.0, 30.0, 50.0])
    np.testing.assert_allclose(out[[0, 4, 5]], [10.0, 50.0, 60.0])


def test_linear_interp_leading_gap_held_constant():
    target = [0.0, 0.0, 40.0, 50.0]
    mask = [1, 1, 0, 0]
    out = linear_interp(target, mask)
    np.testing.assert_allclose(out[:2], [40.0, 40.0])


def test_linear_interp_no_mask_identity():
    target = [1.0, 2.0, 3.0]
    out = linear_interp(target, [0, 0, 0])
    np.testing.assert_allclose(out, target)
