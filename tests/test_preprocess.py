"""Preprocessing tests: resize parity with PIL, bg-mode channel contracts."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tracknetv3_tpu.ops.preprocess import (
    background_diff,
    gather_windows,
    make_window_preprocessor,
    median_frame,
    resize_frames,
    window_channels,
)


def test_resize_close_to_pil_bicubic():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(72, 128, 3), dtype=np.uint8)
    got = np.asarray(resize_frames(jnp.asarray(img), 36, 64))
    want = np.asarray(
        Image.fromarray(img).resize((64, 36), Image.BICUBIC), dtype=np.float32
    )
    # Antialiased bicubic in XLA vs PIL: small numeric differences only.
    assert np.abs(got - want).mean() < 1.5
    assert np.abs(got - want).max() < 16  # worst-case single pixel


def test_background_diff_mod256_quirk():
    frame = jnp.asarray(np.full((4, 4, 3), 200.0, np.float32))
    median = jnp.zeros((4, 4, 3))
    # sum|diff| = 600 -> uint8 truncation wraps to 600 - 512 = 88.
    diff = np.asarray(background_diff(frame, median))
    assert diff.shape == (4, 4, 1)
    np.testing.assert_array_equal(diff[..., 0], np.full((4, 4), 88.0))


def test_median_frame_matches_numpy():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(7, 6, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(median_frame(jnp.asarray(frames))), np.median(frames, axis=0)
    )


@pytest.mark.parametrize(
    "bg_mode,expected_c", [("", 6), ("subtract", 2), ("subtract_concat", 8), ("concat", 9)]
)
def test_window_channels_shapes(bg_mode, expected_c):
    L, h, w = 2, 8, 16
    frames = jnp.ones((L, h, w, 3)) * 255.0
    diffs = jnp.ones((L, h, w, 1)) * 128.0
    med = jnp.ones((h, w, 3)) * 64.0
    out = window_channels(frames, diffs, med, bg_mode)
    assert out.shape == (h, w, expected_c)
    assert float(out.max()) <= 1.0


def test_window_channels_frame_major_order():
    # Channel c of the stacked output must be frame c//3, color c%3 -
    # identical to the reference's channel-first torch stacking.
    L, h, w = 3, 2, 2
    frames = np.zeros((L, h, w, 3), np.float32)
    for f in range(L):
        for c in range(3):
            frames[f, :, :, c] = f * 10 + c
    out = np.asarray(window_channels(jnp.asarray(frames), None, None, "")) * 255.0
    for f in range(L):
        for c in range(3):
            np.testing.assert_allclose(out[:, :, f * 3 + c], f * 10 + c, atol=1e-4)


def test_gather_windows():
    T, h, w, c = 10, 2, 2, 1
    per_frame = jnp.arange(T, dtype=jnp.float32).reshape(T, 1, 1, 1) * jnp.ones((T, h, w, c))
    wins = np.asarray(gather_windows(per_frame, jnp.array([0, 3, 7]), 3))
    assert wins.shape == (3, 3, h, w, c)
    np.testing.assert_allclose(wins[1, :, 0, 0, 0], [3, 4, 5])
    # Start beyond T-L clips to the last frame (padding semantics).
    np.testing.assert_allclose(wins[2, :, 0, 0, 0], [7, 8, 9])


@pytest.mark.parametrize("bg_mode", ["", "subtract", "subtract_concat", "concat"])
def test_make_window_preprocessor_end_to_end(bg_mode):
    rng = np.random.default_rng(2)
    T, H0, W0, L = 6, 36, 64, 3
    frames = rng.integers(0, 256, size=(T, H0, W0, 3), dtype=np.uint8)
    median = np.median(frames.astype(np.float32), axis=0)
    fn = make_window_preprocessor(bg_mode, L)
    out = np.asarray(fn(jnp.asarray(frames), jnp.asarray(median), jnp.array([0, 2])))
    from tracknetv3_tpu.config import HEIGHT, WIDTH, tracknet_in_channels

    assert out.shape == (2, HEIGHT, WIDTH, tracknet_in_channels(L, bg_mode))
    assert out.min() >= 0.0 and out.max() <= 1.0
