"""Fused on-device preprocessing: resize, background modes, window assembly.

The reference does all of this per window on the CPU inside DataLoader
workers (reference: dataset.py:416-666): PIL-open each frame, optional
median subtraction, PIL resize to 512x288, channel-stack, /255. With
sliding_step=1 every frame is decoded and resized ``seq_len`` times.

TPU-native design:
  - raw uint8 frames are shipped to the device once (4x less PCIe traffic
    than f32) and resized in one batched, separable bicubic program that
    XLA lowers to MXU matmuls;
  - each frame is resized exactly once; overlapping windows are assembled
    on device with a gather (``take``) + reshape, so stride-1 ensembling
    costs no extra preprocessing;
  - the background-subtraction quirk of the reference is reproduced
    bit-faithfully: ``sum(|frame - median|)`` is truncated to uint8 (i.e.
    taken mod 256) at the *original* resolution before resizing
    (reference: dataset.py:439, 618).

All functions are jit-compatible; ``bg_mode`` and sizes are static.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HEIGHT, WIDTH


@lru_cache(maxsize=32)
def _pil_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) PIL-compatible antialiased bicubic resampling
    matrix (Keys kernel a=-0.5, support scaled by the downscale factor and
    per-row weight normalization - the same recipe as PIL's
    precompute_coeffs, so outputs match the reference's PIL resizes)."""

    def keys(x, a=-0.5):
        x = np.abs(x)
        return np.where(
            x < 1,
            ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
        )

    scale = n_in / n_out
    fscale = max(scale, 1.0)
    support = 2.0 * fscale
    M = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), n_in)
        xs = np.arange(lo, hi)
        w = keys((xs + 0.5 - center) / fscale)
        M[i, lo:hi] = w / w.sum()
    return M.astype(np.float32)


@partial(jax.jit, static_argnames=("height", "width"))
def resize_frames(
    frames: jax.Array,
    height: int = HEIGHT,
    width: int = WIDTH,
) -> jax.Array:
    """Resize (..., H0, W0, C) frames to (..., height, width, C) in f32.

    TPU-native separable resize: two dense-matrix contractions that XLA
    maps onto the MXU, with the channel axis moved OUT of the trailing
    (lane) dimension first - a channels-last resize would use 3 of 128
    lanes. (jax.image.resize with this layout measured ~2 s per 30-frame
    chunk; this form is ~milliseconds.) The weights reproduce PIL's
    antialiased BICUBIC (reference: dataset.py:440 etc.). Output range is
    clipped to [0, 255] but NOT normalized.
    """
    h0, w0 = frames.shape[-3], frames.shape[-2]
    Rh = jnp.asarray(_pil_bicubic_matrix(h0, height))  # (height, H0)
    Rw = jnp.asarray(_pil_bicubic_matrix(w0, width))  # (width, W0)
    x = frames.astype(jnp.float32)
    x = jnp.moveaxis(x, -1, -3)  # (..., C, H0, W0)
    # precision='highest': default matmul precision lowers these f32
    # contractions to bf16 multiplies on TPU (~1 gray level of error on
    # 0..255 pixels), breaking the PIL parity this op exists to provide.
    x = jnp.einsum("hH,...HW->...hW", Rh, x, precision="highest")
    x = jnp.einsum("wW,...hW->...hw", Rw, x, precision="highest")
    x = jnp.moveaxis(x, -3, -1)  # (..., height, width, C)
    return jnp.clip(x, 0.0, 255.0)


@jax.jit
def background_diff(frames: jax.Array, median: jax.Array) -> jax.Array:
    """Reference-faithful difference image at original resolution.

    ``uint8(sum_c |frame - median|)`` - note the deliberate modulo-256
    truncation, which the trained reference models expect
    (reference: dataset.py:439: ``np.sum(np.absolute(img - median), 2)
    .astype('uint8')``).

    Args:
        frames: (..., H0, W0, 3) uint8/float.
        median: (H0, W0, 3) float median background.

    Returns:
        (..., H0, W0, 1) float32 in [0, 255].
    """
    diff = jnp.sum(
        jnp.abs(frames.astype(jnp.float32) - median.astype(jnp.float32)), axis=-1
    )
    # astype('uint8') truncates toward zero then wraps mod 256.
    diff = jnp.mod(jnp.floor(diff), 256.0)
    return diff[..., None]


def yuv420_to_rgb(flat: jax.Array, h: int, w: int) -> jax.Array:
    """Planar YUV420 frames -> (T, h, w, 3) RGB uint8, on device.

    ``flat`` is (T, h*w*3//2) uint8: per frame Y[h*w], U[h/2*w/2],
    V[h/2*w/2] as written by the native decoder's vdec_read_yuv
    (native/video_decode.cpp). Staging in YUV420 halves the H2D bytes of
    the bandwidth-bound upload path; this conversion runs inside the
    finalize program where XLA fuses it with the slab concat for free.

    BT.601 limited-range integer math (the libswscale default for
    YUV420P->RGB24, which the packed-BGR staging path uses), with
    nearest-neighbor chroma upsampling. Against an sws full-conversion
    decode of the same stream the result differs by a few LSB at chroma
    edges (sws uses a filtered chroma upconversion) - bounded by
    tests/test_native_video.py and irrelevant to the model (within codec
    noise).
    """
    T = flat.shape[0]
    y_n = h * w
    c_n = (h // 2) * (w // 2)
    y = flat[:, :y_n].reshape(T, h, w).astype(jnp.int32)
    u = flat[:, y_n : y_n + c_n].reshape(T, h // 2, w // 2).astype(jnp.int32)
    v = flat[:, y_n + c_n :].reshape(T, h // 2, w // 2).astype(jnp.int32)
    # nearest 2x chroma upsample (broadcast+reshape; no gather)
    u = jnp.broadcast_to(u[:, :, None, :, None], (T, h // 2, 2, w // 2, 2))
    u = u.reshape(T, h, w)
    v = jnp.broadcast_to(v[:, :, None, :, None], (T, h // 2, 2, w // 2, 2))
    v = v.reshape(T, h, w)
    c = 298 * (y - 16) + 128
    d = u - 128
    e = v - 128
    r = (c + 409 * e) >> 8
    g = (c - 100 * d - 208 * e) >> 8
    b = (c + 516 * d) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@jax.jit
def median_frame(frames: jax.Array) -> jax.Array:
    """Pixelwise median over the leading axis (reference: general.py:464)."""
    return jnp.median(frames.astype(jnp.float32), axis=0)


def _radix_select_u8(x: jax.Array, ks) -> list:
    """k-th smallest (0-based ranks ``ks``) of a uint8 stack along axis 0
    by MSB-first radix descent: 8 passes over the data instead of a full
    sort (the pixelwise-median hot path; a sort materializes O(T log^2 T)
    compare-exchanges, this reads the stack 8 times). Multiple ranks share
    the per-bit masking work within one fused XLA program."""
    out = []
    for k in ks:
        prefix = jnp.zeros(x.shape[1:], jnp.uint8)
        decided = jnp.zeros(x.shape[1:], jnp.uint8)  # mask of decided bits
        rank = jnp.full(x.shape[1:], jnp.int32(k))
        for bit in range(7, -1, -1):
            b = jnp.uint8(1 << bit)
            in_bucket = (x & decided) == prefix  # (T, ...) bool
            c0 = jnp.sum(in_bucket & ((x & b) == 0), axis=0).astype(jnp.int32)
            take_hi = rank >= c0
            prefix = jnp.where(take_hi, prefix | b, prefix)
            rank = jnp.where(take_hi, rank - c0, rank)
            decided = decided | b
        out.append(prefix)
    return out


@jax.jit
def median_of_u8_stack(frames_u8: jax.Array) -> jax.Array:
    """Exact ``np.median`` over the leading axis of a uint8 stack, without
    materializing an f32 copy (4x less HBM) or a full sort (radix select).

    Returns (H, W, 3) float32 - identical values to
    ``np.median(frames.astype(np.float32), axis=0)``.
    """
    T = frames_u8.shape[0]
    if T % 2 == 1:
        (m,) = _radix_select_u8(frames_u8, [T // 2])
        return m.astype(jnp.float32)
    lo, hi = _radix_select_u8(frames_u8, [T // 2 - 1, T // 2])
    return (lo.astype(jnp.float32) + hi.astype(jnp.float32)) / 2.0


@partial(jax.jit, static_argnames=("bg_mode",))
def window_channels(
    frames: jax.Array,
    diffs: Optional[jax.Array],
    median_resized: Optional[jax.Array],
    bg_mode: str = "",
) -> jax.Array:
    """Stack per-frame channels into the model input layout, normalized /255.

    Args:
        frames: (..., L, h, w, 3) resized RGB frames in [0, 255].
        diffs: (..., L, h, w, 1) resized difference frames (subtract modes).
        median_resized: (h, w, 3) resized median (concat mode).

    Returns:
        (..., h, w, C_in) float32 in [0, 1], channel order identical to the
        reference's channel-first stacking (frame-major, color-minor).
    """
    def stack(x):  # (..., L, h, w, c) -> (..., h, w, L*c)
        x = jnp.moveaxis(x, -4, -2)  # (..., h, w, L, c)
        return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))

    if bg_mode == "subtract":
        out = stack(diffs)
    elif bg_mode == "subtract_concat":
        out = stack(jnp.concatenate([frames, diffs], axis=-1))
    elif bg_mode == "concat":
        if median_resized.ndim == frames.ndim - 1:
            med = median_resized  # per-sample medians (batch dims present)
        else:
            lead = frames.shape[:-4]
            med = jnp.broadcast_to(median_resized, lead + median_resized.shape)
        out = jnp.concatenate([med, stack(frames)], axis=-1)
    elif bg_mode == "":
        out = stack(frames)
    else:
        raise ValueError(f"Invalid bg_mode: {bg_mode!r}")
    return out.astype(jnp.float32) / 255.0


@partial(jax.jit, static_argnames=("seq_len",))
def gather_windows(per_frame: jax.Array, starts: jax.Array, seq_len: int) -> jax.Array:
    """Assemble sliding windows from per-frame tensors by device gather.

    Args:
        per_frame: (T, h, w, c) per-frame data (resized frames or diffs).
        starts: (B,) int32 window start indices into the T axis.
        seq_len: L, window length.

    Returns:
        (B, L, h, w, c).
    """
    idx = starts[:, None] + jnp.arange(seq_len)[None, :]  # (B, L)
    idx = jnp.clip(idx, 0, per_frame.shape[0] - 1)
    return jnp.take(per_frame, idx, axis=0)


def make_staged_preprocessor(
    bg_mode: str, seq_len: int, bgr: bool = False, out_dtype=None
):
    """Build a jitted (buf_u8, median_resized, starts) -> model-input fn for
    frames that were ALREADY resized to model resolution on the host.

    ``buf_u8``: (T, HEIGHT, WIDTH, 3) uint8 device-resident resized frames;
    ``median_resized``: (HEIGHT, WIDTH, 3) f32 in the SAME channel order as
    ``buf_u8`` (or None); ``starts``: (B,) window start frame indices
    (clipped into range by the gather - out-of-range windows repeat the
    last frame, the reference's padding rule). With ``bgr=True`` the buffer
    holds BGR frames as decoded by cv2 and the channel flip to RGB happens
    here, on device (a static slice reversal - free), so the host skips
    cvtColor entirely.

    Semantic note vs the device-raw path (`make_window_preprocessor`): the
    background difference for the subtract modes is computed at MODEL
    resolution from resized frames, not at original resolution before the
    resize (reference: dataset.py:439 does original-res diff). The
    device-raw path keeps the reference-exact order; this staged path
    trades that for 6x less host->device traffic.
    """
    needs_diff = bg_mode in ("subtract", "subtract_concat")
    needs_rgb = bg_mode in ("", "subtract_concat", "concat")

    @jax.jit
    def run(buf_u8, median_resized, starts):
        wins = gather_windows(buf_u8, starts, seq_len)  # (B, L, h, w, 3) u8
        if bgr:
            wins = wins[..., ::-1]
            if median_resized is not None:
                median_resized = median_resized[..., ::-1]
        rgb = wins.astype(jnp.float32)
        diffs = None
        if needs_diff:
            diffs = background_diff(wins, median_resized)
        med = median_resized if bg_mode == "concat" else None
        out = window_channels(rgb if needs_rgb else None, diffs, med, bg_mode)
        # Emitting the model's compute dtype here (bf16 on TPU) halves the
        # assembled-window HBM traffic; values are computed in f32 first.
        return out.astype(out_dtype) if out_dtype is not None else out

    return run


def make_window_preprocessor(bg_mode: str, seq_len: int, hw=None):
    """Build a jitted (frames_u8, median_orig, starts) -> model-input fn.

    ``frames_u8``: (T, H0, W0, 3) uint8 device-resident raw frames covering
    the batch's span; ``median_orig``: (H0, W0, 3) f32 or None;
    ``starts``: (B,) window starts relative to frames_u8's first frame.
    ``hw`` is the target (height, width) — default the production config
    resolution. Returns (B, height, width, C_in) f32 in [0,1].

    Each unique frame is resized exactly once per call; windows share
    resized frames via gather.
    """

    height, width = hw if hw is not None else (HEIGHT, WIDTH)
    needs_diff = bg_mode in ("subtract", "subtract_concat")
    needs_rgb = bg_mode in ("", "subtract_concat", "concat")

    @jax.jit
    def run(frames_u8, median_orig, starts):
        rgb = diffs = med_resized = None
        if needs_rgb:
            rgb = resize_frames(frames_u8, height, width)
        if needs_diff:
            d = background_diff(frames_u8, median_orig)
            diffs = resize_frames(d, height, width)
        if bg_mode == "concat":
            med_resized = resize_frames(median_orig, height, width)
        rgb_w = gather_windows(rgb, starts, seq_len) if rgb is not None else None
        diff_w = gather_windows(diffs, starts, seq_len) if diffs is not None else None
        return window_channels(rgb_w, diff_w, med_resized, bg_mode)

    return run
