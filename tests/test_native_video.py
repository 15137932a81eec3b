"""Native libav video decoder: parity with cv2, adaptive lowres, fallback.

The staging path decodes with native/video_decode.cpp when available
(scale+convert straight to model resolution, DCT-domain lowres on big
sources); these pin its contract against the cv2 reference path.
"""

import os

import numpy as np
import pytest

from tracknetv3_tpu.config import HEIGHT, WIDTH
from tracknetv3_tpu.native_video import open_native_video, probe_video

cv2 = pytest.importorskip("cv2")


def _write_clip(path, n=24, w=1280, h=720):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rng = np.random.default_rng(7)
    # Band-limited texture (like real video content): raw per-pixel noise
    # would amplify the bilinear-kernel difference between swscale and
    # cv2.INTER_LINEAR into aliasing noise that no real frame exhibits.
    base = rng.integers(40, 90, (h, w, 3), np.uint8)
    base = cv2.GaussianBlur(base, (9, 9), 3)
    for t in range(n):
        f = base.copy()
        x, y = 100 + 30 * t, 300 + 5 * t
        f[y : y + 12, x : x + 12] = 255
        vw.write(f)
    vw.release()
    return str(path)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return _write_clip(tmp_path_factory.mktemp("vid") / "clip.mp4")


def _native_available(clip):
    return open_native_video(clip, WIDTH, HEIGHT) is not None


def test_probe_reports_source_dims(clip):
    if not _native_available(clip):
        pytest.skip("native video decoder unavailable")
    w, h, n, fps = probe_video(clip)
    assert (w, h) == (1280, 720)
    assert n == 24
    assert abs(fps - 30.0) < 0.01


@pytest.mark.parametrize("lowres", [0, 1])
def test_decode_matches_cv2_resize(clip, lowres):
    """Decoded+scaled frames stay close to cv2's full-res decode + INTER_LINEAR
    resize (different bilinear kernels; the model input tolerance is wide)."""
    r = open_native_video(clip, WIDTH, HEIGHT, lowres=lowres, bgr=True)
    if r is None:
        pytest.skip("native video decoder unavailable")
    buf = np.empty((24, HEIGHT, WIDTH, 3), np.uint8)
    n = r.read_into(buf)
    r.close()
    assert n == 24

    cap = cv2.VideoCapture(clip)
    ref = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref.append(cv2.resize(f, (WIDTH, HEIGHT), interpolation=cv2.INTER_LINEAR))
    cap.release()
    ref = np.stack(ref)
    d = np.abs(buf[:n].astype(int) - ref.astype(int))
    assert d.mean() < 3.0
    assert np.percentile(d, 99) <= 8


def test_reads_are_batched_and_terminate(clip):
    r = open_native_video(clip, WIDTH, HEIGHT, lowres=1)
    if r is None:
        pytest.skip("native video decoder unavailable")
    total = 0
    while True:
        b = r.read_batch(7)
        if b is None:
            break
        assert b.shape[1:] == (HEIGHT, WIDTH, 3)
        total += b.shape[0]
    r.close()
    assert total == 24


def test_lowres_clamped_to_source_dims(tmp_path):
    """A source at exactly model resolution must never be decoded below it
    (upload_video_slabs picks lowres so decoded dims >= model input)."""
    small = _write_clip(tmp_path / "small.mp4", n=8, w=WIDTH, h=HEIGHT)
    r = open_native_video(small, WIDTH, HEIGHT, lowres=0)
    if r is None:
        pytest.skip("native video decoder unavailable")
    assert r.applied_lowres == 0
    buf = np.empty((8, HEIGHT, WIDTH, 3), np.uint8)
    assert r.read_into(buf) == 8
    r.close()


def test_open_missing_file_returns_none(tmp_path):
    assert open_native_video(str(tmp_path / "nope.mp4"), WIDTH, HEIGHT) is None


def test_auto_lowres_selection(clip, tmp_path):
    """lowres=-1 picks the largest DCT-domain reduction whose decoded dims
    still cover the output (720p -> 1; model-res source -> 0)."""
    r = open_native_video(clip, WIDTH, HEIGHT, lowres=-1)
    if r is None:
        pytest.skip("native video decoder unavailable")
    assert r.applied_lowres == 1
    r.close()
    small = _write_clip(tmp_path / "small.mp4", n=4, w=WIDTH, h=HEIGHT)
    r = open_native_video(small, WIDTH, HEIGHT, lowres=-1)
    assert r.applied_lowres == 0
    r.close()


def test_staging_decode_error_propagates(clip, tmp_path):
    """A video that fails to decode mid-stream must raise, not silently
    truncate the staged buffer (and the prediction CSV downstream)."""
    import os

    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.checkpoint import save_checkpoint
    from tracknetv3_tpu.inference import TrackNetPredictor

    # truncate the mp4 mid-file: the container opens (moov atom intact at
    # the end is lost for mp4v/mp4 - so instead chop INSIDE mdat after a
    # valid header region)
    data = open(clip, "rb").read()
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(data[: len(data) // 3])
    ckpt = os.path.join(tmp_path, "m.pt")
    _, variables = get_model("TrackNet", 3, "")
    save_checkpoint(
        ckpt, epoch=0, max_val_acc=0.0, model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=3, bg_mode=""),
    )
    p = TrackNetPredictor(ckpt, batch_size=4)
    try:
        slabs, _, _ = p.upload_video_slabs(str(bad), slab_frames=10)
    except (RuntimeError, FileNotFoundError):
        return  # error surfaced - the contract holds
    # Some demuxers salvage a truncated tail into a short-but-valid
    # stream; then a shorter-than-source result is legitimate EOF.
    assert sum(s.shape[0] for s in slabs) <= 24


def test_h264_decode_parity(tmp_path):
    """h264 sources (the real dataset's usual codec): lowres must
    auto-disable (h264 has no DCT-domain lowres), B-frame reordering must
    be handled, and output must match cv2's decode of the same file."""
    from tracknetv3_tpu.native_video import write_test_clip

    p = str(tmp_path / "clip_h264.mp4")
    if not write_test_clip(p, "libx264", n=24, w=1280, h=720):
        pytest.skip("libx264 encoder unavailable")
    r = open_native_video(p, WIDTH, HEIGHT, lowres=-1)
    assert r is not None
    assert r.applied_lowres == 0
    buf = np.empty((24, HEIGHT, WIDTH, 3), np.uint8)
    n = r.read_into(buf)
    r.close()
    assert n == 24

    cap = cv2.VideoCapture(p)
    ref = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref.append(cv2.resize(f, (WIDTH, HEIGHT), interpolation=cv2.INTER_LINEAR))
    cap.release()
    assert len(ref) == 24
    d = np.abs(buf[:n].astype(int) - np.stack(ref).astype(int))
    assert d.mean() < 3.0


def test_staging_native_matches_cv2_path(clip):
    """upload_video_slabs pixels agree between the native and cv2 backends
    (and both report the full-resolution source dims)."""
    import jax

    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.checkpoint import save_checkpoint
    from tracknetv3_tpu.inference import TrackNetPredictor

    ckpt = os.path.join(os.path.dirname(clip), "m.pt")
    if not os.path.exists(ckpt):
        _, variables = get_model("TrackNet", 3, "")
        save_checkpoint(
            ckpt,
            epoch=0,
            max_val_acc=0.0,
            model=variables,
            param_dict=dict(model_name="TrackNet", seq_len=3, bg_mode=""),
        )
    pred_native = TrackNetPredictor(ckpt, batch_size=4, stage_format="bgr")
    slabs_n, wh_n, _ = pred_native.upload_video_slabs(clip, slab_frames=10)
    pred_cv2 = TrackNetPredictor(ckpt, batch_size=4, native_decode=False)
    slabs_c, wh_c, _ = pred_cv2.upload_video_slabs(clip, slab_frames=10)
    assert wh_n == wh_c == (1280, 720)
    assert pred_cv2.decode_backend == "cv2"
    if pred_native.decode_backend == "cv2":
        pytest.skip("native video decoder unavailable")
    assert pred_native.decode_backend == "native-lowres1"
    a = np.concatenate([np.asarray(s) for s in slabs_n])
    b = np.concatenate([np.asarray(s) for s in slabs_c])
    assert a.shape == b.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_read_yuv_matches_bgr_read(clip):
    """vdec_read_yuv planes + the device BT.601 conversion reproduce the
    sws packed-RGB decode of the same stream to a few LSB (nearest chroma
    upsample vs sws's filtered upconversion; bounded, content-independent)."""
    if not _native_available(clip):
        pytest.skip("native video decoder unavailable")
    import jax.numpy as jnp

    from tracknetv3_tpu.ops.preprocess import yuv420_to_rgb

    r1 = open_native_video(clip, WIDTH, HEIGHT, lowres=-1, bgr=False)
    b1 = np.empty((24, HEIGHT, WIDTH, 3), np.uint8)
    n1 = r1.read_into(b1)
    r1.close()
    r2 = open_native_video(clip, WIDTH, HEIGHT, lowres=-1)
    b2 = np.empty((24, HEIGHT * WIDTH * 3 // 2), np.uint8)
    n2 = r2.read_into_yuv(b2)
    r2.close()
    assert n1 == n2 == 24
    rgb = np.asarray(yuv420_to_rgb(jnp.asarray(b2), HEIGHT, WIDTH))
    d = np.abs(rgb.astype(int) - b1.astype(int))
    assert d.mean() < 2.5
    assert d.max() <= 12


def test_stage_video_yuv_matches_bgr(clip):
    """The default (auto->yuv420) staged pipeline returns the SAME
    trajectory as the packed-BGR staging on the same clip, with the staged
    RGB buffer within a few LSB per pixel. Pins the half-bytes H2D format
    end-to-end: producer thread -> 2-D slab upload -> in-finalize
    conversion -> bgr=False downstream."""
    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.checkpoint import save_checkpoint
    from tracknetv3_tpu.inference import TrackNetPredictor

    H, W = 32, 64  # tiny model res: full-res CPU compiles take minutes
    ckpt = os.path.join(os.path.dirname(clip), "m_yuv.pt")
    if not os.path.exists(ckpt):
        _, variables = get_model("TrackNet", 3, "concat")
        save_checkpoint(
            ckpt,
            epoch=0,
            max_val_acc=0.0,
            model=variables,
            param_dict=dict(model_name="TrackNet", seq_len=3, bg_mode="concat"),
        )
    # A flat-background clip with a decisive bright square: with random
    # weights the heatmaps are near-uniform, so on textured content a
    # 1-LSB staging difference can legitimately flip the argmax between
    # near-equal peaks - that's decode sensitivity, not a staging bug.
    from tracknetv3_tpu.native_video import write_test_clip

    flat = os.path.join(os.path.dirname(clip), "flat.mp4")
    if not os.path.exists(flat) and not write_test_clip(
        flat, "mpeg4", n=24, w=256, h=128
    ):
        pytest.skip("native video encoder unavailable")

    py = TrackNetPredictor(ckpt, batch_size=4, input_hw=(H, W))
    sy = py.stage_video(flat)
    if "yuv420" not in py.decode_backend:
        pytest.skip("native video decoder unavailable")
    assert sy.bgr is False
    assert sy.buf.shape == (24, H, W, 3)
    ry = py.run_staged(sy)

    pb = TrackNetPredictor(ckpt, batch_size=4, input_hw=(H, W), stage_format="bgr")
    sb = pb.stage_video(flat)
    assert sb.bgr is True
    rb = pb.run_staged(sb)

    pix = np.abs(
        np.asarray(sy.buf, np.int32) - np.asarray(sb.buf, np.int32)[..., ::-1]
    )
    assert pix.max() <= 12
    assert list(ry["X"]) == list(rb["X"])
    assert list(ry["Y"]) == list(rb["Y"])
    assert list(ry["Visibility"]) == list(rb["Visibility"])


def _tiny_ckpt(tmp_path):
    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.checkpoint import save_checkpoint

    ckpt = os.path.join(str(tmp_path), "fmt.pt")
    _, variables = get_model("TrackNet", 3, "")
    save_checkpoint(
        ckpt, epoch=0, max_val_acc=0.0, model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=3, bg_mode=""),
    )
    return ckpt


def test_forced_yuv420_raises_when_unhonorable(clip, tmp_path):
    """stage_format='yuv420' must RAISE (not silently downgrade to packed
    BGR) when the native decoder can't serve it - a forced format that is
    ignored would invalidate A/B staging measurements without notice.
    Only 'auto' may fall back."""
    from tracknetv3_tpu.inference import TrackNetPredictor

    ckpt = _tiny_ckpt(tmp_path)
    p = TrackNetPredictor(
        ckpt, batch_size=4, stage_format="yuv420", native_decode=False
    )
    with pytest.raises(RuntimeError, match="yuv420"):
        p.upload_video_slabs(clip, slab_frames=10)

    # odd model dims can't form YUV420 planes either
    p2 = TrackNetPredictor(
        ckpt, batch_size=4, stage_format="yuv420", input_hw=(35, 64)
    )
    if not _native_available(clip):
        pytest.skip("native video decoder unavailable")
    with pytest.raises(RuntimeError, match="even"):
        p2.upload_video_slabs(clip, slab_frames=10)


def test_finalize_staged_layout_contract(clip, tmp_path):
    """finalize_staged takes the slab layout as an EXPLICIT flag (threaded
    from upload_video_slabs); a mismatch between the flag and the actual
    slab shape is an error, never a silent YUV conversion of non-YUV data."""
    import jax.numpy as jnp

    from tracknetv3_tpu.inference import TrackNetPredictor

    ckpt = _tiny_ckpt(tmp_path)
    p = TrackNetPredictor(ckpt, batch_size=4)
    packed = jnp.zeros((6, HEIGHT, WIDTH, 3), jnp.uint8)
    with pytest.raises(ValueError, match="slab layout"):
        p.finalize_staged([packed], bgr=True, src_wh=(WIDTH, HEIGHT), yuv=True)
    flat = jnp.zeros((6, HEIGHT * WIDTH * 3 // 2), jnp.uint8)
    with pytest.raises(ValueError, match="slab layout"):
        p.finalize_staged([flat], bgr=True, src_wh=(WIDTH, HEIGHT), yuv=False)
