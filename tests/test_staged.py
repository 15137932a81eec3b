"""Staged-video inference path: carried-tail chunk loop, BGR device flip,
host-resize staging, exact u8 median.

The staged path (inference.StagedVideo / run_staged) is the production
video-predict pipeline: host-resized frames staged once, every window
forwarded exactly once with the ensemble tail carried across chunks.
These tests pin it against the straightforward whole-video computation
(forward all windows -> ensemble_offline -> decode) on a tiny model at a
monkeypatched model resolution.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tracknetv3_tpu.inference as inf
from tracknetv3_tpu.models import get_model
from tracknetv3_tpu.ops.detect import decode_heatmaps
from tracknetv3_tpu.ops.ensemble import ensemble_offline, get_ensemble_weight
from tracknetv3_tpu.ops.preprocess import make_staged_preprocessor, median_of_u8_stack
from tracknetv3_tpu.training.checkpoint import save_checkpoint

H, W = 32, 64  # tiny model resolution for CPU-speed tests
L = 3


@pytest.fixture()
def small_res():
    # Model resolution is a TrackNetPredictor parameter (input_hw) now; the
    # fixture survives as a no-op marker on tests that run at tiny shapes.
    yield


def _make_predictor(tmp_path, bg_mode="concat", eval_mode="weight", batch_size=4):
    model, variables = get_model("TrackNet", L, bg_mode)
    path = str(tmp_path / f"tn_{bg_mode or 'none'}.pt")
    save_checkpoint(
        path,
        epoch=0,
        max_val_acc=0.0,
        model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=L, bg_mode=bg_mode),
    )
    return inf.TrackNetPredictor(
        path, eval_mode=eval_mode, batch_size=batch_size, input_hw=(H, W)
    )


def _staged_from_buf(p, buf_u8, bgr=False):
    buf = jnp.asarray(buf_u8)
    median = p._median_staged(buf, None) if p.bg_mode else None
    return inf.StagedVideo(buf=buf, T=int(buf.shape[0]), median=median, bgr=bgr,
                           src_wh=(W, H))


def _offline_reference(p, staged):
    """Forward ALL windows at once -> ensemble_offline -> decode."""
    T = staged.T
    S = max(T - L + 1, 1)
    pre = make_staged_preprocessor(p.bg_mode, L, staged.bgr)
    med = staged.median if staged.median is not None else jnp.zeros((H, W, 3))
    x = pre(staged.buf, med, jnp.arange(S))
    from tracknetv3_tpu.models.fused_forward import tracknet_fused_forward

    probs = tracknet_fused_forward(p._folded, x)
    wins = jnp.moveaxis(probs, -1, 1)
    weights = jnp.asarray(get_ensemble_weight(L, p.eval_mode))
    frames = ensemble_offline(wins, weights)[:T]
    dec = decode_heatmaps(frames)
    return (
        np.asarray(dec["cx"]),
        np.asarray(dec["cy"]),
        np.asarray(dec["vis"]),
    )


@pytest.mark.parametrize("bg_mode", ["concat", "", "subtract"])
def test_run_staged_matches_offline(tmp_path, small_res, bg_mode):
    # T=23 with batch_size=4 exercises full chunks, a partial final chunk
    # (n_valid < B), and the flush tail.
    p = _make_predictor(tmp_path, bg_mode=bg_mode)
    rng = np.random.default_rng(3)
    buf = rng.integers(0, 255, (23, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    pred = p.run_staged(staged, img_scaler=(1.0, 1.0))
    cx, cy, vis = _offline_reference(p, staged)
    assert pred["Frame"] == list(range(23))
    np.testing.assert_array_equal(pred["X"], cx)
    np.testing.assert_array_equal(pred["Y"], cy)
    np.testing.assert_array_equal(pred["Visibility"], vis)


def test_run_staged_bgr_flip_equivalence(tmp_path, small_res):
    p = _make_predictor(tmp_path, bg_mode="concat")
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 255, (11, H, W, 3), np.uint8)
    pred_rgb = p.run_staged(_staged_from_buf(p, rgb, bgr=False), img_scaler=(1, 1))
    pred_bgr = p.run_staged(
        _staged_from_buf(p, rgb[..., ::-1], bgr=True), img_scaler=(1, 1)
    )
    assert pred_rgb == pred_bgr


def test_run_staged_nonoverlap_matches_offline(tmp_path, small_res):
    p = _make_predictor(tmp_path, bg_mode="concat", eval_mode="nonoverlap",
                        batch_size=2)
    rng = np.random.default_rng(5)
    T = 14  # not a multiple of L: last window repeats the final frame
    buf = rng.integers(0, 255, (T, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    pred = p.run_staged(staged, img_scaler=(1.0, 1.0))

    # direct: window starts 0, L, 2L, ... with repeat-last-frame padding
    pre = make_staged_preprocessor(p.bg_mode, L, False)
    n_win = -(-T // L)
    x = pre(staged.buf, staged.median, jnp.arange(n_win) * L)
    from tracknetv3_tpu.models.fused_forward import tracknet_fused_forward

    probs = tracknet_fused_forward(p._folded, x)
    flat = jnp.moveaxis(probs, -1, 1).reshape((-1, H, W))[:T]
    dec = decode_heatmaps(flat)
    np.testing.assert_array_equal(pred["X"], np.asarray(dec["cx"]))
    np.testing.assert_array_equal(pred["Y"], np.asarray(dec["cy"]))
    assert len(pred["Frame"]) == T


@pytest.mark.parametrize("T", [7, 8])
def test_median_of_u8_stack_exact(T):
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (T, 5, 6, 3), np.uint8)
    got = np.asarray(median_of_u8_stack(jnp.asarray(frames)))
    want = np.median(frames.astype(np.float32), axis=0)
    np.testing.assert_array_equal(got, want)


def test_median_staged_sampling(tmp_path, small_res):
    p = _make_predictor(tmp_path, bg_mode="concat")
    rng = np.random.default_rng(7)
    buf = jnp.asarray(rng.integers(0, 255, (20, H, W, 3), np.uint8))
    full = np.asarray(p._median_staged(buf, None))
    np.testing.assert_array_equal(
        full, np.median(np.asarray(buf).astype(np.float32), axis=0)
    )
    sampled = np.asarray(p._median_staged(buf, 5))
    want = np.median(np.asarray(buf)[::4][:5].astype(np.float32), axis=0)
    np.testing.assert_array_equal(sampled, want)


def test_stage_video_matches_stage_frames_host(tmp_path, small_res):
    """stage_video (BGR decode + device flip) and stage_frames_host (RGB
    in-memory) must produce identical predictions for the same video.

    Pins the cv2 decode path, which is bit-exact against an in-memory cv2
    decode; the default native libav path trades pixel-exactness for
    decode speed and is tolerance-pinned in test_native_video.py."""
    p = _make_predictor(tmp_path, bg_mode="concat")
    p.native_decode = False
    rng = np.random.default_rng(8)
    # source video at 2x model res; smooth content so mp4 is ~lossless
    T, sh, sw = 10, 2 * H, 2 * W
    base = np.zeros((sh, sw, 3), np.uint8)
    base[:, :, 1] = np.linspace(30, 200, sw, dtype=np.uint8)[None, :]
    frames = np.repeat(base[None], T, axis=0)
    for t in range(T):
        frames[t, 10 + t : 14 + t, 20 + 2 * t : 24 + 2 * t] = 255
    path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (sw, sh))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()

    staged_v = p.stage_video(path)
    assert staged_v.T == T and staged_v.bgr and staged_v.src_wh == (sw, sh)
    pred_v = p.run_staged(staged_v)

    # decode the SAME mp4 (codec-lossy) and stage the RGB frames directly
    cap = cv2.VideoCapture(path)
    decoded = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        decoded.append(f[..., ::-1])
    cap.release()
    staged_f = p.stage_frames_host(np.stack(decoded))
    assert not staged_f.bgr
    pred_f = p.run_staged(staged_f)
    assert pred_v == pred_f


def test_streaming_nonoverlap_host_resize_runs(tmp_path, small_res):
    """--large_video nonoverlap with host resize (VERDICT r1 weak item 7)."""
    p = _make_predictor(tmp_path, bg_mode="concat", eval_mode="nonoverlap",
                        batch_size=2)
    T, sh, sw = 13, 2 * H, 2 * W
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 40, (T, sh, sw, 3), np.uint8)
    path = str(tmp_path / "clip2.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (sw, sh))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()
    pred = p.predict_video_streaming(path, max_sample_num=8)
    assert pred["Frame"] == list(range(T))
    assert len(pred["X"]) == T


def test_run_staged_sharded_matches_single_device(tmp_path, small_res):
    """Multi-chip inference: chunks sharded across the 8-device data mesh
    must produce the same trajectory as the single-device run."""
    from tracknetv3_tpu.parallel.mesh import make_mesh

    p = _make_predictor(tmp_path, bg_mode="concat", batch_size=8)
    rng = np.random.default_rng(12)
    buf = rng.integers(0, 255, (29, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    pred_single = p.run_staged(staged, img_scaler=(1.0, 1.0))
    mesh = make_mesh(8)
    pred_sharded = p.run_staged(staged, img_scaler=(1.0, 1.0), mesh=mesh)
    assert pred_single == pred_sharded


def test_run_staged_sharded_bucketed(tmp_path, small_res):
    """Bucket-padded buffer + data-mesh sharding compose: the sharded
    bucketed scan (shard constraints inside lax.cond inside lax.scan) must
    match the single-device exact-length run."""
    from tracknetv3_tpu.parallel.mesh import make_mesh

    p = _make_predictor(tmp_path, bg_mode="concat", batch_size=8)
    rng = np.random.default_rng(15)
    buf = jnp.asarray(rng.integers(0, 255, (19, H, W, 3), np.uint8))
    exact = p.finalize_staged([buf], bgr=False, src_wh=(W, H))
    bucketed = p.finalize_staged([buf], bgr=False, src_wh=(W, H),
                                 bucket_frames=32)
    pred_single = p.run_staged(exact, img_scaler=(1.0, 1.0))
    pred_sharded = p.run_staged(bucketed, img_scaler=(1.0, 1.0),
                                mesh=make_mesh(8))
    assert pred_single == pred_sharded


def test_run_staged_sharded_nonoverlap(tmp_path, small_res):
    from tracknetv3_tpu.parallel.mesh import make_mesh

    p = _make_predictor(
        tmp_path, bg_mode="subtract", eval_mode="nonoverlap", batch_size=8
    )
    rng = np.random.default_rng(13)
    buf = rng.integers(0, 255, (26, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    pred_single = p.run_staged(staged, img_scaler=(1.0, 1.0))
    pred_sharded = p.run_staged(staged, img_scaler=(1.0, 1.0), mesh=make_mesh(8))
    assert pred_single == pred_sharded


def _write_clip(path, T, seed, sh=2 * H, sw=2 * W):
    rng = np.random.default_rng(seed)
    base = np.zeros((sh, sw, 3), np.uint8)
    base[:, :, 1] = np.linspace(30, 200, sw, dtype=np.uint8)[None, :]
    frames = np.repeat(base[None], T, axis=0)
    for t in range(T):
        y, x = 8 + (t % 10), 16 + 2 * (t % 20)
        frames[t, y : y + 4, x : x + 4] = 255
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (sw, sh))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()


def test_predict_videos_batch_matches_single(tmp_path, small_res):
    """Batch serving flow (predict_videos): per-video results must equal the
    single-video staged path, CSVs written per video, and the two lengths
    must share ONE bucketed scan program via bucket padding."""
    import os

    from tracknetv3_tpu.inference import predict_videos

    p = _make_predictor(tmp_path, bg_mode="concat")  # writes tn_concat.pt
    p.native_decode = False
    clips = []
    for i, T in enumerate((10, 17)):
        path = str(tmp_path / f"clip_batch{i}.mp4")
        _write_clip(path, T, seed=40 + i)
        clips.append(path)

    expected = {f: p.run_staged(p.stage_video(f)) for f in clips}

    out = str(tmp_path / "serve_out")
    results = predict_videos(
        clips,
        tracknet_file=str(tmp_path / "tn_concat.pt"),
        native_decode=False,
        bucket_quantum=24,
        save_dir=out,
        input_hw=(H, W),
        batch_size=4,
    )
    for f in clips:
        assert results[f] == expected[f], f
        name = os.path.splitext(os.path.basename(f))[0]
        csv = os.path.join(out, f"{name}_ball.csv")
        assert os.path.exists(csv)
        with open(csv) as fh:
            n_rows = sum(1 for _ in fh) - 1
        assert n_rows == len(expected[f]["Frame"])


def test_predict_videos_skips_corrupt_file(tmp_path, small_res):
    """on_error='skip': a corrupt video is reported and dropped; the rest of
    the batch completes. Default 'raise' propagates the failure."""
    from tracknetv3_tpu.inference import predict_videos

    _make_predictor(tmp_path, bg_mode="concat")  # writes tn_concat.pt
    good = str(tmp_path / "good.mp4")
    _write_clip(good, 9, seed=50)
    bad = str(tmp_path / "bad.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video at all")

    kw = dict(
        tracknet_file=str(tmp_path / "tn_concat.pt"),
        native_decode=False, bucket_quantum=16, input_hw=(H, W), batch_size=4,
    )
    results = predict_videos([bad, good], on_error="skip", **kw)
    assert good in results and bad not in results
    assert len(results[good]["Frame"]) == 9

    with pytest.raises(Exception):
        predict_videos([bad, good], **kw)  # default on_error='raise'


def test_predict_videos_wave_accounting(tmp_path, small_res):
    """The serving scheduler's videos->waves->buckets decomposition is an
    observable contract (``stats=``): a budget sized to 48 bucket-frames
    per wave must split four videos into exactly two 2-video waves, each
    holding one semaphore slot, with per-video bucket lengths recorded -
    and results must still match the single-video staged path."""
    from tracknetv3_tpu.inference import predict_videos

    p = _make_predictor(tmp_path, bg_mode="concat")
    p.native_decode = False
    clips = []
    for i, T in enumerate((10, 17, 9, 20)):
        path = str(tmp_path / f"clip_wave{i}.mp4")
        _write_clip(path, T, seed=60 + i)
        clips.append(path)
    expected = {f: p.run_staged(p.stage_video(f, bucket_frames=16))
                for f in clips}

    fb = H * W * 3
    stats = {}
    results = predict_videos(
        clips, tracknet_file="", bucket_quantum=16,
        staging_budget_bytes=2 * 48 * fb,  # wave budget = 48 bucket frames
        predictor=p, stats=stats,
    )
    assert results == expected
    assert [w["videos"] for w in stats["waves"]] == [clips[:2], clips[2:]]
    assert [w["buckets"] for w in stats["waves"]] == [[16, 32], [16, 32]]
    assert [w["slots"] for w in stats["waves"]] == [1, 1]
    assert stats["streaming"] == []

    # Predictor reuse (long-lived serving session): a second dispatch on
    # the same predictor reproduces the results bit for bit.
    stats2 = {}
    again = predict_videos(clips, tracknet_file="", bucket_quantum=16,
                           staging_budget_bytes=2 * 48 * fb,
                           predictor=p, stats=stats2)
    assert again == expected and stats2["waves"] == stats["waves"]

    # A budget admitting everything schedules ONE wave (bench.py
    # --serve_one_wave semantics: all videos stage before the first
    # dispatch) with identical results.
    stats1w = {}
    one = predict_videos(clips, tracknet_file="", bucket_quantum=16,
                         staging_budget_bytes=2 * 1000 * fb,
                         predictor=p, stats=stats1w)
    assert one == expected
    assert [w["videos"] for w in stats1w["waves"]] == [clips]
    assert stats1w["streaming"] == []


def test_predict_videos_solo_oversized_and_streaming(tmp_path, small_res):
    """A video over HALF the staging budget runs as its own 2-slot
    (unpipelined) wave; one over the FULL budget falls back to the
    bounded-memory streaming path - both recorded in stats and both still
    producing per-frame predictions."""
    from tracknetv3_tpu.inference import predict_videos

    p = _make_predictor(tmp_path, bg_mode="concat")
    p.native_decode = False
    lengths = (10, 30, 50)  # buckets 16, 32, 64 at quantum 16
    clips = []
    for i, T in enumerate(lengths):
        path = str(tmp_path / f"clip_solo{i}.mp4")
        _write_clip(path, T, seed=70 + i)
        clips.append(path)

    fb = H * W * 3
    stats = {}
    results = predict_videos(
        clips, tracknet_file="", bucket_quantum=16,
        staging_budget_bytes=40 * fb,  # wave budget 20 frames: 32 is solo
        predictor=p, stats=stats,
    )
    assert [w["videos"] for w in stats["waves"]] == [[clips[0]], [clips[1]]]
    assert [w["slots"] for w in stats["waves"]] == [1, 2]
    assert stats["streaming"] == [clips[2]]
    for f, T in zip(clips, lengths):
        assert len(results[f]["Frame"]) == T


def test_predict_videos_failing_first_video_slot_return(tmp_path, small_res):
    """A first video whose UPLOAD fails (probe passed, wave slots already
    acquired) must return its semaphore slots instead of deadlocking the
    producer, and the rest of the batch must complete with the wave
    accounting showing only the survivors."""
    from tracknetv3_tpu.inference import predict_videos

    p = _make_predictor(tmp_path, bg_mode="concat")
    p.native_decode = False
    clips = []
    for i, T in enumerate((12, 11, 13)):
        path = str(tmp_path / f"clip_fail{i}.mp4")
        _write_clip(path, T, seed=80 + i)
        clips.append(path)

    real_upload = p.upload_video_slabs

    def flaky_upload(f, *a, **kw):
        if f == clips[0]:
            raise RuntimeError("injected upload failure")
        return real_upload(f, *a, **kw)

    p.upload_video_slabs = flaky_upload
    stats = {}
    results = predict_videos(
        clips, tracknet_file="", bucket_quantum=16,
        predictor=p, stats=stats, on_error="skip",
    )
    assert clips[0] not in results
    assert sorted(results) == sorted(clips[1:])
    assert [w["videos"] for w in stats["waves"]] == [clips[1:]]
    assert len(results[clips[1]]["Frame"]) == 11

    # Same injection under the default on_error='raise' must propagate.
    with pytest.raises(RuntimeError, match="injected upload failure"):
        predict_videos(clips, tracknet_file="", bucket_quantum=16,
                       predictor=p)


def test_finalize_staged_empty_raises(tmp_path, small_res):
    """Zero decoded frames must fail with a clear error, not an
    IndexError inside jit tracing."""
    p = _make_predictor(tmp_path, bg_mode="concat")
    with pytest.raises(ValueError, match="no frames decoded"):
        p.finalize_staged([], bgr=True, src_wh=(W, H))


def test_warmup_staged_mesh_compiles_sharded_program(tmp_path, small_res):
    """warmup_staged(mesh=...) must warm the executable run_staged(mesh=...)
    uses (the sharded program is distinct from the 1-device one)."""
    from tracknetv3_tpu.parallel.mesh import make_mesh

    p = _make_predictor(tmp_path, bg_mode="concat", batch_size=8)
    rng = np.random.default_rng(15)
    buf = rng.integers(0, 255, (17, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    mesh = make_mesh(8)
    p.warmup_staged(staged, mesh=mesh)
    pred_sharded = p.run_staged(staged, img_scaler=(1.0, 1.0), mesh=mesh)
    pred_single = p.run_staged(staged, img_scaler=(1.0, 1.0))
    assert pred_single == pred_sharded


def test_streaming_steps_honor_compute_dtype(tmp_path, small_res):
    """compute_dtype=float32 must reach the streaming preresized forwards
    (they used to hardcode the default bf16, breaking f32 parity work)."""
    model, variables = get_model("TrackNet", L, "")
    path = str(tmp_path / "tn_f32.pt")
    save_checkpoint(
        path, epoch=0, max_val_acc=0.0, model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=L, bg_mode=""),
    )
    p = inf.TrackNetPredictor(
        path, eval_mode="weight", batch_size=4, compute_dtype=jnp.float32,
        input_hw=(H, W),
    )
    rgb = jnp.zeros((4 + L - 1, H, W, 3), jnp.uint8)
    folded = p._folded_device()
    jaxpr = jax.make_jaxpr(
        lambda r: p._overlap_step_preresized_impl(
            folded, r, None, None, jnp.int32(0), jnp.int32(4)
        )
    )(rgb)
    assert "bf16" not in str(jaxpr)
    rgb_n = jnp.zeros((2 * L, H, W, 3), jnp.uint8)
    jaxpr_n = jax.make_jaxpr(
        lambda r: p._nonoverlap_step_preresized_impl(folded, r, None, None)
    )(rgb_n)
    assert "bf16" not in str(jaxpr_n)


def test_inpaint_trajectory_bucket_shares_compiles(tmp_path, small_res):
    """Different trajectory lengths inside one window-count bucket must
    reuse the compiled InpaintNet program (remote compiles are minutes)."""
    model, variables = get_model("InpaintNet", 16)
    in_path = str(tmp_path / "inp.pt")
    save_checkpoint(
        in_path, epoch=0, max_val_acc=0.0, model=variables,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    _make_predictor(tmp_path, bg_mode="")  # writes the TrackNet ckpt
    p = inf.TrackNetPredictor(
        str(tmp_path / "tn_none.pt"), inpaintnet_file=in_path,
        eval_mode="weight", batch_size=4, input_hw=(H, W),
    )
    rng = np.random.default_rng(21)

    def traj(T):
        return {
            "Frame": list(range(T)),
            "X": rng.integers(1, 100, T).tolist(),
            "Y": rng.integers(10, 60, T).tolist(),
            "Visibility": [1] * T,
        }

    p.inpaint_trajectory(traj(40), (128, 72))
    p.inpaint_trajectory(traj(45), (128, 72))  # same 64-window bucket
    assert p._inpaint_overlap._cache_size() == 1


def test_run_staged_tiny_video(tmp_path, small_res):
    """T < L: one clipped window, flush emits the remaining frames."""
    p = _make_predictor(tmp_path, bg_mode="concat", batch_size=4)
    rng = np.random.default_rng(14)
    buf = rng.integers(0, 255, (2, H, W, 3), np.uint8)  # T=2 < L=3
    staged = _staged_from_buf(p, buf)
    pred = p.run_staged(staged, img_scaler=(1.0, 1.0))
    assert pred["Frame"] == [0, 1]
    assert len(pred["X"]) == 2


def test_program_cache_export_roundtrip(tmp_path, small_res):
    """AOT program cache: a second predictor (fresh jit caches) must load
    the serialized staged-scan blob and produce identical predictions
    without retracing."""
    pdir = str(tmp_path / "programs")
    p1 = _make_predictor(tmp_path, bg_mode="concat")
    p1.program_cache_dir = pdir
    rng = np.random.default_rng(31)
    buf = rng.integers(0, 255, (17, H, W, 3), np.uint8)
    staged1 = _staged_from_buf(p1, buf)
    pred1 = p1.run_staged(staged1, img_scaler=(1.0, 1.0))
    import os

    blobs = [f for f in os.listdir(pdir) if f.endswith(".jaxexp")]
    assert len(blobs) == 1, blobs

    p2 = inf.TrackNetPredictor(
        str(tmp_path / "tn_concat.pt"), eval_mode="weight", batch_size=4,
        input_hw=(H, W), program_cache_dir=pdir,
    )
    staged2 = _staged_from_buf(p2, buf)
    pred2 = p2.run_staged(staged2, img_scaler=(1.0, 1.0))
    assert pred1 == pred2
    # the loaded callable is the deserialized export, not a fresh trace
    assert ("exported", False, "scan", 17) in p2._staged_steps
    # a different video length is a different program (keyed by T)
    buf2 = rng.integers(0, 255, (13, H, W, 3), np.uint8)
    pred3 = p2.run_staged(_staged_from_buf(p2, buf2), img_scaler=(1.0, 1.0))
    assert len(pred3["Frame"]) == 13
    assert len([f for f in os.listdir(pdir) if f.endswith(".jaxexp")]) == 2

    # a cache HIT must refresh the blob's atime (the LRU prune key):
    # filesystem reads don't on noatime mounts, and without the explicit
    # touch the prune would evict hot serving blobs in creation order
    blob = os.path.join(pdir, blobs[0])
    os.utime(blob, (1000, 1000))
    p3 = inf.TrackNetPredictor(
        str(tmp_path / "tn_concat.pt"), eval_mode="weight", batch_size=4,
        input_hw=(H, W), program_cache_dir=pdir,
    )
    p3.run_staged(_staged_from_buf(p3, buf), img_scaler=(1.0, 1.0))
    assert os.stat(blob).st_atime > 1000


@pytest.mark.parametrize("eval_mode", ["weight", "nonoverlap"])
def test_run_staged_bucketed_matches_exact(tmp_path, small_res, eval_mode):
    """Bucket-padded staging (repeat-last-frame pad + traced S_real) must
    reproduce the exact-length path bit-for-bit for every video length in
    the bucket - including T < L and partial final chunks - while all
    lengths share one compiled scan program (the serving contract)."""
    p = _make_predictor(tmp_path, bg_mode="concat", eval_mode=eval_mode,
                        batch_size=4)
    # 24 pins the exact-bucket-multiple case: no padding happens, but the
    # video must still share the bucket's compiled program (s_real == S)
    for T in (2, 5, 11, 17, 24):
        rng = np.random.default_rng(100 + T)
        buf = jnp.asarray(rng.integers(0, 255, (T, H, W, 3), np.uint8))
        exact = p.finalize_staged([buf], bgr=False, src_wh=(W, H))
        bucketed = p.finalize_staged([buf], bgr=False, src_wh=(W, H),
                                     bucket_frames=24)
        assert int(bucketed.buf.shape[0]) == 24 and bucketed.T == T
        pe = p.run_staged(exact, img_scaler=(1.0, 1.0))
        pb = p.run_staged(bucketed, img_scaler=(1.0, 1.0))
        assert pe == pb, (T, eval_mode)
    if eval_mode == "weight":
        # one scan callable served every length (exact and bucketed alike:
        # the program is keyed by buffer length only, s_real is runtime)
        assert (False, "scan", None) in p._staged_steps


def test_warmup_compiles_the_exported_program(tmp_path, small_res):
    """With the AOT program cache enabled, warmup_staged must warm the SAME
    callable run_staged executes (the jit-wrapped exported call), not the
    plain jit - otherwise the first timed run pays a second full compile."""
    import os

    pdir = str(tmp_path / "programs")
    p = _make_predictor(tmp_path, bg_mode="concat")
    p.program_cache_dir = pdir
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 255, (11, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    p.warmup_staged(staged)
    # warmup routed through _acquire_scan: the exported program is cached
    # in memory AND persisted, before any run_staged call
    assert ("exported", False, "scan", 11) in p._staged_steps
    assert len([f for f in os.listdir(pdir) if f.endswith(".jaxexp")]) == 1
    warmed = p._staged_steps[("exported", False, "scan", 11)]
    # the cached callable must dispatch the BARE exported.call, not a jit
    # wrapper: dispatching jit(exported.call) re-traces the embedded
    # module through call_exported in every fresh process (measured
    # 450 s for a 480-frame video - PROFILE.md round-3 item 3)
    assert not hasattr(warmed, "lower"), "jit-wrapped exported call"
    pred = p.run_staged(staged, img_scaler=(1.0, 1.0))
    # run_staged dispatched the very object warmup compiled
    assert p._staged_steps[("exported", False, "scan", 11)] is warmed
    assert len(pred["Frame"]) == 11


def test_program_cache_bucketed_roundtrip(tmp_path, small_res):
    """The AOT program cache exports bucketed scans keyed by BUFFER length
    (traced s_real arg, keyed by buffer length): a fresh predictor must load the
    blob and reproduce the predictions."""
    import os

    pdir = str(tmp_path / "programs")
    p = _make_predictor(tmp_path, bg_mode="concat")
    p.program_cache_dir = pdir
    rng = np.random.default_rng(3)
    buf = jnp.asarray(rng.integers(0, 255, (13, H, W, 3), np.uint8))
    st = p.finalize_staged([buf], bgr=False, src_wh=(W, H), bucket_frames=16)
    pred1 = p.run_staged(st, img_scaler=(1.0, 1.0))
    blobs = [f for f in os.listdir(pdir) if f.endswith(".jaxexp")]
    assert len(blobs) == 1 and "scan" in blobs[0], blobs

    p2 = inf.TrackNetPredictor(
        str(tmp_path / "tn_concat.pt"), eval_mode="weight", batch_size=4,
        input_hw=(H, W), program_cache_dir=pdir,
    )
    st2 = p2.finalize_staged([buf], bgr=False, src_wh=(W, H), bucket_frames=16)
    pred2 = p2.run_staged(st2, img_scaler=(1.0, 1.0))
    assert pred1 == pred2
    assert ("exported", False, "scan", 16) in p2._staged_steps


def test_program_export_failure_memoized(tmp_path, small_res, monkeypatch):
    """If jax.export fails, the plain jit is memoized so later runs of the
    same video length do not re-hash checkpoints or re-attempt the export."""
    from jax import export as jax_export

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("export unavailable")

    monkeypatch.setattr(jax_export, "export", boom)
    p = _make_predictor(tmp_path, bg_mode="concat")
    p.program_cache_dir = str(tmp_path / "programs")
    rng = np.random.default_rng(9)
    buf = rng.integers(0, 255, (11, H, W, 3), np.uint8)
    staged = _staged_from_buf(p, buf)
    pred1 = p.run_staged(staged, img_scaler=(1.0, 1.0))
    pred2 = p.run_staged(_staged_from_buf(p, buf), img_scaler=(1.0, 1.0))
    assert calls["n"] == 1, "export retried despite memoized failure"
    assert pred1 == pred2


def test_program_cache_key_includes_source_digest(tmp_path, small_res, monkeypatch):
    """AOT blobs are keyed by a digest of the package's own source: editing
    or upgrading the package must invalidate old blobs automatically (a
    stale blob would silently execute the OLD traced program)."""
    p = _make_predictor(tmp_path, bg_mode="concat")
    p.program_cache_dir = str(tmp_path / "programs")
    path1 = p._program_cache_path("scan", False, 16)
    monkeypatch.setattr(inf, "_SOURCE_DIGEST", b"different-source" * 2)
    path2 = p._program_cache_path("scan", False, 16)
    assert path1 != path2
    # and the digest itself is stable within a process
    monkeypatch.setattr(inf, "_SOURCE_DIGEST", None)
    assert inf._package_source_digest() == inf._package_source_digest()


def test_predict_video_buckets_and_persists_blobs_by_default(tmp_path):
    """Single-video predict_video stages bucket-padded buffers and (when
    given a program_cache_dir, as the CLI does by default) persists the
    per-bucket AOT program blob - a fresh process then deserializes the
    program instead of retracing, matching the reference's zero
    program-acquisition cost (reference: predict.py:98-115)."""
    import os

    clip = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30, (128, 72))
    rng = np.random.default_rng(5)
    for t in range(13):
        f = rng.integers(0, 120, (72, 128, 3), np.uint8)
        f[30 : 30 + 6, 8 * t : 8 * t + 6] = 255
        vw.write(f)
    vw.release()

    model, variables = get_model("TrackNet", L, "concat")
    ckpt = str(tmp_path / "tn.pt")
    save_checkpoint(
        ckpt, epoch=0, max_val_acc=0.0, model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=L, bg_mode="concat"),
    )
    pdir = str(tmp_path / "programs")
    pred1 = inf.predict_video(
        clip, ckpt, input_hw=(H, W), batch_size=4,
        bucket_quantum=16, program_cache_dir=pdir,
    )
    assert len(pred1["Frame"]) == 13
    blobs = [f for f in os.listdir(pdir) if f.endswith(".jaxexp")]
    assert len(blobs) == 1, blobs

    # same-bucket re-run: reuses the blob (no new file), same output
    pred2 = inf.predict_video(
        clip, ckpt, input_hw=(H, W), batch_size=4,
        bucket_quantum=16, program_cache_dir=pdir,
    )
    assert pred1 == pred2
    assert [f for f in os.listdir(pdir) if f.endswith(".jaxexp")] == blobs


def test_program_blob_shared_across_same_arch_checkpoints(tmp_path, small_res):
    """Since v3 the exported scan takes the folded params as a runtime
    ARGUMENT (not embedded constants - an embedded-weights executable is
    ~72 MB, which the target runtime deserializes at ~1 MB/s, making a
    cache HIT as slow as the compile it should skip; PROFILE.md "Round-5:
    the cold-start regression"). Two checkpoints of the same architecture
    must therefore map to the SAME blob path, each producing predictions
    that track its OWN weights."""
    import os

    pdir = str(tmp_path / "programs")
    rng = np.random.default_rng(77)
    buf = rng.integers(0, 255, (11, H, W, 3), np.uint8)

    paths = []
    for i in range(2):
        model, variables = get_model("TrackNet", L, "concat")
        ck = str(tmp_path / f"tn_share_{i}.pt")
        save_checkpoint(
            ck, epoch=0, max_val_acc=0.0, model=variables,
            param_dict=dict(model_name="TrackNet", seq_len=L, bg_mode="concat"),
        )
        paths.append(ck)

    p1 = inf.TrackNetPredictor(paths[0], eval_mode="weight", batch_size=4,
                               input_hw=(H, W), program_cache_dir=pdir)
    p2 = inf.TrackNetPredictor(paths[1], eval_mode="weight", batch_size=4,
                               input_hw=(H, W), program_cache_dir=pdir)
    assert (p1._program_cache_path("scan", False, 11)
            == p2._program_cache_path("scan", False, 11))

    pred1 = p1.run_staged(_staged_from_buf(p1, buf), img_scaler=(1.0, 1.0))
    blobs = [f for f in os.listdir(pdir) if f.endswith(".jaxexp")]
    assert len(blobs) == 1, blobs
    # p2 reuses the blob but runs its OWN weights through it: the blob is
    # weightless, so its predictions must match p2's pure-jit path, and
    # no second blob may appear
    pred2 = p2.run_staged(_staged_from_buf(p2, buf), img_scaler=(1.0, 1.0))
    assert [f for f in os.listdir(pdir) if f.endswith(".jaxexp")] == blobs
    assert ("exported", False, "scan", 11) in p2._staged_steps

    p2_jit = inf.TrackNetPredictor(paths[1], eval_mode="weight", batch_size=4,
                                   input_hw=(H, W))  # no program cache: jit
    pred2_jit = p2_jit.run_staged(_staged_from_buf(p2_jit, buf),
                                  img_scaler=(1.0, 1.0))
    assert pred2 == pred2_jit
