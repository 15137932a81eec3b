"""Eval-engine rally prestaging: staged and lazy paths must be identical."""

import os

import numpy as np
import pytest
from PIL import Image

from tracknetv3_tpu.data.dataset import FrameCache
from tracknetv3_tpu.evaluation.test_engine import RallyTestEngine
from tracknetv3_tpu.models import get_model


@pytest.fixture()
def tiny_rally(tmp_path):
    """A minimal dataset dir with one test rally (frames + corrected csv)."""
    rng = np.random.default_rng(0)
    rally_dir = tmp_path / "test" / "match1" / "frame" / "1_00_00"
    csv_dir = tmp_path / "test" / "match1" / "corrected_csv"
    os.makedirs(rally_dir)
    os.makedirs(csv_dir)
    T = 9
    for i in range(T):
        arr = rng.integers(0, 255, (32, 64, 3), np.uint8)
        Image.fromarray(arr).save(rally_dir / f"{i}.png")
    import pandas as pd

    pd.DataFrame(
        {
            "Frame": range(T),
            "Visibility": [1] * T,
            "X": rng.integers(1, 63, T),
            "Y": rng.integers(1, 31, T),
        }
    ).to_csv(csv_dir / "1_00_00_ball.csv", index=False)
    return str(tmp_path), str(rally_dir)


def test_prestaged_equals_lazy(tiny_rally, monkeypatch):
    data_dir, rally_dir = tiny_rally
    # tiny model resolution so the 32x64 PNGs are used as-is (the full
    # 288x512 model is minutes-slow on the CPU test runner)
    import tracknetv3_tpu.data.dataset as ds
    import tracknetv3_tpu.evaluation.test_engine as te

    monkeypatch.setattr(ds, "HEIGHT", 32)
    monkeypatch.setattr(ds, "WIDTH", 64)
    monkeypatch.setattr(te, "HEIGHT", 32)
    monkeypatch.setattr(te, "WIDTH", 64)

    model, variables = get_model("TrackNet", 3, "")
    engine = RallyTestEngine(
        (model, variables), tracknet_seq_len=3, bg_mode="", eval_mode="weight",
        batch_size=4,
    )
    cache = FrameCache(data_dir, "")
    frame_ids = np.arange(9)

    lazy = engine.predict_rally_heatmap(cache, rally_dir, frame_ids)
    assert rally_dir not in engine._staged_rallies

    n = engine.prestage(data_dir, [rally_dir], cache)
    assert n == 1 and rally_dir in engine._staged_rallies
    staged = engine.predict_rally_heatmap(cache, rally_dir, frame_ids)

    for k in ("cx", "cy", "conf", "bbox"):
        np.testing.assert_array_equal(np.asarray(lazy[k]), np.asarray(staged[k]))


def test_prestage_skipped_when_inpaintnet_active(tiny_rally, monkeypatch):
    """The InpaintNet eval path never touches frames (it reads
    predicted_csv trajectories), so prestage must not upload/pin them."""
    import tracknetv3_tpu.data.dataset as ds
    import tracknetv3_tpu.evaluation.test_engine as te

    data_dir, rally_dir = tiny_rally
    monkeypatch.setattr(ds, "HEIGHT", 32)
    monkeypatch.setattr(ds, "WIDTH", 64)
    monkeypatch.setattr(te, "HEIGHT", 32)
    monkeypatch.setattr(te, "WIDTH", 64)

    tn = get_model("TrackNet", 3, "")
    inp = get_model("InpaintNet", 16, "")
    engine = RallyTestEngine(
        tn, inpaintnet=inp, tracknet_seq_len=3, bg_mode="", eval_mode="weight",
        batch_size=4,
    )
    cache = FrameCache(data_dir, "")
    assert engine.prestage(data_dir, [rally_dir], cache) == 0
    assert not engine._staged_rallies


def test_collect_program_shared_across_rally_lengths(tiny_rally, monkeypatch):
    """Rallies of different lengths (same 128-frame bucket) must reuse one
    compiled collect program - per-length keys would compile a distinct
    XLA program per rally on the seconds-to-minutes remote compiler."""
    import tracknetv3_tpu.data.dataset as ds
    import tracknetv3_tpu.evaluation.test_engine as te

    data_dir, rally_dir = tiny_rally
    monkeypatch.setattr(ds, "HEIGHT", 32)
    monkeypatch.setattr(ds, "WIDTH", 64)
    monkeypatch.setattr(te, "HEIGHT", 32)
    monkeypatch.setattr(te, "WIDTH", 64)

    model, variables = get_model("TrackNet", 3, "")
    engine = RallyTestEngine(
        (model, variables), tracknet_seq_len=3, bg_mode="", eval_mode="weight",
        batch_size=4,
    )
    cache = FrameCache(data_dir, "")
    engine.predict_rally_heatmap(cache, rally_dir, np.arange(9))
    n_programs = len(engine._jit_cache)
    # shorter rally, same Tp bucket, different chunk-valid counts (S=5 vs 7)
    engine.predict_rally_heatmap(cache, rally_dir, np.arange(7))
    assert len(engine._jit_cache) == n_programs


def test_sharded_eval_matches_single_device(tiny_rally, monkeypatch):
    """RallyTestEngine(mesh=...): window batches sharded over the 8-device
    data mesh must produce the same rally predictions as single-device."""
    import tracknetv3_tpu.data.dataset as ds
    import tracknetv3_tpu.evaluation.test_engine as te
    from tracknetv3_tpu.parallel.mesh import make_mesh

    data_dir, rally_dir = tiny_rally
    monkeypatch.setattr(ds, "HEIGHT", 32)
    monkeypatch.setattr(ds, "WIDTH", 64)
    monkeypatch.setattr(te, "HEIGHT", 32)
    monkeypatch.setattr(te, "WIDTH", 64)

    model, variables = get_model("TrackNet", 3, "")
    cache = FrameCache(data_dir, "")
    frame_ids = np.arange(9)
    preds = {}
    for mesh in (None, make_mesh(8)):
        engine = RallyTestEngine(
            (model, variables), tracknet_seq_len=3, bg_mode="",
            eval_mode="weight", batch_size=8, mesh=mesh,
        )
        preds[mesh is None] = engine.predict_rally_heatmap(
            cache, rally_dir, frame_ids
        )
    # integer outputs must agree exactly; conf inherits ~1e-5 float drift
    # from GSPMD's sharded reduction order (bf16 partial sums reassociate)
    for k in ("cx", "cy", "bbox"):
        np.testing.assert_array_equal(
            np.asarray(preds[True][k]), np.asarray(preds[False][k])
        )
    np.testing.assert_allclose(preds[True]["conf"], preds[False]["conf"], atol=1e-3)


def test_rally_overlap_matches_offline(tiny_rally, monkeypatch):
    """Carried-tail rally evaluation == forward-all-windows + offline
    ensemble + decode."""
    import jax.numpy as jnp

    import tracknetv3_tpu.data.dataset as ds
    import tracknetv3_tpu.evaluation.test_engine as te
    from tracknetv3_tpu.models.fused_forward import tracknet_fused_forward
    from tracknetv3_tpu.ops.detect import decode_heatmaps
    from tracknetv3_tpu.ops.ensemble import ensemble_offline
    from tracknetv3_tpu.ops.preprocess import gather_windows, window_channels

    data_dir, rally_dir = tiny_rally
    monkeypatch.setattr(ds, "HEIGHT", 32)
    monkeypatch.setattr(ds, "WIDTH", 64)
    monkeypatch.setattr(te, "HEIGHT", 32)
    monkeypatch.setattr(te, "WIDTH", 64)

    model, variables = get_model("TrackNet", 3, "")
    engine = RallyTestEngine(
        (model, variables), tracknet_seq_len=3, bg_mode="", eval_mode="weight",
        batch_size=4,
    )
    cache = FrameCache(data_dir, "")
    T = 9
    got = engine.predict_rally_heatmap(cache, rally_dir, np.arange(T))

    rgb, _, _ = cache.load(rally_dir)
    Tp = engine._pad_bucket(T)
    rgb = np.concatenate([rgb, np.repeat(rgb[-1:], Tp - T, axis=0)])
    L, S = 3, T - 3 + 1
    rgb_w = gather_windows(jnp.asarray(rgb, jnp.float32), jnp.arange(S), L)
    x = window_channels(rgb_w, None, None, "")
    probs = tracknet_fused_forward(engine._folded, x)
    wins = jnp.moveaxis(probs, -1, 1)
    frames = ensemble_offline(wins, engine._weights)[:T]
    dec = decode_heatmaps(frames)
    np.testing.assert_array_equal(got["cx"], np.asarray(dec["cx"]))
    np.testing.assert_array_equal(got["cy"], np.asarray(dec["cy"]))
    np.testing.assert_array_equal(got["bbox"], np.asarray(dec["bbox"]))
    np.testing.assert_allclose(got["conf"], np.asarray(dec["conf"]), rtol=1e-6)
