"""Full-pipeline parity on converted reference weights (VERDICT r1 item 3).

Extends the forward-level conversion parity (test_convert_checkpoint) to
the WHOLE predict pipeline: converted TrackNet weights -> our staged
production pipeline (windowing, carried-tail weighted ensemble, device
decode) over a synthetic clip, compared against an independent
torch.functional replication of the reference pipeline (stride-1 windows,
rolling-buffer ensemble restated from test.py:640-692, exact
largest-bbox-area contour decode via decode_heatmaps_host).

Assertions:
  1. ensembled heatmaps agree across frameworks (atol 2e-4, f32),
  2. the 5-way Type assignment vs a common GT is IDENTICAL frame-by-frame
     (the metric contract: evaluation is invariant to the documented
     device-vs-contour decoder difference on this fixture),
  3. the final CSV trajectories agree wherever the two decoder rules pick
     the same blob.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402
from convert_reference_checkpoint import convert_tracknet  # noqa: E402
from test_convert_checkpoint import (  # noqa: E402
    _torch_tracknet_forward,
    _tracknet_state_dict,
)

import tracknetv3_tpu.inference as inf  # noqa: E402
from tracknetv3_tpu.evaluation.metrics import classify_detections  # noqa: E402
from tracknetv3_tpu.ops.detect import decode_heatmaps_host  # noqa: E402
from tracknetv3_tpu.ops.ensemble import get_ensemble_weight  # noqa: E402
from tracknetv3_tpu.training.checkpoint import save_checkpoint  # noqa: E402

H, W, L, T = 32, 64, 3, 18


def _reference_ensemble(window_preds: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """The reference's rolling-buffer temporal ensemble, restated directly
    from its semantics (reference: test.py:640-692): steady frames use
    weight[L-1-j] on the window at offset j; warm-up and tail frames use
    the unweighted mean over the windows seen."""
    S, L = window_preds.shape[0], window_preds.shape[1]
    T = S + L - 1
    out = np.zeros((T,) + window_preds.shape[2:], np.float32)
    for t in range(T):
        lo, hi = max(0, t - L + 1), min(t, S - 1)
        covers = [(s, t - s) for s in range(lo, hi + 1)]
        if t >= L - 1 and t < S:  # steady: all L windows cover t
            out[t] = sum(weights[L - 1 - (t - s)] * window_preds[s, j] for s, j in covers)
        else:  # warm-up / tail: unweighted mean
            out[t] = sum(window_preds[s, j] for s, j in covers) / len(covers)
    return out


@pytest.fixture()
def small_res():
    # Model resolution is a TrackNetPredictor parameter (input_hw) now; the
    # fixture survives as a no-op marker on tests that run at tiny shapes.
    yield


def _setup(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    sd = _tracknet_state_dict(L * 3, L, rng)  # bg_mode '' reference layout
    # Shape the output regime like a trained detector: Xavier-scaled convs
    # with identity BN keep activations O(1); the predictor scale/bias put
    # ~0.5% of pixels over the 0.5 threshold as sparse localized peaks
    # (raw random weights saturate half of every map over threshold, a
    # regime no decoder comparison is meaningful in).
    for k in list(sd):
        t = sd[k]
        if k.endswith("conv.weight"):
            sd[k] = t * (1.0 / (0.1 * np.sqrt(9.0 * t.shape[1])))
        elif k.endswith("bn.running_mean") or k.endswith("bn.bias"):
            sd[k] = t * 0
        elif k.endswith("bn.running_var") or k.endswith("bn.weight"):
            sd[k] = t * 0 + 1.0
    sd["predictor.weight"] = sd["predictor.weight"] * 200.0
    sd["predictor.bias"] = sd["predictor.bias"] * 0.0 - 4.0
    variables = convert_tracknet(sd)
    ckpt = str(tmp_path / "TrackNet_converted.pt")
    save_checkpoint(
        ckpt,
        epoch=0,
        max_val_acc=0.0,
        model=variables,
        param_dict=dict(model_name="TrackNet", seq_len=L, bg_mode=""),
    )
    # synthetic clip with a moving bright dot at model resolution
    frames = rng.integers(0, 60, (T, H, W, 3), np.uint8)
    for t in range(T):
        x, y = 4 + 3 * t, 6 + t
        frames[t, y : y + 3, x : x + 3] = 255
    return sd, ckpt, frames


def _torch_pipeline(sd, frames):
    """Reference predict flow in torch/numpy: windows -> forward ->
    rolling ensemble -> contour decode (exact rule)."""
    S = T - L + 1
    x = frames.astype(np.float32) / 255.0  # (T, H, W, 3)
    wins = np.stack([x[s : s + L] for s in range(S)])  # (S, L, H, W, 3)
    # channel stack frame-major color-minor -> NCHW (reference layout)
    wins = wins.transpose(0, 1, 4, 2, 3).reshape(S, L * 3, H, W)
    with torch.no_grad():
        probs = _torch_tracknet_forward(sd, torch.tensor(wins)).numpy()  # (S, L, H, W)
    weights = get_ensemble_weight(L, "weight")
    ens = _reference_ensemble(probs, weights)[:T]
    dec = decode_heatmaps_host(ens)  # exact largest-bbox-area rule
    return ens, dec


def test_pipeline_parity_on_converted_weights(tmp_path, small_res):
    sd, ckpt, frames = _setup(tmp_path)

    # --- our production pipeline (f32 for cross-framework numerics) ---
    p = inf.TrackNetPredictor(
        ckpt, eval_mode="weight", batch_size=4, compute_dtype=jnp.float32,
        input_hw=(H, W),
    )
    staged = inf.StagedVideo(
        buf=jnp.asarray(frames), T=T, median=None, bgr=False, src_wh=(W, H)
    )
    pred = p.run_staged(staged, img_scaler=(1.0, 1.0))

    # --- the reference pipeline, replicated independently in torch ---
    ens_t, dec_t = _torch_pipeline(sd, frames)

    # 1. ensembled heatmaps agree across frameworks
    from tracknetv3_tpu.models.fused_forward import (
        fold_batchnorm,
        tracknet_fused_forward,
    )
    from tracknetv3_tpu.ops.ensemble import ensemble_offline

    starts = jnp.arange(T - L + 1)
    from tracknetv3_tpu.ops.preprocess import make_staged_preprocessor

    pre = make_staged_preprocessor("", L, False)
    xj = pre(staged.buf, None, starts)
    probs_j = tracknet_fused_forward(
        fold_batchnorm(p.tracknet_vars), xj, dtype=jnp.float32
    )
    wins_j = jnp.moveaxis(probs_j, -1, 1)
    ens_j = np.asarray(
        ensemble_offline(wins_j, jnp.asarray(get_ensemble_weight(L, "weight")))
    )[:T]
    np.testing.assert_allclose(ens_j, ens_t, atol=2e-4)

    # 2. EXACT pipeline parity under the reference's decode rule: decoding
    # our ensembled heatmaps with the exact largest-bbox-area contour rule
    # must reproduce the torch pipeline frame-for-frame - coordinates,
    # visibility, and Types.
    gt_x = np.array([5 + 3 * t for t in range(T)])
    gt_y = np.array([7 + t for t in range(T)])
    gt_x[10:13] = 0  # a GT-invisible stretch exercises TN/FP2
    gt_y[10:13] = 0
    dec_ours_exact = decode_heatmaps_host(ens_j)
    np.testing.assert_array_equal(dec_ours_exact["cx"], dec_t["cx"])
    np.testing.assert_array_equal(dec_ours_exact["cy"], dec_t["cy"])
    types_exact = classify_detections(
        dec_ours_exact["cx"], dec_ours_exact["cy"], gt_x, gt_y, tolerance=4
    )
    types_ref = classify_detections(dec_t["cx"], dec_t["cy"], gt_x, gt_y, tolerance=4)
    np.testing.assert_array_equal(types_exact, types_ref)

    # 3. the production device decoder (peak-blob rule) may pick a
    # different blob on adversarial multi-blob frames (documented in
    # ops/detect.py); on this random-weight fixture the divergence must
    # stay rare and coordinate-exact wherever the blob choice agrees.
    types_ours = classify_detections(
        np.asarray(pred["X"]), np.asarray(pred["Y"]), gt_x, gt_y, tolerance=4
    )
    assert (types_ours != types_ref).mean() <= 0.1, (
        f"device-vs-contour Type divergence too high: "
        f"{(types_ours != types_ref).mean():.2f}"
    )
    ours = np.stack([pred["X"], pred["Y"]], -1).astype(np.int64)
    refs = np.stack([dec_t["cx"], dec_t["cy"]], -1).astype(np.int64)
    exact = (ours == refs).all(-1)
    near = np.abs(ours - refs).max(-1) <= 4
    assert exact.mean() >= 0.7, f"exact coordinate agreement only {exact.mean():.2f}"
    assert near.mean() >= 0.8, f"blob agreement only {near.mean():.2f}"

    # visibility convention identical (threshold-crossing existence)
    vis_ref = ((dec_t["cx"] > 0) | (dec_t["cy"] > 0)).astype(int)
    np.testing.assert_array_equal(pred["Visibility"], vis_ref)


def _inpaint_state_dict(rng):
    chans = {
        "down_1": (3, 32),
        "down_2": (32, 64),
        "down_3": (64, 128),
        "buttleneck.conv_1": (128, 256),
        "buttleneck.conv_2": (256, 256),
        "up_1": (384, 128),
        "up_2": (192, 64),
        "up_3": (96, 32),
    }
    sd = {}
    for ref, cio in chans.items():
        cin, cout = cio
        key = f"{ref}.conv" if not ref.startswith("buttleneck") else ref
        sd[f"{key}.weight"] = torch.tensor(
            rng.normal(0, 0.2, (cout, cin, 3)).astype(np.float32)
        )
        sd[f"{key}.bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
    sd["predictor.weight"] = torch.tensor(
        rng.normal(0, 0.2, (2, 32, 3)).astype(np.float32)
    )
    sd["predictor.bias"] = torch.tensor(rng.normal(0, 0.1, 2).astype(np.float32))
    return sd


def _torch_inpaint_forward(sd, coords, mask):
    import torch.nn.functional as F

    def tblock(x, ref):
        key = f"{ref}.conv" if not ref.startswith("buttleneck") else ref
        x = F.conv1d(x, sd[f"{key}.weight"], sd[f"{key}.bias"], padding="same")
        return F.leaky_relu(x, 0.01)

    xt = torch.tensor(np.concatenate([coords, mask], -1).transpose(0, 2, 1))
    x1 = tblock(xt, "down_1")
    x2 = tblock(x1, "down_2")
    x3 = tblock(x2, "down_3")
    x = tblock(tblock(x3, "buttleneck.conv_1"), "buttleneck.conv_2")
    x = tblock(torch.cat([x, x3], 1), "up_1")
    x = tblock(torch.cat([x, x2], 1), "up_2")
    x = tblock(torch.cat([x, x1], 1), "up_3")
    import torch.nn.functional as F2

    x = F2.conv1d(x, sd["predictor.weight"], sd["predictor.bias"], padding="same")
    return torch.sigmoid(x).numpy().transpose(0, 2, 1)


def test_inpaint_stage_parity_on_converted_weights(tmp_path, small_res):
    """Stage 2 (InpaintNet) pipeline parity: our inpaint_trajectory vs a
    torch replication of the reference flow (windows -> forward ->
    composite -> COOR_TH zeroing -> coordinate ensemble -> threshold ->
    int decode; reference: predict.py:239-301)."""
    from convert_reference_checkpoint import convert_inpaintnet

    from tracknetv3_tpu.config import COOR_TH
    from tracknetv3_tpu.ops.postprocess import generate_inpaint_mask

    rng = np.random.default_rng(11)
    sd_t, tn_ckpt, _ = _setup(tmp_path)
    in_sd = _inpaint_state_dict(rng)
    in_ckpt = str(tmp_path / "InpaintNet_converted.pt")
    save_checkpoint(
        in_ckpt,
        epoch=0,
        max_val_acc=0.0,
        model=convert_inpaintnet(in_sd),
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )

    # a trajectory with an occlusion gap (visible, high y on both flanks)
    w, h = 128, 72
    Tn = 40
    X = (10 + 2.5 * np.arange(Tn)).astype(int)
    Y = (20 + np.arange(Tn) % 17).astype(int)
    vis = np.ones(Tn, int)
    X[15:20] = 0
    Y[15:20] = 0
    vis[15:20] = 0
    pred = {
        "Frame": list(range(Tn)),
        "X": X.tolist(),
        "Y": Y.tolist(),
        "Visibility": vis.tolist(),
    }

    p = inf.TrackNetPredictor(
        tn_ckpt, inpaintnet_file=in_ckpt, eval_mode="weight", batch_size=4,
        compute_dtype=jnp.float32,
    )
    ours = p.inpaint_trajectory(dict(pred), (w, h))

    # --- torch replication of the reference flow ---
    th_h = h * 0.05
    mask = np.asarray(generate_inpaint_mask(pred, th_h=th_h), np.float32)
    coords = np.stack([np.asarray(X) / w, np.asarray(Y) / h], -1).astype(np.float32)
    L = 16
    S = Tn - L + 1
    cw = np.stack([coords[s : s + L] for s in range(S)])
    mw = np.stack([mask[s : s + L] for s in range(S)])[..., None]
    with torch.no_grad():
        out = _torch_inpaint_forward(in_sd, cw, mw)
    out = out * mw + cw * (1 - mw)
    th = (out[..., 0] < COOR_TH) & (out[..., 1] < COOR_TH)
    out[th] = 0.0
    ens = _reference_ensemble(out, get_ensemble_weight(L, "weight"))[:Tn]
    th = (ens[..., 0] < COOR_TH) & (ens[..., 1] < COOR_TH)
    ens[th] = 0.0
    ref_x = (ens[:, 0] * w).astype(int)
    ref_y = (ens[:, 1] * h).astype(int)

    dx = np.abs(np.asarray(ours["X"]) - ref_x)
    dy = np.abs(np.asarray(ours["Y"]) - ref_y)
    assert dx.max() <= 1 and dy.max() <= 1, (dx.max(), dy.max())
    assert ((dx == 0) & (dy == 0)).mean() >= 0.9
    ref_vis = ((ref_x != 0) | (ref_y != 0)).astype(int)
    np.testing.assert_array_equal(ours["Visibility"], ref_vis)
