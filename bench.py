#!/usr/bin/env python
"""End-to-end inference benchmark (real video file, decode included).

Measures 720p end-to-end FPS of the FULL predict pipeline on one chip
over a REAL mp4 (written once, cached): cv2/ffmpeg decode + host resize +
H2D staging + median background + U-Net forward + carried-tail temporal
ensemble + on-device coordinate decode + InpaintNet trajectory
rectification (gap masks, windowed conv1d, ensemble) -> per-frame
trajectory on host. This matches the reference's headline metric, which
decodes a real video and runs both models (25.11 FPS end-to-end,
/root/reference/README.md:31; /root/reference/predict.py:126-301).
``--tracknet_only`` skips the InpaintNet stage.

Methodology (VERDICT r1 items 1-2, estimator hardened per VERDICT r4
item 1):
  - staging (decode+resize+upload) runs before any device program
    executes (the fast H2D window, PROFILE.md): one untimed warm pass
    absorbs cold file-cache/lazy-init inflation, then >=5 timed passes
    with the MEDIAN reported and the per-pass spread printed;
  - buffer finalize (concat+median) is re-run after compilation and timed
    exec-only; compute passes are run ``--passes`` times and the MEDIAN is
    used (the relay's RPC latency varies run to run);
  - compilation is excluded (warm-up calls; remote compiles are cached per
    process and amortize across videos in a session);
  - the full component breakdown always goes to stderr so driver logs
    capture it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_FPS = 25.11  # reference TrackNetV3 end-to-end (README.md:31)


def _ball_path(n, h, w):
    """The shared ball trajectory (identical across clips so results on
    the 'dot' and 'hard' content are comparable frame for frame)."""
    t = np.arange(n)
    x = (w * 0.1 + w * 0.8 * t / max(n - 1, 1)).astype(int)
    y = (h * 0.6 - h * 0.4 * np.sin(np.pi * t / max(n - 1, 1))).astype(int)
    return x, y


def make_frames(n, h=720, w=1280, seed=0):
    """Synthetic 720p broadcast-like frames with a moving bright dot."""
    rng = np.random.default_rng(seed)
    bg = np.full((h, w, 3), 70, np.uint8)
    bg += rng.integers(0, 20, size=bg.shape, dtype=np.uint8)
    frames = np.repeat(bg[None], n, axis=0)
    xs, ys = _ball_path(n, h, w)
    for t in range(n):
        x, y = int(xs[t]), int(ys[t])
        frames[t, max(0, y - 4) : y + 4, max(0, x - 4) : x + 4] = 255
    return frames


def make_frames_hard(n, h=720, w=1280, seed=0):
    """Adversarial synthetic clip (VERDICT r3 weak #6): same ball
    trajectory as :func:`make_frames`, but on court-like TEXTURE
    (per-pixel noise + line markings), under a MOVING brightness
    gradient (sweeping highlight, like arena lighting/camera gain), with
    MOTION BLUR on the ball (streak along its velocity) and a dark
    OCCLUDER crossing the ball path mid-clip (a 'player' that actually
    hides the ball for a few frames, exercising visibility-gap logic).
    The moving content also defeats inter-frame mp4 compression, so the
    decode stage does real work instead of replaying static blocks."""
    rng = np.random.default_rng(seed)
    base = np.full((h, w, 3), 70, np.int16)
    base += rng.integers(0, 60, size=base.shape, dtype=np.int16)
    # court line markings: bright horizontals + verticals
    for fy in (0.35, 0.5, 0.65, 0.8):
        base[int(h * fy) : int(h * fy) + 3, int(w * 0.1) : int(w * 0.9)] = 210
    for fx in (0.1, 0.3, 0.5, 0.7, 0.9):
        base[int(h * 0.35) : int(h * 0.8), int(fx * w) : int(fx * w) + 3] = 210
    xs, ys = _ball_path(n, h, w)
    col = np.arange(w, dtype=np.float32)[None, :, None]
    frames = np.empty((n, h, w, 3), np.uint8)
    occ_w, occ_h = w // 12, h // 3
    for t in range(n):
        # sweeping brightness gradient: a 40-count sine highlight that
        # pans across the frame twice over the clip
        phase = 2 * np.pi * (col / w + 2.0 * t / max(n, 1))
        img = base + (40.0 * np.maximum(np.sin(phase), 0.0)).astype(np.int16)
        # ball with a 5-step motion-blur streak back along its velocity
        x, y = int(xs[t]), int(ys[t])
        px = int(xs[t - 1]) if t else x - 8
        py = int(ys[t - 1]) if t else y
        for s, mag in ((0.0, 255), (0.25, 220), (0.5, 190), (0.75, 160)):
            bx = int(round(x + (px - x) * s))
            by = int(round(y + (py - y) * s))
            img[max(0, by - 4) : by + 4, max(0, bx - 4) : bx + 4] = mag
        # dark occluder ('player') crossing the court right-to-left; its
        # path intersects the ball's around mid-clip, hiding it
        ox = int(w * 0.85 - w * 0.75 * t / max(n - 1, 1))
        oy = int(h * 0.45)
        img[oy : oy + occ_h, max(0, ox) : max(0, ox) + occ_w] = (30, 40, 35)
        frames[t] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def ensure_video(tmpdir, n_frames, h=720, w=1280, clip="dot"):
    """Write the synthetic benchmark video once. ``clip`` picks content:
    'dot' (static textured court + moving bright dot) or 'hard' (moving
    gradients, line markings, motion blur, occluder - see
    :func:`make_frames_hard`)."""
    import cv2

    tag = "" if clip == "dot" else f"_{clip}"
    path = os.path.join(tmpdir, f"bench_video{tag}_{n_frames}_{h}x{w}.mp4")
    if os.path.exists(path):
        cap = cv2.VideoCapture(path)
        ok = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n_frames
        cap.release()
        if ok:
            return path
    frames = (make_frames_hard if clip == "hard" else make_frames)(n_frames, h, w)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()
    return path


def get_checkpoint(tmpdir, model_name="TrackNet", seq_len=8, bg_mode="concat"):
    """A model checkpoint for benching (random weights; compute cost is
    weight-independent)."""
    path = os.path.join(
        tmpdir, f"bench_{model_name}_{seq_len}_{bg_mode or 'none'}.pt"
    )
    if not os.path.exists(path):
        # Model init runs device programs; on this relay ANY execution
        # permanently degrades the pre-execution fast H2D path that video
        # staging depends on (PROFILE.md). A fresh /tmp (as under the
        # driver) would therefore pay ~20 MB/s staging if we initialized
        # in-process. Create the checkpoint in a CPU-only subprocess so
        # the benching process never executes before staging.
        import subprocess

        code = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from tracknetv3_tpu.models import get_model\n"
            "from tracknetv3_tpu.training.checkpoint import save_checkpoint\n"
            "model, variables = get_model({name!r}, {L}, {bg!r})\n"
            "save_checkpoint({path!r}, epoch=0, max_val_acc=0.0, model=variables,\n"
            "    param_dict=dict(model_name={name!r}, seq_len={L}, bg_mode={bg!r}))\n"
        ).format(repo=os.path.dirname(os.path.abspath(__file__)), L=seq_len,
                 bg=bg_mode, path=path, name=model_name)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", code], check=True, env=env)
    return path


def run_cold_child(args):
    """Fresh-process production flow, run ONCE, timings to stdout as JSON.

    Everything a user pays from process start is inside the parent's wall
    clock: imports, checkpoint load, video decode+staging, program
    acquisition (persistent-cache load or remote compile), compute, and
    the InpaintNet stage. Order matters: staging runs before any device
    program executes (the relay's fast-H2D window, PROFILE.md)."""
    from tracknetv3_tpu.inference import TrackNetPredictor
    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    video = ensure_video("/tmp", args.frames, clip=args.clip)
    ckpt = get_checkpoint("/tmp", bg_mode=args.bg_mode)
    ckpt_in = (
        None
        if args.tracknet_only
        else get_checkpoint("/tmp", model_name="InpaintNet", seq_len=16, bg_mode="")
    )
    predictor = TrackNetPredictor(
        ckpt, ckpt_in, eval_mode=args.eval_mode, batch_size=args.batch_size,
        # AOT program blobs: reloading the serialized staged-scan skips
        # the ~minutes of Python tracing + lowering a fresh process pays
        # on a slow host (the persistent executable cache only skips the
        # XLA compile) - see inference._acquire_scan.
        program_cache_dir=(os.path.join(cache_dir, "programs") if cache_dir else None),
    )
    timings = {}
    t0 = time.time()
    staged = predictor.stage_video(video, timings=timings)
    t_stage = time.time() - t0
    t0 = time.time()
    pred = predictor.run_staged(staged)
    if predictor.inpaintnet is not None:
        pred = predictor.inpaint_trajectory(pred, staged.src_wh)
    t_run = time.time() - t0
    print(
        json.dumps(
            {
                "n": len(pred["Frame"]),
                "stage_s": round(t_stage, 3),
                "acquire_plus_run_s": round(t_run, 3),
            }
        )
    )


def run_cold(args):
    """--cold: wall-clock a FRESH process through the whole pipeline.

    The reference pays zero compile latency; a fair "beats it end-to-end
    from process start" claim must include program acquisition. Pass 1
    (untimed) warms the persistent compile cache; pass 2 is a fresh
    process timed spawn-to-exit — python+jax import, checkpoint load,
    decode+staging, cache-hit executable loads, compute, InpaintNet.
    """
    import subprocess

    ensure_video("/tmp", args.frames, clip=args.clip)
    get_checkpoint("/tmp", bg_mode=args.bg_mode)
    if not args.tracknet_only:
        get_checkpoint("/tmp", model_name="InpaintNet", seq_len=16, bg_mode="")
    from tracknetv3_tpu.native_video import probe_video

    probe_video(ensure_video("/tmp", args.frames, clip=args.clip))  # build the .so once

    child_cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--cold_child",
        f"--frames={args.frames}",
        f"--batch_size={args.batch_size}",
        f"--eval_mode={args.eval_mode}",
        f"--bg_mode={args.bg_mode}",
        f"--clip={args.clip}",
    ] + (["--tracknet_only"] if args.tracknet_only else [])

    if not args.assume_warm:
        t0 = time.time()
        warm = subprocess.run(child_cmd, capture_output=True, text=True)
        if warm.returncode != 0:
            sys.stderr.write(warm.stderr)
            raise SystemExit(f"cold-bench warm pass failed rc={warm.returncode}")
        print(
            f"# warm pass (cache-populating) took {time.time() - t0:.1f}s: "
            f"{warm.stdout.strip()}",
            file=sys.stderr,
        )

    t0 = time.time()
    cold = subprocess.run(child_cmd, capture_output=True, text=True)
    wall = time.time() - t0
    if cold.returncode != 0:
        sys.stderr.write(cold.stderr)
        raise SystemExit(f"cold-bench cold pass failed rc={cold.returncode}")
    child = json.loads(cold.stdout.strip().splitlines()[-1])
    n = child["n"]
    fps = n / wall
    print(
        f"# COLD start: {n} frames in {wall:.2f}s wall (fresh process; "
        f"in-process: stage {child['stage_s']}s, acquire+run "
        f"{child['acquire_plus_run_s']}s; remainder is python+jax import "
        f"and checkpoint load) -> {fps:.1f} FPS",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "720p COLD-start end-to-end FPS, fresh process incl. "
                "program acquisition (persistent compile cache, "
                + ("TrackNet, " if args.tracknet_only else "TrackNet+InpaintNet, ")
                + ("" if args.clip == "dot" else f"{args.clip} clip, ")
                + "1 chip)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak


def run_train_bench(args):
    """--train: TrackNet train-step throughput on the chip.

    Stages the synthetic train split device-resident (indices-only
    steps), runs the fast_bn bf16 train step at ``--train_batch`` (24:
    VERDICT r2 weak item 4 - the reference's batch 10 underfills the
    MXU), and reports ms/step + achieved TFLOP/s (FLOPs from the
    compiled executable's own cost analysis, not a hand count) + MFU
    vs the v5e bf16 peak. Timings force completion with a scalar fetch
    (block_until_ready is unreliable on this runtime - PROFILE.md).
    """
    import statistics
    import subprocess

    import numpy as np

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    data_dir = "/tmp/bench_synthdata"
    if not os.path.exists(os.path.join(data_dir, "train")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "make_synthetic_dataset.py"),
             "--out", data_dir],
            check=True, env=env,
        )

    import jax

    from tracknetv3_tpu.data.dataset import ResidentHeatmapLoader, build_split_index
    from tracknetv3_tpu.models import get_model
    from tracknetv3_tpu.training.optim import build_optimizer
    from tracknetv3_tpu.training.steps import (
        create_train_state,
        make_tracknet_train_step,
    )

    B, L, bg_mode = args.train_batch, 8, ""
    index = build_split_index(data_dir, "train", L, 1, "heatmap")
    # Stage the split BEFORE model init: any device execution (init
    # included) permanently degrades this runtime's bulk H2D path.
    loader = ResidentHeatmapLoader(
        index, bg_mode, B, shuffle=True, drop_last=True, seed=0,
        data_dir=data_dir,
    )
    batches = list(loader)
    assert batches, "synthetic train split yielded no full batches"
    model, variables = get_model("TrackNet", L, bg_mode)
    tx = build_optimizer("Adam", 1e-3)
    state = create_train_state(variables, tx)
    step = make_tracknet_train_step(
        tx, bg_mode, alpha=-1, fast_bn=True,
        # production default (config.split_up_entry): the measured winner
        # among the formulation variants (tools/probe_step_variants.py)
        split_up_entry=True,
    )
    rng = jax.random.PRNGKey(0)

    # compile + FLOP count from the executable itself
    t0 = time.time()
    lowered = step.lower(state, batches[0], rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    step_flops = float(ca.get("flops", 0.0)) if ca else 0.0
    state, loss = compiled(state, batches[0], rng)
    loss0 = float(np.asarray(loss))
    t_compile = time.time() - t0

    # timed: K chained steps per pass, ONE fetch at the end of each pass
    K = args.train_steps
    times = []
    for p in range(max(args.passes, 1)):
        t0 = time.time()
        for k in range(K):
            b = batches[(p * K + k) % len(batches)]
            state, loss = compiled(state, b, jax.random.fold_in(rng, p * K + k))
        lv = float(np.asarray(loss))  # forces the chain to completion
        times.append((time.time() - t0) / K)
    ms_step = statistics.median(times) * 1e3
    tflops = step_flops / (ms_step / 1e3) / 1e12 if step_flops else 0.0
    mfu = tflops / V5E_BF16_PEAK_TFLOPS
    print(
        f"# train step: batch {B}, fast_bn, resident; {ms_step:.1f} ms/step "
        f"(passes: {['%.1f' % (t * 1e3) for t in times]}), "
        f"{step_flops / 1e12:.2f} TFLOP/step (XLA cost analysis) -> "
        f"{tflops:.1f} TFLOP/s = {100 * mfu:.1f}% of v5e bf16 peak; "
        f"compile {t_compile:.1f}s (excluded), loss {loss0:.4f}->{lv:.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"TrackNet train-step achieved TFLOP/s "
                f"(batch {B}, resident frames, fast_bn, 1 chip)",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(mfu, 4),
                "ms_per_step": round(ms_step, 2),
            }
        )
    )


def run_serve_bench(args):
    """--serve: multi-video batch serving throughput (predict_videos flow).

    Drives the REAL serving entry point :func:`predict_videos` (VERDICT r4
    item 2 - the old bench staged one wave by hand and never exercised the
    wave scheduler): 6 videos of different lengths across >=2 frame-count
    buckets, with a staging budget sized to force >=3 pipelined waves, so
    the measurement covers everything production serving does - the
    producer thread decoding+uploading wave N+1 while the main thread
    computes wave N, bucket-padded shared scan programs (repeat-last-frame
    padding; pad chunks are skipped by lax.cond), per-wave HBM bounding by
    the semaphore, and InpaintNet rectification per video. One untimed
    warm call compiles every bucket program; the timed passes are then
    full predict_videos calls (decode + upload + compute, end to end) with
    the MEDIAN reported, and the wave accounting (videos -> waves ->
    buckets) from the scheduler's own ``stats`` is printed so the run
    proves it measured a multi-wave schedule. The reference serves one
    video per process (predict.py:71-312) - its steady state is the
    25.11 FPS single-video number with a fresh model load each time.
    """
    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    from tracknetv3_tpu.inference import TrackNetPredictor, predict_videos

    if args.quick and args.serve_lengths == "240,420,300,480,360,264":
        # CPU-runnable smoke: same 6-video / 2-bucket / 3-wave SHAPE at
        # 1/10 the frame counts (the schedule is what the smoke pins).
        args.serve_lengths, args.bucket_quantum = "24,42,30,48,36,27", 24
    lengths = [int(v) for v in args.serve_lengths.split(",")]
    videos = [ensure_video("/tmp", n, clip=args.clip) for n in lengths]
    ckpt = get_checkpoint("/tmp", bg_mode=args.bg_mode)
    ckpt_in = (
        None
        if args.tracknet_only
        else get_checkpoint("/tmp", model_name="InpaintNet", seq_len=16, bg_mode="")
    )
    predictor = TrackNetPredictor(
        ckpt, ckpt_in, eval_mode=args.eval_mode, batch_size=args.batch_size,
        # AOT blobs, exactly like production serving (predict.py
        # --video_dir): without them every fresh process re-pays
        # minutes of Python tracing + MLIR lowering PER BUCKET on this
        # 1-core host before the XLA compile cache can even help.
        program_cache_dir=(
            os.path.join(cache_dir, "programs") if cache_dir else None
        ),
    )
    Q = args.bucket_quantum
    frame_bytes = predictor.h * predictor.w * 3
    # Budget sized to the workload so the schedule HAS waves: each wave
    # gets budget/2, and we size that to ~2 mean-bucket videos, forcing
    # ceil(n/2)-ish waves (>=3 for the default 6-video set) regardless of
    # the model resolution in use.
    bucket_frames = [-(-n // Q) * Q for n in lengths]
    budget = 2 * (2 * statistics.mean(bucket_frames) + Q / 2) * frame_bytes
    if args.serve_one_wave:
        # Budget admitting the WHOLE set as one wave: every video stages
        # before the first dispatch, so no upload rides the degraded
        # post-execution H2D path - the deployment guidance in PROFILE.md
        # ("size staging_budget_bytes to admit the batch when HBM allows"),
        # measured instead of asserted. Each wave gets budget/2.
        budget = 2 * (sum(bucket_frames) + Q) * frame_bytes

    def serve_once():
        stats = {}
        res = predict_videos(
            videos,
            ckpt,
            staging_budget_bytes=budget,
            bucket_quantum=Q,
            predictor=predictor,
            stats=stats,
        )
        assert len(res) == len(videos)
        return stats

    # --- warm call: compiles every bucket's scan program + the per-length
    # InpaintNet window programs (excluded - process-cached) ---
    t0 = time.time()
    stats = serve_once()
    t_compile = time.time() - t0
    n_waves = len(stats["waves"])
    buckets = sorted({b for w in stats["waves"] for b in w["buckets"]})

    # --- timed passes: full predict_videos calls, decode included ---
    times = []
    for _ in range(max(args.passes, 1)):
        t0 = time.time()
        serve_once()
        times.append(time.time() - t0)
    t_run = statistics.median(times)

    total = sum(lengths)
    fps = total / t_run
    wave_desc = [
        (len(w["videos"]), w["slots"], w["buckets"]) for w in stats["waves"]
    ]
    print(
        f"# serve: {len(videos)} videos x {lengths} frames "
        f"({total} true frames) -> {n_waves} waves "
        f"(videos,slots,buckets per wave: {wave_desc}; "
        f"{len(stats['streaming'])} streaming fallbacks; "
        f"buckets {buckets}, quantum {Q}, "
        f"budget {budget / 2 ** 20:.0f} MiB): "
        f"warm+compile {t_compile:.1f}s (excluded), "
        f"e2e {t_run:.2f}s (passes: {['%.2f' % t for t in times]}) -> "
        f"{fps:.1f} FPS aggregate end-to-end (decode included, pipelined)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"multi-video serving aggregate e2e FPS "
                f"({len(videos)} videos, {n_waves} pipelined waves, "
                f"{len(buckets)} buckets, 1 chip)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
                "waves": n_waves,
                "buckets": buckets,
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--batch_size", type=int, default=120)
    ap.add_argument("--eval_mode", type=str, default="weight")
    ap.add_argument("--bg_mode", type=str, default="concat")
    ap.add_argument(
        "--clip", type=str, default="dot", choices=("dot", "hard"),
        help="synthetic clip content: 'dot' (static textured court + "
        "moving bright dot) or 'hard' (moving gradients, motion blur, "
        "occluder crossing the ball path - harder decode AND content)",
    )
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--staging_passes", type=int, default=5,
        help="timed staging (decode+resize+upload) passes after the one "
        "untimed warm pass; median reported (host steal on the shared "
        "1-core host makes fewer samples a coin flip - VERDICT r4)",
    )
    ap.add_argument("--quick", action="store_true", help="small run for smoke tests")
    ap.add_argument(
        "--cold",
        action="store_true",
        help="measure a FRESH process end-to-end including program "
        "acquisition (after an untimed cache-warming pass)",
    )
    ap.add_argument("--assume_warm", action="store_true",
                    help="with --cold: skip the warming pass")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the TrackNet train step (ms/step, "
                    "achieved TFLOP/s, MFU) instead of inference")
    ap.add_argument("--train_batch", type=int, default=24)
    ap.add_argument("--train_steps", type=int, default=20,
                    help="steps per timed pass in --train")
    ap.add_argument("--serve", action="store_true",
                    help="benchmark multi-video batch serving (wave staging "
                    "+ one shared bucketed program; see predict_videos)")
    ap.add_argument("--serve_one_wave", action="store_true",
                    help="size the staging budget so every video stages "
                    "as ONE wave before the first dispatch (the "
                    "HBM-permitting deployment config; default forces "
                    ">=3 waves to exercise the pipelined scheduler)")
    ap.add_argument("--serve_lengths", type=str,
                    default="240,420,300,480,360,264",
                    help="comma-separated frame counts of the serve set "
                    "(must be distinct - the synthetic videos are cached "
                    "by length); the default spans 2 buckets at the "
                    "default quantum and schedules as 3 pipelined waves")
    ap.add_argument("--bucket_quantum", type=int, default=240,
                    help="frame-count bucket granularity for --serve")
    ap.add_argument("--cold_child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument(
        "--tracknet_only",
        action="store_true",
        help="skip the InpaintNet trajectory-rectification stage (the "
        "default full pipeline matches the reference's 25.11 FPS headline, "
        "which includes it - reference README.md:31, predict.py:213-301)",
    )
    args = ap.parse_args()
    if args.quick:
        args.frames = 120
    if args.cold_child:
        return run_cold_child(args)
    if args.cold:
        return run_cold(args)
    if args.train:
        return run_train_bench(args)
    if args.serve:
        return run_serve_bench(args)

    from tracknetv3_tpu.utils.compile_cache import enable_persistent_cache

    # Persistent executable cache: later processes (and the passes below
    # on reruns) load compiled programs from disk instead of paying the
    # remote XLA compile; "compile" in the breakdown shrinks to cache-load
    # time once warm.
    enable_persistent_cache()

    from tracknetv3_tpu.inference import TrackNetPredictor

    video = ensure_video("/tmp", args.frames, clip=args.clip)
    ckpt = get_checkpoint("/tmp", bg_mode=args.bg_mode)
    ckpt_in = (
        None
        if args.tracknet_only
        else get_checkpoint("/tmp", model_name="InpaintNet", seq_len=16, bg_mode="")
    )
    predictor = TrackNetPredictor(
        ckpt, ckpt_in, eval_mode=args.eval_mode, batch_size=args.batch_size
    )

    # --- staging: decode + host resize + slab upload (program-free, rides
    # the pre-execution fast H2D path). One UNTIMED warm pass first, then
    # ``--staging_passes`` (>=5) timed passes with the MEDIAN taken:
    # rounds 2-4 showed pass 1 systematically inflated ~2x (cold file
    # cache + lazy library init - r02/r04 saw 1.5s pass-1 vs 0.7s steady
    # state), and with only 3 timed passes the median degenerated to
    # max(pass2, pass3), flipping the headline by +-70 FPS on one
    # host-steal hit (VERDICT r4 item 1). The warm pass absorbs the
    # cold-start inflation; 5+ samples make the median robust to a
    # single steal event on this shared 1-core host. ---
    # Build/load the native decoder OUTSIDE the timed loop: on a fresh
    # checkout the first open would otherwise pay the one-time g++ build
    # of native/libtrackvideo.so inside staging pass 1.
    from tracknetv3_tpu.native_video import probe_video

    probe_video(video)

    t0 = time.time()
    predictor.upload_video_slabs(video)  # untimed warm pass (cold caches)
    t_warm = time.time() - t0
    upload_times = []
    for _ in range(max(args.staging_passes, 1)):
        t0 = time.time()
        slabs, src_wh, yuv = predictor.upload_video_slabs(video)
        upload_times.append(time.time() - t0)
    t_upload = statistics.median(upload_times)

    # --- warm-up: compile finalize (concat+median) and chunk/flush programs
    # (excluded - compiles are process-cached and amortize across videos) ---
    import jax.numpy as jnp

    def probe_small(staged):
        x = staged.median if staged.median is not None else staged.buf
        np.asarray(jnp.mean(x.astype(jnp.float32)))

    t0 = time.time()
    staged = predictor.finalize_staged(slabs, bgr=True, src_wh=src_wh, yuv=yuv)
    probe_small(staged)  # compile the tiny timing probe too
    predictor.warmup_staged(staged)
    pred = predictor.run_staged(staged)
    if predictor.inpaintnet is not None:
        predictor.inpaint_trajectory(pred, src_wh)
    t_compile = time.time() - t0

    # --- finalize, exec-only (re-run against the retained slabs; forced
    # with a tiny fetch - fetching the whole median would bill ~50 ms of
    # degraded-D2H transfer that the pipeline never pays) ---
    t0 = time.time()
    staged = predictor.finalize_staged(slabs, bgr=True, src_wh=src_wh, yuv=yuv)
    probe_small(staged)
    t_finalize = time.time() - t0

    # --- timed compute passes (median of N: relay RPC latency varies).
    # The full pipeline runs the InpaintNet trajectory-rectification
    # stage too (gap-mask gen + windowed conv1d + ensemble), matching the
    # reference's headline pipeline. ---
    proc_times = []
    for _ in range(max(args.passes, 1)):
        t0 = time.time()
        pred = predictor.run_staged(staged)
        if predictor.inpaintnet is not None:
            pred = predictor.inpaint_trajectory(pred, src_wh)
        proc_times.append(time.time() - t0)
    t_proc = statistics.median(proc_times)

    n = len(pred["Frame"])
    e2e_s = t_upload + t_finalize + t_proc
    fps = n / e2e_s
    print(
        f"# {n} frames @ {src_wh[0]}x{src_wh[1]} from {os.path.basename(video)}: "
        f"decode+resize+upload {t_upload:.2f}s "
        f"(warm {t_warm:.2f}s untimed; passes: "
        f"{['%.2f' % t for t in upload_times]}, "
        f"spread {min(upload_times):.2f}-{max(upload_times):.2f}s), "
        f"finalize {t_finalize:.2f}s, "
        f"process {t_proc:.2f}s (passes: {['%.2f' % t for t in proc_times]}), "
        f"compile {t_compile:.1f}s (excluded) -> {fps:.1f} FPS e2e "
        f"(decode included), {n / t_proc:.1f} FPS compute-only "
        f"(batch {args.batch_size}, {args.eval_mode})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "720p end-to-end FPS, real mp4 decode included "
                + (
                    ("(TrackNet, " if args.tracknet_only else "(TrackNet+InpaintNet, ")
                    + (
                        "weighted ensemble"
                        if args.eval_mode == "weight"
                        else args.eval_mode
                    )
                    + ("" if args.clip == "dot" else f", {args.clip} clip")
                    + ", 1 chip)"
                ),
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
