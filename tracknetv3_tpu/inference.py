"""End-to-end video inference engine (the `predict` pipeline).

Reference flow (reference: predict.py): decode video -> DataLoader workers
preprocess per window -> TrackNet forward -> CPU rolling-buffer ensemble ->
per-frame cv2.findContours decode -> optional InpaintNet pass -> CSV.
Everything after the forward pass is per-frame Python, capping the
reference at ~25 FPS.

TPU-native engine: ONE jitted device program per chunk fuses
  uint8 frames -> resize/bg-mode/window assembly -> U-Net forward ->
  stateless anti-diagonal temporal ensemble -> flood-fill coordinate
  decode,
so the only host work is video decode (cv2/ffmpeg) and a few scalars of
D2H per chunk. In-memory videos are shipped to the device in a single
bulk transfer and processed against the resident buffer; streaming videos
are host-resized so only model-resolution uint8 crosses the link, with a
background prefetch thread overlapping decode and compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from .config import COOR_TH, HEIGHT, WIDTH
from .ops.detect import decode_heatmaps
from .ops.ensemble import (
    EnsembleState,
    ensemble_chunk,
    ensemble_flush,
    ensemble_init,
    ensemble_update_fn,
    get_ensemble_weight,
)
from .ops.postprocess import generate_inpaint_mask
from .ops.preprocess import (
    make_staged_preprocessor,
    make_window_preprocessor,
    median_of_u8_stack,
)
from .training.checkpoint import load_model_from_checkpoint
from .utils.io import VideoReader, write_pred_csv, write_pred_video


_SOURCE_DIGEST: Optional[bytes] = None


def _package_source_digest() -> bytes:
    """SHA-256 over every .py source file of this package (sorted relative
    path + contents), computed once per process.

    Part of the AOT program-blob key: blobs embed a fully traced program,
    so ANY source change that could alter tracing must invalidate them.
    A version string alone misses unreleased edits; hashing the source
    (~0.5 MB, a few ms once) cannot."""
    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is None:
        import hashlib
        import os

        root = os.path.dirname(os.path.abspath(__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    rel = os.path.relpath(os.path.join(dirpath, fn), root)
                    h.update(rel.encode())
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(f.read())
        _SOURCE_DIGEST = h.digest()
    return _SOURCE_DIGEST


class StagedVideo(NamedTuple):
    """A video staged on device at model resolution.

    All H2D transfers happen during staging because this runtime's bulk
    transfer path degrades ~30x once any large program has executed (see
    PROFILE.md); after staging, the chunk loop touches the host only for a
    few decoded scalars per chunk.
    """

    buf: jax.Array  # (T, HEIGHT, WIDTH, 3) uint8, model-resolution frames
    T: int
    median: Optional[jax.Array]  # (HEIGHT, WIDTH, 3) f32, same channel order
    bgr: bool  # True if buf/median are BGR as decoded (flipped on device)
    src_wh: Tuple[int, int]  # original (width, height) for coordinate scaling


class TrackNetPredictor:
    """Video -> trajectory predictor (TrackNet + optional InpaintNet)."""

    def __init__(
        self,
        tracknet_file: str,
        inpaintnet_file: Optional[str] = None,
        eval_mode: str = "weight",
        batch_size: int = 16,
        compute_dtype=None,
        native_decode: bool = True,
        input_hw: Optional[Tuple[int, int]] = None,
        program_cache_dir: Optional[str] = None,
        stage_format: str = "auto",
    ):
        # Model input resolution is a *predictor parameter* (default: the
        # production 288x512 from config). Tests and the multichip dryrun
        # pass tiny shapes here instead of patching module globals; every
        # resolution-dependent site below reads self.h/self.w.
        self.h, self.w = (int(input_hw[0]), int(input_hw[1])) if input_hw else (HEIGHT, WIDTH)
        # bf16 rides the MXU at 2x the f32 rate and is the production
        # default; f32 is for numerics work (e.g. cross-framework parity
        # against the reference's f32 torch pipeline).
        self.compute_dtype = compute_dtype if compute_dtype is not None else jnp.bfloat16
        self.tracknet, self.tracknet_vars, tn_pd = load_model_from_checkpoint(
            tracknet_file
        )
        from .models.fused_forward import fold_batchnorm

        # Inference runs the folded-BN hand-scheduled forward (same outputs
        # as the flax module to bf16 rounding, ~170x faster on this TPU
        # runtime - see models/fused_forward.py).
        self._folded = fold_batchnorm(self.tracknet_vars)
        self._folded_dev = None  # device/dtype copy, lazy: _folded_device()
        self.seq_len = int(tn_pd["seq_len"])
        self.bg_mode = tn_pd.get("bg_mode", "")
        self.eval_mode = eval_mode
        self.batch_size = int(batch_size)
        # Staging decode backend: native libav reader with adaptive
        # DCT-domain lowres when available (see upload_video_slabs),
        # cv2 otherwise. decode_backend records what the last staging used.
        self.native_decode = bool(native_decode)
        # Staging pixel format: "yuv420" uploads planar YUV420 slabs (HALF
        # the H2D bytes of packed BGR - staging is bandwidth-bound on this
        # host class; the BT.601 RGB conversion runs on device inside the
        # finalize program). "auto" selects yuv420 whenever the native
        # decoder serves the video and the model dims are even, else BGR.
        # "bgr" forces the packed path (e.g. for sws-exact pixel parity).
        if stage_format not in ("auto", "yuv420", "bgr"):
            raise ValueError(f"stage_format must be auto|yuv420|bgr: {stage_format}")
        self.stage_format = stage_format
        self.decode_backend = "unused"
        self.inpaintnet = None
        self._inpaint_vars_dev = None  # lazy device copy: _inpaint_vars_device()
        if inpaintnet_file:
            self.inpaintnet, self.inpaintnet_vars, in_pd = load_model_from_checkpoint(
                inpaintnet_file
            )
            self.inpaintnet_seq_len = int(in_pd.get("seq_len", 16))
        self._preproc = make_window_preprocessor(
            self.bg_mode, self.seq_len, hw=(self.h, self.w)
        )
        # Every jitted step takes its params as a leading runtime ARGUMENT
        # (bound here via _bind_folded/_bind_ivars) instead of closing over
        # them: closure params become embedded constants, which bloats the
        # persistent-cache executable to ~72 MB and makes a cross-process
        # cache HIT as slow as a recompile on this runtime (~1 MB/s
        # executable deserialization - PROFILE.md "Round-5: the cold-start
        # regression"). Public call signatures are unchanged.
        self._inpaint_overlap = self._bind_ivars(
            jax.jit(self._inpaint_overlap_impl)
        )
        self._inpaint_nonoverlap = self._bind_ivars(
            jax.jit(self._inpaint_nonoverlap_impl)
        )
        self._weights = jnp.asarray(
            get_ensemble_weight(
                self.seq_len, eval_mode if eval_mode != "nonoverlap" else "average"
            )
        )
        self._overlap_step = self._bind_folded(jax.jit(self._overlap_step_impl))
        self._overlap_step_resident = self._bind_folded(
            jax.jit(self._overlap_step_resident_impl)
        )
        self._overlap_step_preresized = self._bind_folded(
            jax.jit(self._overlap_step_preresized_impl)
        )
        self._nonoverlap_step = self._bind_folded(
            jax.jit(self._nonoverlap_step_impl)
        )
        self._nonoverlap_step_resident = self._bind_folded(
            jax.jit(self._nonoverlap_step_resident_impl)
        )
        self._nonoverlap_step_preresized = self._bind_folded(
            jax.jit(self._nonoverlap_step_preresized_impl)
        )
        self._staged_steps: Dict[Tuple[bool, str], object] = {}
        # AOT program cache (jax.export): on this class of host the
        # dominant cold-start cost is not XLA compilation (the persistent
        # executable cache covers that) but Python TRACING + MLIR lowering
        # of the big staged-scan program (~4 min for a 480-frame video on
        # a 1-core host). Serialized Exported blobs skip retracing
        # entirely. The model weights are a runtime ARGUMENT (see
        # _folded_device - embedding them made the cached executable so
        # large this runtime's deserializer cost as much as recompiling);
        # blobs are keyed by (param shapes, config, jax version, backend,
        # package source digest) - editing or upgrading the package
        # invalidates old blobs automatically, and checkpoints of the same
        # architecture share one blob.
        import os as _os

        self.program_cache_dir = (
            program_cache_dir
            if program_cache_dir is not None
            else _os.environ.get("TRACKNETV3_TPU_PROGRAM_CACHE") or None
        )
        self._ckpt_paths = (tracknet_file, inpaintnet_file or "")

    # ----------------------------- device steps -----------------------------

    def _bind_folded(self, jitted):
        """Prepend the device-resident folded TrackNet params to a jitted
        step whose impl takes them as its first argument (see the __init__
        comment: params-as-args keeps cached executables small)."""
        wrapper = lambda *args: jitted(self._folded_device(), *args)  # noqa: E731
        wrapper._cache_size = jitted._cache_size  # test/introspection hook
        return wrapper

    def _bind_ivars(self, jitted):
        """Same binding for the InpaintNet variables."""
        wrapper = lambda *args: jitted(self._inpaint_vars_device(), *args)  # noqa: E731
        wrapper._cache_size = jitted._cache_size
        return wrapper

    def _forward_windows(self, folded, frames_u8, median, starts):
        from .models.fused_forward import tracknet_fused_forward

        x = self._preproc(frames_u8, median, starts)
        probs = tracknet_fused_forward(folded, x, dtype=self.compute_dtype)  # (B, H, W, L)
        return jnp.moveaxis(probs, -1, 1)  # (B, L, H, W)

    def _overlap_step_impl(self, folded, frames_u8, median, t0, num_windows):
        """Stateless chunk: frames_u8 covers global frames
        [t0-L+1, t0+B+L-1) (host-clipped at the video bounds); forwards
        the B+L-1 windows, ensembles, decodes frames t0..t0+B-1."""
        L = self.seq_len
        nwin = frames_u8.shape[0] - (L - 1)  # == B + L - 1
        wins = self._forward_windows(folded, frames_u8, median, jnp.arange(nwin))
        frames = ensemble_chunk(wins, self._weights, t0, num_windows)
        return decode_heatmaps(frames)

    def _overlap_step_resident_impl(self, folded, all_frames, median, t0, num_windows):
        """Overlap chunk against a device-RESIDENT padded frame buffer.

        ``all_frames`` is front-padded with L-1 copies of frame 0 (and
        back-padded), so the chunk for output frames t0..t0+B-1 is the
        static-length slice starting at padded index t0. Per-step host->
        device traffic is zero - on this runtime bulk H2D degrades ~10x
        once large programs have executed, so the whole video is shipped
        once, up front. Output is a single packed (B, 3) array
        [cx, cy, vis] so collection is one small D2H per chunk.
        """
        L, B = self.seq_len, self.batch_size
        chunk = jax.lax.dynamic_slice_in_dim(all_frames, t0, B + 2 * L - 2, axis=0)
        nwin = B + L - 1
        wins = self._forward_windows(folded, chunk, median, jnp.arange(nwin))
        frames = ensemble_chunk(wins, self._weights, t0, num_windows)
        dec = decode_heatmaps(frames)
        return jnp.stack([dec["cx"], dec["cy"], dec["vis"]], axis=-1)

    def _pad_resident_impl(self, frames_u8, total: int):
        """Device-side padded-buffer construction (host memcpy of GBs is
        slow on a 1-core host; on device it is a single cheap program)."""
        L = self.seq_len
        T = frames_u8.shape[0]
        front = jnp.repeat(frames_u8[:1], L - 1, axis=0)
        back = jnp.repeat(frames_u8[-1:], total - (L - 1) - T, axis=0)
        return jnp.concatenate([front, frames_u8, back], axis=0)

    def _overlap_step_preresized_impl(self, folded, rgb, diff, median_resized, t0, num_windows):
        """Overlap chunk whose inputs are already model-resolution frames
        (host-resized). Used by the streaming path: shipping 288x512
        uint8 instead of raw 720p cuts per-chunk H2D ~6x (and ~190x vs
        f32 full-res), which matters on hosts with weak transfer paths."""
        from .ops.preprocess import gather_windows, window_channels

        L = self.seq_len
        nwin = rgb.shape[0] - (L - 1) if rgb is not None else diff.shape[0] - (L - 1)
        starts = jnp.arange(nwin)
        rgb_w = (
            gather_windows(rgb.astype(jnp.float32), starts, L) if rgb is not None else None
        )
        diff_w = (
            gather_windows(diff.astype(jnp.float32), starts, L)
            if diff is not None
            else None
        )
        med = (
            median_resized.astype(jnp.float32) if median_resized is not None else None
        )
        x = window_channels(rgb_w, diff_w, med, self.bg_mode)
        from .models.fused_forward import tracknet_fused_forward

        probs = tracknet_fused_forward(self._folded, x, dtype=self.compute_dtype)
        wins = jnp.moveaxis(probs, -1, 1)
        frames = ensemble_chunk(wins, self._weights, t0, num_windows)
        dec = decode_heatmaps(frames)
        return jnp.stack([dec["cx"], dec["cy"], dec["vis"]], axis=-1)

    def _nonoverlap_step_preresized_impl(self, folded, rgb, diff, median_resized):
        """Nonoverlap chunk on host-resized frames (streaming --large_video
        with eval_mode=nonoverlap; frames arrive in groups of B*L)."""
        from .ops.preprocess import gather_windows, window_channels

        L = self.seq_len
        n = (rgb if rgb is not None else diff).shape[0]
        B = n // L
        starts = jnp.arange(B) * L
        rgb_w = (
            gather_windows(rgb.astype(jnp.float32), starts, L)
            if rgb is not None
            else None
        )
        diff_w = (
            gather_windows(diff.astype(jnp.float32), starts, L)
            if diff is not None
            else None
        )
        med = (
            median_resized.astype(jnp.float32) if median_resized is not None else None
        )
        x = window_channels(rgb_w, diff_w, med, self.bg_mode)
        from .models.fused_forward import tracknet_fused_forward

        probs = tracknet_fused_forward(self._folded, x, dtype=self.compute_dtype)
        wins = jnp.moveaxis(probs, -1, 1)
        flat = wins.reshape((B * L,) + wins.shape[2:])
        dec = decode_heatmaps(flat)
        return jnp.stack([dec["cx"], dec["cy"], dec["vis"]], axis=-1)

    def _nonoverlap_step_impl(self, folded, frames_u8, median):
        L = self.seq_len
        B = frames_u8.shape[0] // L
        wins = self._forward_windows(folded, frames_u8, median, jnp.arange(B) * L)
        flat = wins.reshape((B * L,) + wins.shape[2:])
        return decode_heatmaps(flat)

    def _nonoverlap_step_resident_impl(self, folded, all_frames, median, w0, num_frames):
        """Nonoverlap chunk against a resident padded buffer: windows
        w0..w0+B-1 (start frames clipped at the video bounds like the
        reference's repeat-last-frame padding). Packed (B*L, 3) output.

        Only the chunk's B*L+L-1-frame span is handed to the
        preprocessor: gather indices are traced, so passing the whole
        buffer would resize ALL T frames per chunk (~n_chunks x redundant
        work and a full-video f32 copy in HBM)."""
        L, B = self.seq_len, self.batch_size
        starts_abs = jnp.clip(
            (w0 + jnp.arange(B)) * L, 0, jnp.maximum(num_frames - 1, 0)
        ) + (L - 1)  # account for the front padding
        base = starts_abs[0]
        span = B * L + L - 1
        # take (clamping gather), not dynamic_slice: a slice near the
        # buffer end would shift base and misalign the relative starts;
        # clamped rows land on the back padding (= last real frame),
        # matching the reference's repeat-last-frame rule.
        idx = jnp.clip(base + jnp.arange(span), 0, all_frames.shape[0] - 1)
        chunk = jnp.take(all_frames, idx, axis=0)
        wins = self._forward_windows(folded, chunk, median, starts_abs - base)
        flat = wins.reshape((B * L,) + wins.shape[2:])
        dec = decode_heatmaps(flat)
        return jnp.stack([dec["cx"], dec["cy"], dec["vis"]], axis=-1)

    # ------------------------- staged (resized) path ------------------------
    #
    # The fast production path for whole videos (VERDICT r1 item 1): frames
    # are resized to model resolution ON THE HOST during decode (cv2
    # INTER_LINEAR, 0.4 ms/frame) so only 0.44 MB/frame crosses the link
    # (6.25x less than raw 720p, the round-1 driver-variance culprit), BGR
    # is flipped to RGB on device (a free static slice, saving host
    # cvtColor), and the temporal ensemble carries its tail state across
    # chunks so every window is forwarded EXACTLY once (the stateless
    # ensemble_chunk recomputes L-1 boundary windows per chunk: +22% FLOPs
    # at B=32). Reference flow being replaced: predict.py:126-209.

    @staticmethod
    def _shard_windows(x, mesh):
        """Constrain the window axis across the data mesh; GSPMD then
        partitions the U-Net forward per chip and inserts the collectives
        the ensemble's cross-window slices need (multi-chip inference:
        chunks are batch-parallel over the same 1-D mesh as training)."""
        if mesh is None:
            return x
        from .parallel.mesh import batch_sharding

        return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))

    def _staged_scan_fn(self, bgr: bool, mesh=None):
        """The whole overlap pipeline as ONE device program: lax.scan over
        the carried-tail chunks, then flush, returning the packed
        (n_chunks*B + L-1, 3) [cx, cy, vis] rows (chunk rows + flush tail;
        the caller assembles rows[:S_real] + tail[:T_real-S_real] on host).

        A per-chunk dispatch path pays one relay round trip (~30 ms) per
        chunk program PLUS the flush/collect dispatch; at 4 chunks per
        480-frame video that is ~0.15 s of pure dispatch latency. Scanning
        inside the program makes the whole video 1 dispatch + 1 fetch.
        Chunk/window maths and ensemble semantics are identical to the
        eval engine's incremental carried-tail chunks.

        The program is deliberately shape-polymorphic in video length:
        only the BUFFER length is baked into the executable, and the real
        window count ``s_real`` is a traced scalar - chunks past it are
        skipped by lax.cond and the ensemble masks partial chunks
        (ensemble_update_fn's padded-window contract). A bucket-padded
        buffer (finalize_staged bucket_frames) therefore shares ONE
        compiled program across every video length in the bucket - the
        serving path's defense against per-length multi-minute recompiles
        - and an exact-length buffer is just the s_real == S special case
        of the same program."""
        key = (bgr, "scan", mesh)
        if key not in self._staged_steps:
            impl = self._staged_scan_impl(bgr, mesh)
            jitted = jax.jit(impl)
            self._staged_steps[key] = (
                lambda buf, med, state, s_real: jitted(
                    self._folded_device(), buf, med, state, s_real
                )
            )
        return self._staged_steps[key]

    def _folded_device(self):
        """The folded-BN TrackNet params as a device-resident tree in the
        compute dtype, uploaded once (lazily, AFTER staging has had its
        shot at the fast H2D window - predictor __init__ must stay free of
        device work, see bench.py's subprocess checkpoint rationale).

        Passed as a runtime ARGUMENT to the staged scan rather than being
        closed over: embedded-constant weights made the exported program's
        compiled executable ~72 MB, and this runtime deserializes cached
        executables at ~1 MB/s, so a persistent-cache HIT cost as much as
        the remote compile it was supposed to skip (measured: 74 s hit vs
        31 s fresh compile on the tiny-shape scan; 198-254 s on the
        480-frame program). Weights-as-args shrinks the executable to the
        program alone (~2 MB, seconds to load) and lets checkpoints of the
        same architecture share one blob. The f32->compute-dtype cast here
        is the same cast the traced-constant path performed at lowering
        time, so outputs are bit-identical (parity-pinned)."""
        if self._folded_dev is None:
            dt = self.compute_dtype
            self._folded_dev = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dt), self._folded
            )
        return self._folded_dev

    def _staged_scan_impl(self, bgr: bool, mesh=None):
        """Raw 5-arg scan body (folded params first) shared by the jit
        path (_staged_scan_fn) and the jax.export path (_acquire_scan)."""
        key = (bgr, "scan_impl", mesh)
        if key not in self._staged_steps:
            pre = make_staged_preprocessor(
                self.bg_mode, self.seq_len, bgr, out_dtype=self.compute_dtype
            )
            L, B = self.seq_len, self.batch_size

            def impl(folded, buf, med, state, s_real):
                from .models.fused_forward import tracknet_fused_forward

                T_b = buf.shape[0]
                S_b = max(T_b - L + 1, 1)
                n_chunks = -(-S_b // B)

                def body(st, k):
                    w0 = k * B

                    def run(st):
                        nv = jnp.clip(s_real - w0, 0, B)
                        x = self._shard_windows(
                            pre(buf, med, w0 + jnp.arange(B)), mesh
                        )
                        probs = tracknet_fused_forward(
                            folded, x, dtype=self.compute_dtype
                        )
                        wp = jnp.moveaxis(probs, -1, 1).astype(jnp.float32)
                        st, frames = ensemble_update_fn(
                            st, wp, self._weights, nv
                        )
                        dec = decode_heatmaps(frames)
                        return st, jnp.stack(
                            [dec["cx"], dec["cy"], dec["vis"]], axis=-1
                        ).astype(jnp.int32)

                    def skip(st):
                        # chunk entirely past the real windows: lax.cond is
                        # real control flow on TPU, so pad chunks cost no
                        # forward FLOPs (only the partial chunk pays waste)
                        return st, jnp.zeros((B, 3), jnp.int32)

                    return jax.lax.cond(w0 < s_real, run, skip, st)

                state, packs = jax.lax.scan(
                    body, state, jnp.arange(n_chunks, dtype=jnp.int32)
                )
                rows = packs.reshape(n_chunks * B, 3)
                d = decode_heatmaps(ensemble_flush(state))
                tail = jnp.stack(
                    [d["cx"], d["cy"], d["vis"]], axis=-1
                ).astype(jnp.int32)
                return jnp.concatenate([rows, tail], axis=0)

            # no donation: the scan returns only packed rows (the state
            # dies inside the program), so the donated f32 ensemble tail
            # could never alias an output - XLA just warned every run
            self._staged_steps[key] = impl
        return self._staged_steps[key]

    def _staged_step_nonoverlap(self, bgr: bool, mesh=None):
        key = (bgr, "nonoverlap", mesh)
        if key not in self._staged_steps:
            pre = make_staged_preprocessor(
                self.bg_mode, self.seq_len, bgr, out_dtype=self.compute_dtype
            )
            L, B = self.seq_len, self.batch_size

            def impl(buf, med, w0):
                from .models.fused_forward import tracknet_fused_forward

                starts = (w0 + jnp.arange(B)) * L
                x = self._shard_windows(pre(buf, med, starts), mesh)
                probs = tracknet_fused_forward(self._folded, x, dtype=self.compute_dtype)
                wins = jnp.moveaxis(probs, -1, 1)  # (B, L, h, w)
                flat = wins.reshape((B * L,) + wins.shape[2:])
                dec = decode_heatmaps(flat)
                return jnp.stack([dec["cx"], dec["cy"], dec["vis"]], axis=-1)

            self._staged_steps[key] = jax.jit(impl)
        return self._staged_steps[key]

    def _median_staged(self, buf, max_sample_num: Optional[int]):
        """Exact-np.median background from staged frames, on device.

        Default (None) medians over ALL frames like the reference's
        in-memory path (reference: predict.py:128-131); a memory guard caps
        the sorted stack at 4096 model-resolution frames (~1.8 GB)."""
        return self._median_staged_traced(buf, int(buf.shape[0]), max_sample_num)

    @staticmethod
    def _median_staged_traced(buf, T: int, max_sample_num: Optional[int]):
        """Trace-compatible body of _median_staged (T passed statically)."""
        k = T if max_sample_num is None else min(int(max_sample_num), T)
        k = min(k, 4096)
        if k == T:
            return median_of_u8_stack(buf)
        step = max(T // k, 1)
        idx = jnp.arange(0, T, step)[:k]
        return median_of_u8_stack(jnp.take(buf, idx, axis=0))

    def upload_video_slabs(
        self, video_file: str, slab_frames: int = 120
    ) -> Tuple[List[jax.Array], Tuple[int, int], bool]:
        """Decode + host-resize + upload a video (the program-free phase).

        A producer thread decodes and resizes (BGR kept - the RGB flip
        happens on device for free); the main thread ships each slab with
        ``device_put`` - both the native decode call and the RPC release
        the GIL, so decode and upload overlap on a single core. Runs NO
        device program, so it rides the fast H2D path as long as nothing
        has executed yet. Returns (device slabs, source (w, h), yuv) -
        ``yuv`` says whether the slabs are flat planar-YUV420 rows (pass
        it through to ``finalize_staged``; the slab layout is an explicit
        contract, not inferred from ndim).

        Decode prefers the native libav reader (native_video.py), which
        converts straight to model resolution and - when the source is
        large enough that the decoded frames still cover the model input -
        decodes at DCT-domain half resolution (mpeg4-family ``lowres``),
        ~1.7x faster than cv2's full-res YUV->BGR + resize. Falls back to
        cv2 when the native library or codec support is unavailable."""
        from .native_video import open_native_video

        q: "queue.Queue" = queue.Queue(maxsize=8)
        SENTINEL = object()
        # Producer-thread failures must reach the caller: a swallowed
        # decode error would silently truncate the staged video (and the
        # prediction CSV with it).
        producer_err: List[BaseException] = []

        H, W = self.h, self.w
        reader = (
            open_native_video(video_file, W, H, lowres=-1, bgr=True)
            if self.native_decode
            else None
        )

        use_yuv = (
            reader is not None
            and self.stage_format in ("auto", "yuv420")
            and H % 2 == 0
            and W % 2 == 0
        )
        if self.stage_format == "yuv420" and not use_yuv:
            # An explicitly forced format must not silently downgrade to
            # packed BGR (it would invalidate A/B staging measurements
            # without notice); only "auto" may fall back.
            reason = (
                "the native decoder is unavailable for this video"
                if reader is None
                else f"model dims {H}x{W} are not even"
            )
            raise RuntimeError(
                f"stage_format='yuv420' cannot be honored: {reason}; use "
                "stage_format='auto' to allow packed-BGR fallback"
            )
        if reader is not None:
            w, h = reader.src_w, reader.src_h
            self.decode_backend = f"native-lowres{reader.applied_lowres}" + (
                "+yuv420" if use_yuv else ""
            )

            def producer():
                try:
                    while True:
                        if use_yuv:
                            # planar YUV420 slabs: half the upload bytes;
                            # device converts in the finalize program
                            buf = np.empty(
                                (slab_frames, H * W * 3 // 2), np.uint8
                            )
                            n = reader.read_into_yuv(buf)  # releases the GIL
                        else:
                            buf = np.empty((slab_frames, H, W, 3), np.uint8)
                            n = reader.read_into(buf)  # releases the GIL
                        if n <= 0:
                            break
                        q.put(buf[:n])
                    reader.close()
                except BaseException as e:  # noqa: BLE001 - re-raised below
                    producer_err.append(e)
                finally:
                    q.put(SENTINEL)

        else:
            import cv2

            cap = cv2.VideoCapture(video_file)
            if not cap.isOpened():
                raise FileNotFoundError(video_file)
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self.decode_backend = "cv2"

            def producer():
                # NOTE: cv2.resize(dst=slab_view) measures 2x SLOWER than
                # fresh-allocation resize + np.stack on this host; keep the
                # simple append form. grab+retrieve(dst) reuses one decode
                # buffer (~0.15 ms/frame cheaper than read()).
                try:
                    frame = np.empty((h, w, 3), np.uint8)
                    buf: List[np.ndarray] = []
                    while cap.grab():
                        ok, f = cap.retrieve(frame)
                        if not ok:
                            break
                        buf.append(
                            cv2.resize(
                                f, (W, H), interpolation=cv2.INTER_LINEAR
                            )
                        )
                        if len(buf) == slab_frames:
                            q.put(np.stack(buf))
                            buf = []
                    if buf:
                        q.put(np.stack(buf))
                    cap.release()
                except BaseException as e:  # noqa: BLE001 - re-raised below
                    producer_err.append(e)
                finally:
                    q.put(SENTINEL)

        threading.Thread(target=producer, daemon=True).start()
        slabs = []
        while True:
            s = q.get()
            if s is SENTINEL:
                break
            slabs.append(jax.device_put(s))
        if producer_err:
            raise RuntimeError(
                f"video decode failed mid-stream: {video_file}"
            ) from producer_err[0]
        for s in slabs:
            jax.block_until_ready(s)
        return slabs, (w, h), use_yuv

    def stage_video(
        self,
        video_file: str,
        max_sample_num: Optional[int] = None,
        slab_frames: int = 120,
        timings: Optional[Dict[str, float]] = None,
        bucket_frames: Optional[int] = None,
    ) -> StagedVideo:
        """Decode + host-resize + upload + finalize a video for run_staged.

        MUST run before any device program executes to ride the fast H2D
        path. The buffer concat + median (small device programs) run at
        the end; components are reported in ``timings`` if given."""
        import time

        t0 = time.time()
        slabs, src_wh, yuv = self.upload_video_slabs(video_file, slab_frames)
        t_upload = time.time() - t0

        t0 = time.time()
        staged = self.finalize_staged(slabs, bgr=True, src_wh=src_wh,
                                      max_sample_num=max_sample_num,
                                      bucket_frames=bucket_frames, yuv=yuv)
        if timings is not None:
            timings["upload_s"] = t_upload
            timings["finalize_s"] = time.time() - t0
        return staged

    def stage_frames_host(
        self,
        frames: np.ndarray,
        max_sample_num: Optional[int] = None,
        slab_frames: int = 120,
    ) -> StagedVideo:
        """Stage in-memory RGB uint8 frames via host resize + slab upload."""
        import cv2

        T, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        slabs = []
        for lo in range(0, T, slab_frames):
            part = frames[lo : lo + slab_frames]
            resized = np.stack(
                [
                    cv2.resize(f, (self.w, self.h), interpolation=cv2.INTER_LINEAR)
                    for f in part
                ]
            )
            slabs.append(jax.device_put(resized))
        return self.finalize_staged(
            slabs, bgr=False, src_wh=(w, h), max_sample_num=max_sample_num
        )

    def _finalize_fn(self, T: int, max_sample_num, bucket: Optional[int] = None,
                     yuv: bool = False):
        """Cached fused concat+median(+bucket-pad) program (one dispatch per
        finalize; every extra dispatch costs a relay round trip).

        With ``bucket`` the buffer is padded to that length with repeats of
        the last frame - the same contents window gathers produce by
        clipping indices at T-1, so padded and unpadded buffers yield
        bit-identical window inputs. The median is computed from the REAL
        frames before padding (pad repeats would skew it)."""
        key = ("finalize", T, max_sample_num, bool(self.bg_mode), bucket, yuv)
        if key not in self._staged_steps:
            with_median = bool(self.bg_mode)
            h, w = self.h, self.w

            @jax.jit
            def fin(parts):
                buf = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
                if yuv:
                    # planar-YUV420 staging (half the H2D bytes): BT.601
                    # conversion fuses into this program for free
                    from .ops.preprocess import yuv420_to_rgb

                    buf = yuv420_to_rgb(buf, h, w)
                med = (
                    self._median_staged_traced(buf, T, max_sample_num)
                    if with_median
                    else None
                )
                if bucket is not None and bucket > T:
                    pad = jnp.broadcast_to(buf[-1:], (bucket - T,) + buf.shape[1:])
                    buf = jnp.concatenate([buf, pad], axis=0)
                return buf, med

            self._staged_steps[key] = fin
        return self._staged_steps[key]

    def finalize_staged(self, slabs, bgr, src_wh, max_sample_num=None,
                        bucket_frames: Optional[int] = None,
                        yuv: bool = False):
        """Concat uploaded slabs into the resident buffer + device median.

        ``bucket_frames`` rounds the buffer length up to the next multiple
        (repeat-last-frame padding) so videos of different lengths share
        ONE compiled scan program per bucket - the serving path's defense
        against per-video-length recompiles (see run_staged).

        ``yuv`` declares the slab layout explicitly (pass through the flag
        ``upload_video_slabs`` returned): True means flat planar-YUV420
        rows that the finalize program converts to RGB on device, so
        downstream bgr=False. The layout is a caller contract, not
        inferred from ndim - a future 2-D slab of some other layout must
        not be silently corrupted by the conversion."""
        T = int(sum(s.shape[0] for s in slabs))
        if not slabs or T == 0:
            raise ValueError(
                "no frames decoded from video: the stream opened but yielded "
                "zero frames (empty, truncated, or unsupported codec)"
            )
        bucket = None
        if bucket_frames:
            bucket = -(-T // int(bucket_frames)) * int(bucket_frames)
        if yuv != (getattr(slabs[0], "ndim", 4) == 2):
            raise ValueError(
                f"yuv={yuv} does not match the slab layout "
                f"(ndim={getattr(slabs[0], 'ndim', 4)}): pass the flag "
                "returned by upload_video_slabs"
            )
        buf, median = self._finalize_fn(T, max_sample_num, bucket, yuv)(tuple(slabs))
        return StagedVideo(
            buf=buf, T=T, median=median, bgr=bgr and not yuv, src_wh=src_wh
        )

    def warmup_staged(self, staged: StagedVideo, mesh=None):
        """Compile the staged programs without paying a full-video run.

        Remote compiles on this runtime take seconds-to-minutes and are
        process-cached only, so callers that care about timing warm up
        explicitly. The overlap warm-up EXECUTES the exact callable
        run_staged will dispatch (via _acquire_scan - the exported-call
        program when the AOT cache is enabled, the plain jit otherwise)
        with ``s_real=0``: every chunk is skipped by the in-program
        lax.cond, so the call costs milliseconds regardless of video
        length while compiling the real executable. (An Exported.call has
        no .lower(); wrapping it in jax.jit for an AOT compile measured
        450 s/process of call_exported re-tracing - see _acquire_scan.)
        Pass the same ``mesh`` that ``run_staged`` will get: the sharded
        program is a different executable than the 1-device one."""
        L = self.seq_len
        med = self._staged_median_arg(staged)
        buf = staged.buf
        if mesh is not None:
            from .parallel.mesh import replicate_tree

            buf, med = replicate_tree((buf, med), mesh)
        if self.eval_mode == "nonoverlap":
            step = self._staged_step_nonoverlap(staged.bgr, mesh)
            step.lower(buf, med, jnp.int32(0)).compile()
        else:
            scan = self._acquire_scan(staged, mesh)
            state = ensemble_init(L, (self.h, self.w))
            np.asarray(scan(buf, med, state, jnp.int32(0)))  # fetch=done

    # ------------------------ AOT program cache -----------------------------

    def _program_cache_path(self, kind: str, bgr: bool, T: int) -> str:
        """Blob path keyed by everything that shapes the traced program:
        the folded-params tree structure/shapes (weights themselves are a
        runtime ARGUMENT since v3, so same-architecture checkpoints share
        one blob - and, critically, the compiled executable stays ~2 MB
        instead of embedding 70 MB of weight constants this runtime
        deserializes at ~1 MB/s, see _folded_device), video
        length/batch/eval-mode/dtype/resolution, jax version and backend
        (Exported records the lowering platform), and a digest of this
        package's own source - upgrading or editing the package
        automatically invalidates stale blobs, so a blob can never execute
        an OLD traced program after a code change (previously the
        documented remedy was "delete the dir after upgrading")."""
        import hashlib
        import os

        shape_sig = str(
            jax.tree_util.tree_map(lambda a: tuple(a.shape), self._folded)
        )
        h = hashlib.sha256()
        h.update(shape_sig.encode())
        h.update(
            # v3: folded params are a runtime argument (weightless blob);
            # v1/v2 blobs embedded weights and have different signatures
            f"v3|{kind}|{bgr}|{T}|{self.batch_size}|{self.seq_len}|"
            f"{self.eval_mode}|{self.compute_dtype}|{self.h}x{self.w}|"
            f"{jax.__version__}|{jax.default_backend()}".encode()
        )
        h.update(_package_source_digest())
        return os.path.join(
            self.program_cache_dir, f"staged_{kind}_{h.hexdigest()[:24]}.jaxexp"
        )

    def _acquire_scan(self, staged: StagedVideo, mesh=None):
        """The staged-scan callable, via (in order): in-memory cache,
        deserialized jax.export blob (skips minutes of host retracing),
        or a fresh trace (which then writes the blob for next time).
        Sharded (mesh) programs always trace fresh. Programs and blobs
        are keyed by BUFFER length (the only length the executable
        bakes in - s_real is a runtime scalar), so bucket-padded videos
        of any length share one program/blob per bucket."""
        import os

        T_key = int(staged.buf.shape[0])
        fn = self._staged_scan_fn(staged.bgr, mesh)
        if mesh is not None or not self.program_cache_dir:
            return fn
        key = ("exported", staged.bgr, "scan", T_key)
        if key in self._staged_steps:
            return self._staged_steps[key]
        from jax import export as jax_export

        path = self._program_cache_path("scan", staged.bgr, T_key)
        if os.path.exists(path):
            with open(path, "rb") as f:
                exported = jax_export.deserialize(f.read())
            try:
                # mark recency for the LRU prune: on noatime mounts the
                # read above does not refresh st_atime, and without this
                # the prune would evict blobs in creation order even when
                # they are hit on every serving run
                os.utime(path, None)
            except OSError:
                pass
            # BARE exported.call, not jax.jit(exported.call): dispatching a
            # jit-of-exported-call re-traces/inlines the embedded scan
            # module through the call_exported machinery on EVERY fresh
            # process (measured 450 s for the 480-frame scan, defeating
            # the cache), while the bare call executes the deserialized
            # module directly (~seconds with a warm persistent cache).
            # warmup_staged warms this exact callable by executing it with
            # s_real=0 (all chunks cond-skipped, so that costs ~ms).
            call = exported.call
            wrapped = lambda buf, med, state, s_real: call(  # noqa: E731
                self._folded_device(), buf, med, state, s_real
            )
            self._staged_steps[key] = wrapped
            return wrapped
        # miss: trace once, persist, and EXECUTE VIA THE EXPORT from now
        # on - the exported module's HLO differs from the plain jit's, so
        # running the jit here would leave the cold process's
        # exported-call executable UNCACHED (it would pay a full remote
        # compile on first use, defeating the cache).
        try:
            med = self._staged_median_arg(staged)
            state = ensemble_init(self.seq_len, (self.h, self.w))
            # folded params lead the signature (runtime argument, NOT an
            # embedded constant - see _folded_device for why that matters)
            args = (
                self._folded_device(),
                staged.buf,
                med,
                state,
                jnp.int32(0),
            )
            sds = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                args,
            )
            impl = self._staged_scan_impl(staged.bgr, mesh)
            exported = jax_export.export(jax.jit(impl))(*sds)
            os.makedirs(self.program_cache_dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exported.serialize())
            os.replace(tmp, path)
            call = exported.call  # bare: see the deserialize branch above
            wrapped = lambda buf, med, state, s_real: call(  # noqa: E731
                self._folded_device(), buf, med, state, s_real
            )
            self._staged_steps[key] = wrapped
            return wrapped
        except Exception as e:  # noqa: BLE001 - cache is optional
            import sys

            print(f"warning: program export failed: {e}", file=sys.stderr)
            # memoize the failure: without this every same-length video
            # re-hashes checkpoints and re-attempts the failing export
            self._staged_steps[key] = fn
        return fn

    def _staged_median_arg(self, staged: StagedVideo):
        return (
            staged.median
            if staged.median is not None
            else jnp.zeros((self.h, self.w, 3), jnp.float32)
        )

    def run_staged(
        self,
        staged: StagedVideo,
        img_scaler: Optional[Tuple[float, float]] = None,
        mesh=None,
    ) -> Dict[str, list]:
        """Run all chunks over a staged buffer (both eval modes).

        Overlap mode forwards each of the S = T-L+1 windows exactly once,
        carrying the ensemble tail between chunks scanned INSIDE one
        device program (the last L-1 frames come from the in-program
        flush) - one dispatch and one fetch per video. With ``mesh`` the
        window batch of every chunk is sharded across the data mesh
        (multi-chip inference); outputs are identical to the
        single-device run."""
        T = staged.T
        L, B = self.seq_len, self.batch_size
        if img_scaler is None:
            img_scaler = (staged.src_wh[0] / self.w, staged.src_wh[1] / self.h)
        med = self._staged_median_arg(staged)
        buf = staged.buf
        if mesh is not None:
            assert B % mesh.size == 0, (
                f"batch_size {B} not divisible by mesh size {mesh.size}"
            )
            from .parallel.mesh import replicate_tree

            buf, med = replicate_tree((buf, med), mesh)
        results = []
        if self.eval_mode == "nonoverlap":
            step = self._staged_step_nonoverlap(staged.bgr, mesh)
            n_win = -(-T // L)
            for w0 in range(0, n_win, B):
                packed = step(buf, med, jnp.int32(w0))
                results.append((packed, min(B, n_win - w0) * L))
        else:
            # Whole video in ONE dispatch + ONE fetch (see _staged_scan_fn).
            # The scan returns chunk rows + flush tail unsliced (s_real is
            # a runtime scalar so the program is shared across lengths);
            # assemble rows[:S] + tail[:T-S] here.
            scan = self._acquire_scan(staged, mesh)
            state = ensemble_init(L, (self.h, self.w))
            S = max(T - L + 1, 1)
            full = np.asarray(scan(buf, med, state, jnp.int32(S)))
            n_rows = full.shape[0] - (L - 1)
            arr = np.concatenate(
                [full[:S], full[n_rows : n_rows + (T - S)]], axis=0
            )[:T]
            return self._rows_to_pred(arr, img_scaler)
        # nonoverlap: one device-side concat of the valid rows + a SINGLE
        # small fetch (per-chunk np.asarray would pay one relay round trip
        # each, ~35 ms, even though the data is long since computed).
        full = jnp.concatenate([p[:nv] for p, nv in results if nv > 0], axis=0)
        arr = np.asarray(full)[:T]
        return self._rows_to_pred(arr, img_scaler)

    @staticmethod
    def _rows_to_pred(arr: np.ndarray, img_scaler) -> Dict[str, list]:
        """(T, 3+) [cx, cy, vis, ...] rows -> the prediction-dict contract."""
        w_s, h_s = img_scaler
        return {
            "Frame": list(range(arr.shape[0])),
            "X": [int(v) for v in (arr[:, 0] * w_s).astype(np.int64)],
            "Y": [int(v) for v in (arr[:, 1] * h_s).astype(np.int64)],
            "Visibility": [int(v) for v in arr[:, 2]],
        }

    # ----------------------------- host pipeline ----------------------------

    def predict_frames(
        self,
        frames: np.ndarray,
        median: Optional[np.ndarray] = None,
        img_scaler: Tuple[float, float] = (1.0, 1.0),
        max_sample_num: Optional[int] = None,
    ) -> Dict[str, list]:
        """TrackNet stage over an in-memory RGB uint8 array (T, H0, W0, 3).

        Both eval modes ship the whole padded video to the device in one
        transfer and run resident-buffer chunks (see
        _overlap_step_resident_impl for why); any needed median background
        is computed on device from the staged frames (default: over ALL
        frames, matching the reference's in-memory path)."""
        return self._predict_frames_resident(frames, median, img_scaler, max_sample_num)

    def upload_frames(self, frames: np.ndarray):
        """One bulk H2D transfer of the raw video (do this before any
        device program has executed - the relay's fast transfer path)."""
        return jax.device_put(frames)

    def build_resident(self, raw, T: int):
        """Device-side padded buffer construction from uploaded frames."""
        L, B = self.seq_len, self.batch_size
        n_chunks = -(-T // B)
        need = (L - 1) + n_chunks * B + (B + L - 1)
        bucket = 256
        total = -(-need // bucket) * bucket
        pad = jax.jit(self._pad_resident_impl, static_argnums=(1,))
        all_dev = pad(raw, total)
        return all_dev, dict(T=T, total=total)

    def stage_frames(self, frames: np.ndarray):
        """Upload a whole video once and build the padded resident buffer."""
        raw = self.upload_frames(frames)
        return self.build_resident(raw, frames.shape[0])

    def median_of_resident(self, all_dev, T: int, max_sample_num: Optional[int] = None):
        """Median background from the resident buffer, on device.

        Default (None) medians over ALL frames, matching the reference's
        in-memory path (reference: predict.py:128-131, np.median over the
        whole frame array). The sort runs in uint8 (exact np.median values,
        4x less HBM than an f32 stack); a memory guard caps the sorted
        stack at 1024 720p frames (~2.8 GB)."""
        L = self.seq_len
        k = T if max_sample_num is None else min(int(max_sample_num), T)
        k = min(k, 1024)
        step = max(T // k, 1)
        idx = jnp.arange(L - 1, L - 1 + T, step)[:k]

        @jax.jit
        def med(buf):
            return median_of_u8_stack(jnp.take(buf, idx, axis=0))

        return med(all_dev)

    def run_resident(self, all_dev, T: int, median, img_scaler=(1.0, 1.0)):
        """Run all chunks against a staged buffer (both eval modes)."""
        L, B = self.seq_len, self.batch_size
        med_dev = (
            jnp.asarray(median, jnp.float32)
            if median is not None
            else jnp.zeros((1, 1, 3))
        )
        results = []
        if self.eval_mode == "nonoverlap":
            n_win = -(-T // L)
            T_dev = jnp.int32(T)
            for w0 in range(0, n_win, B):
                packed = self._nonoverlap_step_resident(
                    all_dev, med_dev, jnp.int32(w0), T_dev
                )
                results.append((packed, min(B, n_win - w0) * L))
        else:
            S_dev = jnp.int32(max(T - L + 1, 1))
            for t0 in range(0, T, B):
                packed = self._overlap_step_resident(
                    all_dev, med_dev, jnp.int32(t0), S_dev
                )
                results.append((packed, min(B, T - t0)))
        return self._collect_packed(results, T, img_scaler)

    def _predict_frames_resident(self, frames, median, img_scaler, max_sample_num=None):
        """Single-upload overlap pipeline over a device-resident buffer."""
        all_dev, meta = self.stage_frames(frames)
        if median is None and self.bg_mode:
            median = self.median_of_resident(all_dev, meta["T"], max_sample_num)
        return self.run_resident(all_dev, meta["T"], median, img_scaler)

    @staticmethod
    def _collect_packed(results, total_frames, img_scaler):
        pred = {"Frame": [], "X": [], "Y": [], "Visibility": []}
        w_s, h_s = img_scaler
        frame_id = 0
        for packed, n_valid in results:
            arr = np.asarray(packed)[:n_valid]
            for k in range(arr.shape[0]):
                if frame_id >= total_frames:
                    break
                pred["Frame"].append(frame_id)
                pred["X"].append(int(arr[k, 0] * w_s))
                pred["Y"].append(int(arr[k, 1] * h_s))
                pred["Visibility"].append(int(arr[k, 2]))
                frame_id += 1
        return pred

    def predict_video_streaming(
        self,
        video_file: str,
        max_sample_num: int = 1800,
        video_range: Optional[Tuple[int, int]] = None,
        median: Optional[np.ndarray] = None,
        host_resize: bool = True,
    ) -> Dict[str, list]:
        """TrackNet stage streaming from disk (--large_video path).

        With ``host_resize`` (default) decoded frames are resized (and the
        background difference computed) on the host so only model-
        resolution uint8 tensors cross the PCIe/relay link; the overlap
        chunks then run the pre-resized device step."""
        reader = VideoReader(video_file)
        img_scaler = (reader.w / self.w, reader.h / self.h)
        if median is None and self.bg_mode:
            median = reader.sample_median(max_sample_num, video_range)
        T = reader.video_len
        L, B = self.seq_len, self.batch_size

        if host_resize:
            return self._streaming_host_resize(reader, median, img_scaler)

        def chunks() -> Iterator[Tuple[np.ndarray, int, int]]:
            reader.seek(0)
            buf: List[np.ndarray] = []
            base = 0  # global index of buf[0]
            if self.eval_mode == "nonoverlap":
                emitted = 0
                n_win = -(-T // L)
                total = n_win * L
                while emitted < total:
                    while len(buf) < B * L:
                        f = reader.read()
                        if f is None:
                            break
                        buf.append(f)
                    if not buf:
                        break
                    valid = min(len(buf), total - emitted)
                    chunk = list(buf[: B * L])
                    while len(chunk) < B * L:
                        chunk.append(chunk[-1])
                    yield np.stack(chunk), 0, valid
                    emitted += B * L
                    buf = buf[B * L :]
            else:
                for t0 in range(0, T, B):
                    # need global frames [t0-L+1, t0+B+L-1), clipped
                    hi = min(t0 + B + L - 1, T)
                    while base + len(buf) < hi:
                        f = reader.read()
                        if f is None:
                            break
                        buf.append(f)
                    # drop frames before t0-L+1
                    lo = max(t0 - L + 1, 0)
                    if lo > base:
                        buf = buf[lo - base :]
                        base = lo
                    if not buf:
                        # container metadata overcounted the decodable
                        # frames (VFR/corrupt tail): stop gracefully like
                        # the nonoverlap branch instead of IndexError
                        break
                    idx = np.clip(
                        np.arange(t0 - L + 1, t0 + B + L - 1) - base,
                        0,
                        len(buf) - 1,
                    )
                    arr = np.stack(buf)
                    yield arr[idx], t0, min(B, T - t0)
            reader.release()

        return self._run_pipeline(chunks(), T, median, img_scaler)

    def _streaming_host_resize(self, reader, median, img_scaler):
        """Streaming overlap pipeline with host-side resize/diff.

        Host work per frame (cv2 INTER_AREA resize + optional mod-256
        diff) replicates the FrameCache recipe; device receives only
        288x512 uint8 tensors. bg modes without a full-resolution
        background diff ('' and 'concat') decode with the native libav
        reader when available - scale-during-decode straight to model-res
        RGB, with DCT-domain lowres on large sources (native_video.py)."""
        import cv2

        T = reader.video_len
        L, B = self.seq_len, self.batch_size
        need_diff = self.bg_mode in ("subtract", "subtract_concat")
        need_rgb = self.bg_mode in ("", "subtract_concat", "concat")

        native_reader = None
        if not need_diff and self.native_decode:
            from .native_video import open_native_video

            native_reader = open_native_video(
                reader.path, self.w, self.h, lowres=-1, bgr=False
            )
        if native_reader is not None:
            self.decode_backend = f"native-lowres{native_reader.applied_lowres}"
            reader.release()
        else:
            self.decode_backend = "cv2"
        H, W = self.h, self.w
        med_resized = None
        if self.bg_mode == "concat":
            med_resized = jnp.asarray(
                cv2.resize(
                    median.astype(np.uint8), (W, H), interpolation=cv2.INTER_AREA
                )
            )

        def process(frame):
            out = []
            if need_rgb:
                out.append(
                    cv2.resize(frame, (W, H), interpolation=cv2.INTER_AREA)
                )
            else:
                out.append(None)
            if need_diff:
                d = np.sum(np.abs(frame - median), axis=2).astype("uint8")
                out.append(
                    cv2.resize(d, (W, H), interpolation=cv2.INTER_AREA)[
                        ..., None
                    ]
                )
            else:
                out.append(None)
            return out

        q: "queue.Queue" = queue.Queue(maxsize=4)
        SENTINEL = object()
        producer_err: List[BaseException] = []

        nonoverlap = self.eval_mode == "nonoverlap"

        if native_reader is not None:
            _nbuf: Dict[str, object] = {"arr": None, "i": 0}

            def read_processed():
                arr = _nbuf["arr"]
                if arr is None or _nbuf["i"] >= len(arr):
                    arr = native_reader.read_batch(64)  # releases the GIL
                    _nbuf["arr"], _nbuf["i"] = arr, 0
                    if arr is None:
                        return None
                f = arr[_nbuf["i"]]
                _nbuf["i"] += 1
                return f, None  # already model-res RGB; no diff channel

        else:

            def read_processed():
                f = reader.read()
                if f is None:
                    return None
                r, d = process(f)
                return r, d

        def producer():
            try:
                if native_reader is None:
                    reader.seek(0)
                buf_rgb, buf_diff = [], []
                base = 0
                if nonoverlap:
                    n_win = -(-T // L)
                    total = n_win * L
                    emitted = 0
                    while emitted < total:
                        while len(buf_rgb) < B * L:
                            item = read_processed()
                            if item is None:
                                break
                            r, d = item
                            buf_rgb.append(r)
                            buf_diff.append(d)
                        if not buf_rgb:
                            break
                        valid = min(len(buf_rgb), total - emitted)

                        def pad(lst):
                            if lst[0] is None:
                                return None
                            chunk = list(lst[: B * L])
                            while len(chunk) < B * L:
                                chunk.append(chunk[-1])
                            return np.stack(chunk)

                        q.put((pad(buf_rgb), pad(buf_diff), None, valid))
                        emitted += B * L
                        buf_rgb = buf_rgb[B * L :]
                        buf_diff = buf_diff[B * L :]
                else:
                    for t0 in range(0, T, B):
                        hi = min(t0 + B + L - 1, T)
                        while base + len(buf_rgb) < hi:
                            item = read_processed()
                            if item is None:
                                break
                            r, d = item
                            buf_rgb.append(r)
                            buf_diff.append(d)
                        lo = max(t0 - L + 1, 0)
                        if lo > base:
                            buf_rgb = buf_rgb[lo - base :]
                            buf_diff = buf_diff[lo - base :]
                            base = lo
                        if not buf_rgb:
                            # metadata overcounted decodable frames: stop
                            # gracefully (matches the nonoverlap branch)
                            break
                        idx = np.clip(
                            np.arange(t0 - L + 1, t0 + B + L - 1) - base,
                            0,
                            len(buf_rgb) - 1,
                        )
                        rgb = (
                            np.stack(buf_rgb)[idx] if buf_rgb[0] is not None else None
                        )
                        diff = (
                            np.stack(buf_diff)[idx]
                            if buf_diff[0] is not None
                            else None
                        )
                        q.put((rgb, diff, t0, min(B, T - t0)))
                if native_reader is not None:
                    native_reader.close()
                else:
                    reader.release()
            except BaseException as e:  # noqa: BLE001 - re-raised below
                producer_err.append(e)
            finally:
                q.put(SENTINEL)

        threading.Thread(target=producer, daemon=True).start()

        S_dev = jnp.int32(max(T - L + 1, 1))
        results = []
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            rgb, diff, t0, n_valid = item
            rgb_d = jnp.asarray(rgb) if rgb is not None else None
            diff_d = jnp.asarray(diff) if diff is not None else None
            if nonoverlap:
                packed = self._nonoverlap_step_preresized(rgb_d, diff_d, med_resized)
            else:
                packed = self._overlap_step_preresized(
                    rgb_d, diff_d, med_resized, jnp.int32(t0), S_dev
                )
            results.append((packed, n_valid))
        if producer_err:
            raise RuntimeError(
                f"video decode failed mid-stream: {reader.path}"
            ) from producer_err[0]
        return self._collect_packed(results, T, img_scaler)

    def _run_pipeline(self, chunk_iter, total_frames, median, img_scaler):
        """Drive device steps over prefetched chunks; assemble pred_dict."""
        L, B = self.seq_len, self.batch_size
        med_dev = (
            jnp.asarray(median, jnp.float32) if median is not None else jnp.zeros((1, 1, 3))
        )
        # Background prefetch: overlap cv2 decode with device compute.
        q: "queue.Queue" = queue.Queue(maxsize=4)
        SENTINEL = object()
        producer_err: List[BaseException] = []

        def producer():
            try:
                for item in chunk_iter:
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 - re-raised below;
                # a swallowed generator error would silently truncate the
                # prediction CSV (same plumbing as _streaming_host_resize)
                producer_err.append(e)
            finally:
                q.put(SENTINEL)

        threading.Thread(target=producer, daemon=True).start()

        S = jnp.int32(max(total_frames - L + 1, 1))
        results = []  # list of (decoded dict of device arrays, n_valid)
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            chunk, t0, n_valid = item
            if self.eval_mode == "nonoverlap":
                dec = self._nonoverlap_step(jnp.asarray(chunk), med_dev)
            else:
                dec = self._overlap_step(
                    jnp.asarray(chunk), med_dev, jnp.int32(t0), S
                )
            results.append((dec, n_valid))
        if producer_err:
            raise RuntimeError(
                "video decode failed mid-stream"
            ) from producer_err[0]
        return self._collect(results, total_frames, img_scaler)

    @staticmethod
    def _collect(results, total_frames, img_scaler):
        """Drain decoded device results into the prediction dict."""
        pred = {"Frame": [], "X": [], "Y": [], "Visibility": []}
        w_s, h_s = img_scaler
        frame_id = 0
        for dec, n_valid in results:
            cx = np.asarray(dec["cx"])[:n_valid]
            cy = np.asarray(dec["cy"])[:n_valid]
            vis = np.asarray(dec["vis"])[:n_valid]
            for k in range(len(cx)):
                if frame_id >= total_frames:
                    break
                pred["Frame"].append(frame_id)
                pred["X"].append(int(cx[k] * w_s))
                pred["Y"].append(int(cy[k] * h_s))
                pred["Visibility"].append(int(vis[k]))
                frame_id += 1
        return pred

    # ----------------------------- inpaint stage ----------------------------

    def _inpaint_vars_device(self):
        """InpaintNet variables as a device-resident tree, uploaded once
        (runtime argument to the jitted inpaint steps - see __init__)."""
        if self._inpaint_vars_dev is None:
            self._inpaint_vars_dev = jax.tree_util.tree_map(
                jnp.asarray, self.inpaintnet_vars
            )
        return self._inpaint_vars_dev

    def _inpaint_forward(self, ivars, cw, mw):
        """Composite + COOR_TH-thresholded InpaintNet forward on windows."""
        out = self.inpaintnet.apply(ivars, cw, mw)
        out = out * mw + cw * (1.0 - mw)
        th = (out[..., 0] < COOR_TH) & (out[..., 1] < COOR_TH)
        return jnp.where(th[..., None], 0.0, out)

    def _inpaint_nonoverlap_impl(self, ivars, cw, mw):
        out = self._inpaint_forward(ivars, cw, mw)
        return out.reshape(-1, 2)

    def _inpaint_overlap_impl(self, ivars, cw, mw, n_valid):
        L = self.inpaintnet_seq_len
        out = self._inpaint_forward(ivars, cw, mw)  # (pad_S, L, 2)
        weights = jnp.asarray(get_ensemble_weight(L, self.eval_mode))
        lead = jnp.zeros((L - 1,) + out.shape[1:], out.dtype)
        wins = jnp.concatenate([lead, out], axis=0)
        # frames 0..pad_S-1 in one stateless pass; rows >= n_valid+L-1 are
        # garbage and trimmed by the caller.
        ens = ensemble_chunk(wins, weights, jnp.int32(0), n_valid)
        th = (ens[..., 0] < COOR_TH) & (ens[..., 1] < COOR_TH)
        return jnp.where(th[..., None], 0.0, ens)

    @staticmethod
    def _bucket(n: int) -> int:
        """Round window counts up to the next multiple of 64: bounds
        recompiles across videos of similar length while wasting at most
        63 InpaintNet windows (the earlier power-of-two bucketing wasted
        up to ~2x the real window count on long videos)."""
        return -(-n // 64) * 64

    def inpaint_trajectory(
        self,
        pred_dict: Dict[str, list],
        img_shape: Tuple[int, int],
        th_h: Optional[float] = None,
    ) -> Dict[str, list]:
        """InpaintNet pass over the TrackNet trajectory (reference:
        predict.py:213-301). Coordinates are normalized by the original
        frame size, windows slide over the trajectory, outputs are
        composited (inpainted where masked), thresholded at COOR_TH, and
        temporally ensembled when eval_mode != 'nonoverlap'. The whole
        stage is one jitted program; window counts are padded to coarse
        buckets so repeated videos share compiles."""
        assert self.inpaintnet is not None
        w, h = img_shape
        if th_h is None:
            th_h = h * 0.05
        mask = np.asarray(generate_inpaint_mask(pred_dict, th_h=th_h), np.float32)
        T = len(mask)
        L = self.inpaintnet_seq_len
        x = np.asarray(pred_dict["X"], np.float32) / w
        y = np.asarray(pred_dict["Y"], np.float32) / h
        coords = np.stack([x, y], axis=-1)  # (T, 2) normalized

        nonoverlap = self.eval_mode == "nonoverlap"
        if nonoverlap:
            starts = np.arange(0, T, L)
        else:
            starts = np.arange(0, max(T - L + 1, 1))
        S = len(starts)
        pad_S = self._bucket(S + L - 1)  # ensure all T frames fit the output
        starts = np.concatenate([starts, np.zeros(pad_S - S, np.int64)])
        idx = np.clip(starts[:, None] + np.arange(L)[None, :], 0, T - 1)
        cw = jnp.asarray(coords[idx])  # (pad_S, L, 2)
        mw = jnp.asarray(mask[idx][..., None])  # (pad_S, L, 1)

        if nonoverlap:
            flat = np.asarray(self._inpaint_nonoverlap(cw, mw))[: S * L][:T]
        else:
            ens = np.asarray(self._inpaint_overlap(cw, mw, jnp.int32(S)))
            flat = ens[:T]

        # Vectorized CSV assembly (the last per-frame Python loop on the
        # production path). Denormalization keeps the reference's exact f32
        # two-multiply form int(c * WIDTH * w_scaler) with
        # w_scaler = w/WIDTH (predict.py:51) — a single f64 multiply by w
        # flips int() truncation on boundary values.
        cx = (
            flat[:, 0].astype(np.float32) * np.float32(self.w) * np.float32(w / self.w)
        ).astype(np.int64)
        cy = (
            flat[:, 1].astype(np.float32) * np.float32(self.h) * np.float32(h / self.h)
        ).astype(np.int64)
        vis = ((cx != 0) | (cy != 0)).astype(np.int64)
        return {
            "Frame": [int(f) for f in pred_dict["Frame"][:T]],
            "X": cx.tolist(),
            "Y": cy.tolist(),
            "Visibility": vis.tolist(),
        }


def predict_video(
    video_file: str,
    tracknet_file: str,
    inpaintnet_file: str = "",
    eval_mode: str = "weight",
    batch_size: int = 16,
    max_sample_num: int = 1800,
    video_range: Optional[Tuple[int, int]] = None,
    large_video: bool = False,
    save_dir: Optional[str] = None,
    output_video: bool = False,
    traj_len: int = 8,
    video_name: Optional[str] = None,
    device_resize: bool = False,
    native_decode: bool = True,
    num_devices: Optional[int] = None,
    stage_format: str = "auto",
    bucket_quantum: int = 256,
    program_cache_dir: Optional[str] = None,
    input_hw: Optional[Tuple[int, int]] = None,
) -> Dict[str, list]:
    """Full predict CLI flow (reference: predict.py:71-312).

    Default path stages the whole video on device at model resolution
    (host INTER_LINEAR resize during decode); ``device_resize=True``
    instead ships raw frames and resizes on device with the
    PIL-bicubic-matched kernel (reference-exact resize semantics, ~6x
    more H2D traffic); ``large_video`` streams with bounded memory.
    ``num_devices`` > 1 shards the staged path's window batches over a
    data-parallel mesh.

    The staged buffer is bucket-padded to the next ``bucket_quantum``
    multiple (same program-sharing scheme as batch serving: the real
    window count is a traced scalar), so with ``program_cache_dir`` set a
    fresh single-video process reuses the per-bucket AOT program blob and
    pays no host trace+lower cost - the reference's eager flow has zero
    program-acquisition cost (reference: predict.py:98-115), and bucketing
    is what bounds the blob set that matching it requires.
    """
    import os

    mesh = None
    if (num_devices or 0) > 1:
        if large_video or device_resize:
            raise ValueError(
                "num_devices > 1 is only supported on the default staged "
                "path; drop --large_video/--device_resize or num_devices"
            )
        from .parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)

    kw = {} if input_hw is None else {"input_hw": input_hw}
    predictor = TrackNetPredictor(
        tracknet_file,
        inpaintnet_file or None,
        eval_mode=eval_mode,
        batch_size=batch_size,
        native_decode=native_decode,
        stage_format=stage_format,
        program_cache_dir=program_cache_dir,
        **kw,
    )
    reader = VideoReader(video_file)
    w, h = reader.w, reader.h
    img_scaler = (w / predictor.w, h / predictor.h)
    if large_video:
        reader.release()
        pred = predictor.predict_video_streaming(
            video_file, max_sample_num=max_sample_num, video_range=video_range
        )
    elif device_resize:
        # In-memory paths median over ALL frames like the reference's
        # in-memory flow (predict.py:128-131); max_sample_num only bounds
        # the streaming path's median, as in the reference.
        frames = reader.read_all()
        reader.release()
        pred = predictor.predict_frames(frames, img_scaler=img_scaler)
    elif reader.video_len * predictor.h * predictor.w * 3 > 8e9:
        # Staging would exceed the device-memory budget (>~18k frames of
        # model-res uint8); fall back to bounded-memory streaming rather
        # than OOM mid-upload.
        if mesh is not None:
            import sys

            print(
                "warning: video exceeds the staging budget; falling back to "
                "single-device streaming (num_devices ignored)",
                file=sys.stderr,
            )
        reader.release()
        pred = predictor.predict_video_streaming(
            video_file, max_sample_num=max_sample_num, video_range=video_range
        )
    else:
        reader.release()
        staged = predictor.stage_video(video_file, bucket_frames=bucket_quantum)
        pred = predictor.run_staged(staged, img_scaler=img_scaler, mesh=mesh)

    if predictor.inpaintnet is not None:
        pred = predictor.inpaint_trajectory(pred, (w, h))

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        name = video_name or os.path.splitext(os.path.basename(video_file))[0]
        write_pred_csv(pred, os.path.join(save_dir, f"{name}_ball.csv"))
        if output_video:
            write_pred_video(
                video_file, pred, os.path.join(save_dir, f"{name}.mp4"), traj_len=traj_len
            )
    return pred


def predict_videos(
    video_files: List[str],
    tracknet_file: str,
    inpaintnet_file: str = "",
    eval_mode: str = "weight",
    batch_size: int = 16,
    max_sample_num: int = 1800,
    save_dir: Optional[str] = None,
    output_video: bool = False,
    traj_len: int = 8,
    native_decode: bool = True,
    num_devices: Optional[int] = None,
    bucket_quantum: int = 256,
    staging_budget_bytes: float = 8e9,
    input_hw: Optional[Tuple[int, int]] = None,
    on_error: str = "raise",
    program_cache_dir: Optional[str] = None,
    stage_format: str = "auto",
    predictor: Optional["TrackNetPredictor"] = None,
    stats: Optional[dict] = None,
) -> Dict[str, Dict[str, list]]:
    """Batch serving flow over many videos (one model load, shared programs).

    The reference has no batch mode - predict.py handles a single video
    per process (reference: predict.py:71-312), so serving N videos pays
    N process starts and N model loads. This flow loads the model once
    and defends against the two TPU serving costs:

    1. **Per-length recompiles**: every distinct video length T is a
       distinct traced program. Buffers are bucket-padded to the next
       ``bucket_quantum`` multiple (repeat-last-frame padding, traced
       real-window count; see _staged_scan_fn), so all videos in
       a bucket share ONE compiled scan program - a serving deployment
       compiles a handful of programs total, and the AOT program cache
       persists them across processes.
    2. **Degraded post-execution H2D** (this runtime's relay pathology;
       irrelevant on standard TPU hosts): videos are staged in WAVES -
       every video of a wave is decoded + uploaded before any program
       executes, then the wave is computed. Waves after the first pay the
       degraded upload path here; on standard hosts they pipeline cleanly.

    Videos whose staged buffer alone would exceed ``staging_budget_bytes``
    fall back to the bounded-memory streaming path individually.

    ``on_error='skip'`` isolates per-video failures (corrupt/undecodable
    files are reported to stderr and dropped) instead of aborting the
    batch; the default ``'raise'`` propagates, matching predict_video.

    ``predictor`` reuses an already-constructed :class:`TrackNetPredictor`
    (a long-lived serving session dispatching repeated batches keeps its
    compiled programs and skips the model reload); the model/eval kwargs
    above are then ignored. ``stats``, if given a dict, is filled with the
    wave accounting of this call — ``stats['waves']`` is a list of
    ``{'videos': [...], 'slots': n, 'buckets': [frame counts]}`` in compute
    order and ``stats['streaming']`` the files that fell back to the
    bounded-memory streaming path — so schedulers/benchmarks/tests can
    verify the videos→waves→buckets decomposition instead of inferring it.

    Returns {video_path: prediction dict}; with ``save_dir`` each video
    also writes ``{name}_ball.csv`` (and optionally the overlay video).
    """
    import os

    mesh = None
    if (num_devices or 0) > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)

    if predictor is None:
        kw = {} if input_hw is None else {"input_hw": input_hw}
        predictor = TrackNetPredictor(
            tracknet_file,
            inpaintnet_file or None,
            eval_mode=eval_mode,
            batch_size=batch_size,
            native_decode=native_decode,
            program_cache_dir=program_cache_dir,
            stage_format=stage_format,
            **kw,
        )
    if stats is None:
        stats = {}
    stats["waves"] = []
    stats["streaming"] = []
    frame_bytes = predictor.h * predictor.w * 3

    def _finish(video_file: str, pred: Dict[str, list], src_wh) -> Dict[str, list]:
        if predictor.inpaintnet is not None:
            pred = predictor.inpaint_trajectory(pred, src_wh)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(video_file))[0]
            write_pred_csv(pred, os.path.join(save_dir, f"{name}_ball.csv"))
            if output_video:
                write_pred_video(
                    video_file, pred,
                    os.path.join(save_dir, f"{name}.mp4"), traj_len=traj_len,
                )
        return pred

    import sys

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def _guard(f, fn):
        """Run fn(); under on_error='skip' a failing video is reported to
        stderr and dropped from the results instead of killing the batch
        (serving contract: one corrupt file must not abort N-1 good ones)."""
        if on_error == "raise":
            return fn(), True
        try:
            return fn(), True
        except Exception as e:  # noqa: BLE001 - per-video isolation
            print(f"warning: skipping {f}: {e}", file=sys.stderr)
            return None, False

    results: Dict[str, Dict[str, list]] = {}

    # ---- pipelined waves (VERDICT r3 item 3) ----------------------------
    # A producer thread decodes + uploads wave N+1 while the main thread
    # finalizes + computes wave N, so decode/upload and compute overlap
    # across waves (they already overlap WITHIN a video via
    # upload_video_slabs' decode thread). In-flight device memory is
    # bounded at TWO waves by a semaphore (one computing, one
    # uploading/queued), so each wave gets half the staging budget.
    # jax dispatch is thread-safe; device_put from the producer
    # interleaves with the consumer's program dispatches. On this relay
    # every post-first-wave upload pays the degraded H2D path EITHER way
    # (PROFILE.md), so overlapping it with compute is a strict win here
    # too, not just on standard hosts.
    wave_budget = staging_budget_bytes / 2
    streaming: List[str] = []
    wave_q: "queue.Queue" = queue.Queue()
    SENTINEL = object()
    inflight = threading.Semaphore(2)  # waves uploaded but not yet freed
    producer_err: List[BaseException] = []

    def producer():
        # wave entries: (f, slabs, src_wh, yuv); a wave holds `slots`
        # semaphore slots (1 = half the staging budget, 2 = a solo
        # oversized video up to the full budget - it runs unpipelined).
        wave: List[tuple] = []
        wave_bytes = 0
        wave_slots = 0

        def emit():
            nonlocal wave, wave_bytes, wave_slots
            if wave:
                wave_q.put((wave_slots, wave))
                wave, wave_bytes, wave_slots = [], 0, 0

        def open_wave(slots):
            nonlocal wave_slots
            for _ in range(slots):
                inflight.acquire()
            wave_slots = slots

        try:
            for f in video_files:
                def probe(f=f):
                    reader = VideoReader(f)
                    T = reader.video_len
                    reader.release()
                    return T

                T, ok = _guard(f, probe)
                if not ok:
                    continue
                bucket_T = -(-max(T, 1) // bucket_quantum) * bucket_quantum
                vid_bytes = bucket_T * frame_bytes
                if vid_bytes > staging_budget_bytes:
                    streaming.append(f)  # handled after the staged waves
                    continue
                solo = vid_bytes > wave_budget
                if wave and (solo or wave_bytes + vid_bytes > wave_budget):
                    emit()
                if not wave:
                    open_wave(2 if solo else 1)
                up, ok = _guard(f, lambda f=f: predictor.upload_video_slabs(f))
                if ok:
                    slabs, src_wh, yuv = up
                    wave.append((f, slabs, src_wh, yuv))
                    wave_bytes += vid_bytes
                    if solo:
                        emit()
                elif not wave:
                    # failed first video: wave not born, return its slots
                    for _ in range(wave_slots):
                        inflight.release()
                    wave_slots = 0
            emit()
        except BaseException as e:  # noqa: BLE001 - re-raised by consumer
            producer_err.append(e)
            for _ in range(wave_slots):
                inflight.release()
        finally:
            wave_q.put(SENTINEL)

    def consume_wave(slots, wave):
        # Finalize AFTER every wave member is uploaded: finalize runs a
        # device program; each video's slabs are dropped right after its
        # finalize, so peak HBM stays ~wave_bytes + one bucket.
        wave_stat = {"videos": [f for (f, *_rest) in wave], "slots": slots,
                     "buckets": []}
        stats["waves"].append(wave_stat)
        staged_wave: List[Tuple[str, StagedVideo]] = []
        for k, (f, slabs, src_wh, yuv) in enumerate(wave):
            def fin(f=f, slabs=slabs, src_wh=src_wh, yuv=yuv):
                return predictor.finalize_staged(
                    slabs, bgr=True, src_wh=src_wh,
                    bucket_frames=bucket_quantum, yuv=yuv,
                )

            staged, ok = _guard(f, fin)
            wave[k] = None  # drop slab refs -> HBM freed
            if ok:
                wave_stat["buckets"].append(int(staged.buf.shape[0]))
                staged_wave.append((f, staged))
        for f, staged in staged_wave:
            def run(f=f, staged=staged):
                pred = predictor.run_staged(staged, mesh=mesh)
                return _finish(f, pred, staged.src_wh)

            pred, ok = _guard(f, run)
            if ok:
                results[f] = pred

    prod_thread = threading.Thread(target=producer, daemon=True)
    prod_thread.start()
    while True:
        item = wave_q.get()
        if item is SENTINEL:
            break
        slots, wave = item
        try:
            consume_wave(slots, wave)
        finally:
            del wave, item  # free staged buffers before the next wave
            for _ in range(slots):
                inflight.release()
    prod_thread.join()
    if producer_err:
        raise producer_err[0]

    stats["streaming"] = list(streaming)
    if streaming and mesh is not None:
        print(
            f"warning: {len(streaming)} video(s) exceed the staging budget "
            "and fall back to single-device streaming (num_devices ignored "
            "for them)",
            file=sys.stderr,
        )
    for f in streaming:
        def stream(f=f):
            pred = predictor.predict_video_streaming(
                f, max_sample_num=max_sample_num
            )
            reader = VideoReader(f)
            src_wh = (reader.w, reader.h)
            reader.release()
            return _finish(f, pred, src_wh)

        pred, ok = _guard(f, stream)
        if ok:
            results[f] = pred
    return results
