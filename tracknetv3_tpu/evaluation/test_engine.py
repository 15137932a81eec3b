"""Rally-based test engine: the `test.py` evaluation surface.

Mirrors the reference flow (reference: test.py:521-906): iterate every
rally of a split, run TrackNet (heatmap) or TrackNet+InpaintNet
(coordinate) pipelines in nonoverlap or temporal-ensemble eval modes,
classify every frame into the 5-way confusion, aggregate with drop-frame
windowing for the test split, and optionally write per-rally
``predicted_csv`` files (the InpaintNet training data generator).

TPU-native: rally frames come from the uint8 FrameCache (each PNG decoded
once, ever); window assembly, forward, ensembling and decoding run as the
same fused device programs the inference engine uses.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COOR_TH, HEIGHT, PRED_TYPES, PRED_TYPES_MAP, WIDTH
from ..data.dataset import FrameCache, build_rally_coordinate_index
from ..ops.detect import decode_heatmaps
from ..ops.ensemble import (
    ensemble_chunk,
    ensemble_flush,
    ensemble_init,
    ensemble_update_fn,
    get_ensemble_weight,
)
from ..ops.postprocess import generate_inpaint_mask, linear_interp
from ..ops.preprocess import gather_windows, window_channels
from ..utils.io import (
    get_rally_dirs,
    label_csv_path,
    parse_rally_dir,
    read_label_csv,
    write_pred_csv,
)
from .metrics import (
    classify_detections,
    gt_center_from_label,
    metrics_dict,
)


class RallyTestEngine:
    """Evaluates rallies with a loaded TrackNet (and optional InpaintNet)."""

    def __init__(
        self,
        tracknet,  # (model, variables) or None
        inpaintnet=None,  # (model, variables) or None
        *,
        tracknet_seq_len: int = 8,
        inpaintnet_seq_len: int = 16,
        bg_mode: str = "",
        eval_mode: str = "weight",
        batch_size: int = 16,
        tolerance: float = 4.0,
        num_workers: int = 0,  # accepted for CLI parity; unused (no worker procs)
        mesh=None,  # jax.sharding.Mesh: shard window batches across chips
        exact_decode=False,  # largest-bbox-area rule: True=device, "host"=host CCL
        input_hw=None,  # (H, W) model resolution; default config HEIGHT x WIDTH
    ):
        self.tracknet = tracknet
        self.inpaintnet = inpaintnet
        self.seq_len = tracknet_seq_len
        self.inpaint_seq_len = inpaintnet_seq_len
        self.bg_mode = bg_mode
        self.h, self.w = input_hw if input_hw is not None else (HEIGHT, WIDTH)
        self.eval_mode = eval_mode
        self.batch_size = batch_size
        self.tolerance = tolerance
        self.mesh = mesh
        # exact_decode: apply the reference's exact largest-bbox-area
        # blob-choice rule (reference test.py:52-79) instead of the
        # production peak-blob kernel. True (the default exact mode) runs
        # the rule ON DEVICE (ops.detect.decode_heatmaps_exact - same
        # packed-decode fetch shape as production, no heatmap D2H);
        # "host" keeps the original host path (native CCL / scipy, full
        # heatmap fetch per rally) as the unbounded oracle.
        self.exact_decode = exact_decode
        from ..ops.detect import decode_heatmaps_exact

        self._decode = (
            decode_heatmaps_exact
            if (exact_decode and exact_decode != "host")
            else decode_heatmaps
        )
        if mesh is not None:
            assert batch_size % mesh.size == 0, (
                f"batch_size {batch_size} not divisible by mesh size {mesh.size}"
            )
        if tracknet is not None:
            from ..models.fused_forward import fold_batchnorm

            self._folded = fold_batchnorm(
                {"params": tracknet[1]["params"], "batch_stats": tracknet[1]["batch_stats"]}
            )
        if eval_mode != "nonoverlap" and tracknet is not None:
            self._weights = jnp.asarray(get_ensemble_weight(self.seq_len, eval_mode))
        # Params ride as a leading runtime ARGUMENT into every jitted step
        # (bound below) instead of being closed over: embedded-constant
        # weights bloat persistent-cache executables to ~72 MB, which this
        # runtime deserializes at ~1 MB/s - a cross-process cache HIT then
        # costs as much as the compile (PROFILE.md "Round-5: the
        # cold-start regression"). Same design as TrackNetPredictor.
        self._folded_dev = None
        self._ivars_dev = None
        self._nonoverlap_step = self._bind_folded(
            jax.jit(self._nonoverlap_step_impl)
        )
        self._inpaint_fwd = self._bind_ivars(jax.jit(self._inpaint_fwd_impl))
        self._staged_rallies: Dict[str, tuple] = {}
        self._jit_cache: Dict[tuple, object] = {}
        self._overlap_tail_step = self._bind_folded(
            jax.jit(self._overlap_tail_step_impl, donate_argnums=(4,))
        )
        self.last_eval_stats: Dict[str, float] = {}

    # ------------------------- TrackNet device steps -------------------------

    def _bind_folded(self, jitted):
        wrapper = lambda *args: jitted(self._folded_device(), *args)  # noqa: E731
        wrapper._cache_size = jitted._cache_size
        return wrapper

    def _bind_ivars(self, jitted):
        wrapper = lambda *args: jitted(self._ivars_device(), *args)  # noqa: E731
        wrapper._cache_size = jitted._cache_size
        return wrapper

    def _folded_device(self):
        if self._folded_dev is None:
            self._folded_dev = jax.tree_util.tree_map(jnp.asarray, self._folded)
        return self._folded_dev

    def _ivars_device(self):
        if self._ivars_dev is None:
            self._ivars_dev = jax.tree_util.tree_map(
                jnp.asarray, self.inpaintnet[1]
            )
        return self._ivars_dev

    def _forward_cached(self, folded, rgb, diff, median, starts):
        """Window assembly from cached resized frames + U-Net forward."""
        from ..models.fused_forward import tracknet_fused_forward

        L = self.seq_len
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
        med = median.astype(jnp.float32) if median is not None else None
        x = window_channels(rgb_w, diff_w, med, self.bg_mode)
        if self.mesh is not None:
            # shard the window batch across the data mesh; GSPMD
            # partitions the U-Net per chip and inserts the collectives
            # the cross-window ensemble slices need (same pattern as
            # inference.TrackNetPredictor._shard_windows)
            from ..parallel.mesh import batch_sharding

            x = jax.lax.with_sharding_constraint(x, batch_sharding(self.mesh))
        probs = tracknet_fused_forward(folded, x)
        return jnp.moveaxis(probs, -1, 1)  # (B, L, H, W)

    @staticmethod
    def _pack_dec(dec):
        """One (N, 8) f32 array [cx, cy, vis, conf, bbox*4]: a single
        device-side concat + fetch instead of one RPC per field/chunk."""
        return jnp.concatenate(
            [
                dec["cx"][:, None].astype(jnp.float32),
                dec["cy"][:, None].astype(jnp.float32),
                dec["vis"][:, None].astype(jnp.float32),
                dec["conf"][:, None].astype(jnp.float32),
                dec["bbox"].astype(jnp.float32),
            ],
            axis=1,
        )

    def _overlap_tail_step_impl(self, folded, rgb, diff, median, state, w0, n_valid):
        """Carried-tail overlap chunk: forwards exactly B windows (the
        stateless form recomputes L-1 boundary windows per chunk, +22%
        FLOPs at B=16); ensemble tail is donated between dispatches."""
        B = self.batch_size
        wins = self._forward_cached(folded, rgb, diff, median, w0 + jnp.arange(B))
        state, frames = ensemble_update_fn(
            state, wins.astype(jnp.float32), self._weights, n_valid
        )
        return state, self._pack_dec(self._decode(frames))

    def _overlap_collect_fn(self, n_chunks):
        """Fused flush + concat (one dispatch + one fetch).

        Keyed ONLY by the chunk count, padded to a power-of-two bucket by
        the caller: keying on the per-rally valid-row counts would compile
        a distinct XLA program per distinct rally length (seconds-to-
        minutes each on this remote compiler), defeating the Tp=128 frame
        bucketing. Valid-row selection moves to the host: all chunks
        except the last are full, so the valid body rows are simply the
        first S of the stacked packs, and the flush tail rows follow at
        offset n_chunks*B."""
        key = ("collect", n_chunks)
        if key not in self._jit_cache:

            def impl(state, packs):
                body = jnp.concatenate(packs, axis=0)
                if self.seq_len > 1:
                    tail = self._pack_dec(self._decode(ensemble_flush(state)))
                    return jnp.concatenate([body, tail], axis=0)
                return body

            self._jit_cache[key] = jax.jit(impl, donate_argnums=(0,))
        return self._jit_cache[key]

    def _nonoverlap_step_impl(self, folded, rgb, diff, median, starts):
        wins = self._forward_cached(folded, rgb, diff, median, starts)
        flat = wins.reshape((-1,) + wins.shape[2:])
        return self._pack_dec(self._decode(flat))

    # ----------------------- exact-decode device steps -----------------------
    # These return the ENSEMBLED HEATMAPS instead of decoding on device;
    # the host then applies the reference's exact largest-bbox-area rule.

    def _overlap_tail_step_frames(self):
        key = ("overlap_frames",)
        if key not in self._jit_cache:

            def impl(folded, rgb, diff, median, state, w0, n_valid):
                B = self.batch_size
                wins = self._forward_cached(folded, rgb, diff, median, w0 + jnp.arange(B))
                state, frames = ensemble_update_fn(
                    state, wins.astype(jnp.float32), self._weights, n_valid
                )
                return state, frames

            self._jit_cache[key] = self._bind_folded(
                jax.jit(impl, donate_argnums=(4,))
            )
        return self._jit_cache[key]

    def _nonoverlap_step_frames(self):
        key = ("nonoverlap_frames",)
        if key not in self._jit_cache:

            def impl(folded, rgb, diff, median, starts):
                wins = self._forward_cached(folded, rgb, diff, median, starts)
                return wins.reshape((-1,) + wins.shape[2:])

            self._jit_cache[key] = self._bind_folded(jax.jit(impl))
        return self._jit_cache[key]

    def _concat_frames_fn(self, n_parts, with_tail: bool):
        """Fused (flush +) concat of per-chunk heatmap stacks: ONE device
        program + ONE fetch per rally. Keyed by the power-of-two-padded
        part count (per-rally counts would compile one program per
        distinct rally length on the minutes-slow remote compiler)."""
        key = ("concat_frames", n_parts, with_tail)
        if key not in self._jit_cache:

            def impl(parts, state):
                body = jnp.concatenate(parts, axis=0)
                if with_tail:
                    return jnp.concatenate([body, ensemble_flush(state)], axis=0)
                return body

            self._jit_cache[key] = jax.jit(impl, donate_argnums=(1,))
        return self._jit_cache[key]

    @staticmethod
    def _pad_pow2(parts):
        n_pad = 1 << max(len(parts) - 1, 0).bit_length()
        return parts + [parts[-1]] * (n_pad - len(parts)), n_pad

    def _predict_rally_heatmap_exact(
        self, rgb_dev, diff_dev, med_dev, T: int
    ) -> Dict[str, np.ndarray]:
        """Rally prediction under the exact reference decode rule: device
        forward + ensemble, ONE heatmap fetch per rally, host CCL decode.

        Heatmap rows (not packed decodes) cross the link here - that is
        the cost of host-rule decoding - but still as a single device-side
        concat + one fetch, not one RPC per chunk."""
        from ..ops.detect import decode_heatmaps_host

        L, B = self.seq_len, self.batch_size
        if self.eval_mode == "nonoverlap":
            step = self._nonoverlap_step_frames()
            n_win = -(-T // L)
            parts = []
            for s in range(0, n_win, B):
                starts = np.minimum(np.arange(s, s + B) * L, max(T - 1, 0))
                parts.append(step(rgb_dev, diff_dev, med_dev,
                                  jnp.asarray(starts, jnp.int32)))
            # all parts but the last are fully valid, so the first T rows
            # of the padded concat are exactly the rally's frames
            padded, n_pad = self._pad_pow2(parts)
            concat = self._concat_frames_fn(n_pad, with_tail=False)
            frames = np.asarray(concat(tuple(padded), None))[:T]
        else:
            S = max(T - L + 1, 1)
            fshape = (rgb_dev if rgb_dev is not None else diff_dev).shape[1:3]
            state = ensemble_init(L, fshape)
            step = self._overlap_tail_step_frames()
            parts = []
            for w0 in range(0, S, B):
                nv = min(B, S - w0)
                state, frames_b = step(
                    rgb_dev, diff_dev, med_dev, state, jnp.int32(w0), jnp.int32(nv)
                )
                parts.append(frames_b)
            tail_n = T - S
            padded, n_pad = self._pad_pow2(parts)
            concat = self._concat_frames_fn(n_pad, with_tail=tail_n > 0)
            full = np.asarray(concat(tuple(padded), state))
            frames = (
                np.concatenate(
                    [full[:S], full[n_pad * B : n_pad * B + tail_n]], axis=0
                )[:T]
                if tail_n > 0
                else full[:T]
            )
        dec = decode_heatmaps_host(frames)
        return {
            "cx": dec["cx"].astype(np.int64),
            "cy": dec["cy"].astype(np.int64),
            "conf": dec["conf"],
            "bbox": dec["bbox"].astype(np.int64),
        }

    # --------------------------- TrackNet pipeline ---------------------------

    @staticmethod
    def _pad_bucket(n: int, step: int = 128) -> int:
        return -(-n // step) * step

    def _stage_rally(self, cache: FrameCache, rally_dir: str, frame_ids):
        """Pad + upload one rally's cached frames (bucketed lengths share
        compiled programs)."""
        rgb_all, diff_all, med = cache.load(rally_dir)
        need_rgb = self.bg_mode in ("", "subtract_concat", "concat")
        Tp = self._pad_bucket(len(frame_ids))

        def pad(x):
            if x.shape[0] == Tp:
                return x
            reps = np.repeat(x[-1:], Tp - x.shape[0], axis=0)
            return np.concatenate([x, reps], axis=0)

        put = jnp.asarray
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            repl = replicated(self.mesh)

            def put(x):
                return jax.device_put(x, repl)

        rgb_dev = put(pad(rgb_all[frame_ids])) if need_rgb else None
        diff_dev = (
            put(pad(diff_all[frame_ids][..., None]))
            if diff_all is not None
            else None
        )
        med_dev = put(med) if med is not None else None
        return rgb_dev, diff_dev, med_dev

    def prestage(
        self,
        data_dir: str,
        rally_dirs,
        cache: FrameCache,
        budget_bytes: float = 8e9,
    ) -> int:
        """Upload every rally's frames BEFORE the first device program
        executes (VERDICT r1 weak item 4: per-rally uploads were paying
        the degraded ~36 MB/s post-execution H2D path). Stops at
        ``budget_bytes`` of device memory; remaining rallies upload
        lazily. Returns the number of rallies staged."""
        if self.tracknet is None or self.inpaintnet is not None:
            # The InpaintNet eval path reads predicted_csv trajectories
            # only (reference test.py:696-792) - staging frames for it
            # would upload/pin GBs that no program ever touches.
            return 0
        used = 0.0
        n = 0
        for rally_dir in rally_dirs:
            if rally_dir in self._staged_rallies:
                n += 1
                continue
            match_dir, rally_id = parse_rally_dir(rally_dir)
            df = read_label_csv(label_csv_path(match_dir, rally_id))
            frame_ids = df["Frame"].to_numpy(np.int64)
            staged = self._stage_rally(cache, rally_dir, frame_ids)
            size = sum(x.nbytes for x in staged if x is not None)
            if used + size > budget_bytes and n > 0:
                break
            self._staged_rallies[rally_dir] = staged
            used += size
            n += 1
        return n

    def predict_rally_heatmap(
        self, cache: FrameCache, rally_dir: str, frame_ids: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Per-frame decoded predictions (input space) for one rally.

        The rally's cached frames are uploaded once (padded to a length
        bucket so different rallies share compiled programs) and all
        window assembly/forward/ensemble/decode runs on device in
        stateless chunks. Rallies uploaded by ``prestage`` (before the
        first program execution, while the fast H2D path is available -
        see PROFILE.md) are used directly."""
        T = len(frame_ids)
        L, B = self.seq_len, self.batch_size
        staged = self._staged_rallies.get(rally_dir)
        if staged is None:
            staged = self._stage_rally(cache, rally_dir, frame_ids)
        rgb_dev, diff_dev, med_dev = staged

        if self.exact_decode == "host":
            return self._predict_rally_heatmap_exact(rgb_dev, diff_dev, med_dev, T)

        if self.eval_mode == "nonoverlap":
            # packed (B*L, 8) chunks -> one device concat + ONE fetch
            n_win = -(-T // L)
            packs, nvs = [], []
            for s in range(0, n_win, B):
                b = min(B, n_win - s)
                starts = np.minimum(np.arange(s, s + B) * L, max(T - 1, 0))
                packs.append(
                    self._nonoverlap_step(
                        rgb_dev, diff_dev, med_dev, jnp.asarray(starts, jnp.int32)
                    )
                )
                nvs.append(b * L)
            # gather_windows clips starts+j at T-1; the buffer is padded
            # with repeats of the last frame, giving the same
            # repeat-last-frame padding as the reference dataset.
            arr = np.asarray(
                jnp.concatenate([p[:nv] for p, nv in zip(packs, nvs)], axis=0)
            )[:T]
            return {
                "cx": arr[:, 0].astype(np.int64),
                "cy": arr[:, 1].astype(np.int64),
                "conf": arr[:, 3],
                "bbox": arr[:, 4:8].astype(np.int64),
            }
        else:
            # carried-tail chunks: every window forwarded exactly once,
            # one fused flush+concat dispatch, ONE small fetch per rally
            S = max(T - L + 1, 1)
            fshape = (rgb_dev if rgb_dev is not None else diff_dev).shape[1:3]
            state = ensemble_init(L, fshape)
            packs = []
            for w0 in range(0, S, B):
                nv = min(B, S - w0)
                state, packed = self._overlap_tail_step(
                    rgb_dev, diff_dev, med_dev, state,
                    jnp.int32(w0), jnp.int32(nv),
                )
                packs.append(packed)
            # pad the pack list to a power-of-two count so the collect
            # program is shared across rally lengths (garbage rows are
            # sliced away below; the repeats cost only a tiny concat)
            packs_padded, n_pad = self._pad_pow2(packs)
            collect = self._overlap_collect_fn(n_pad)
            full = np.asarray(collect(state, tuple(packs_padded)))
            tail_n = T - S
            arr = np.concatenate(
                [full[:S], full[n_pad * B : n_pad * B + tail_n]], axis=0
            )[:T]
            return {
                "cx": arr[:, 0].astype(np.int64),
                "cy": arr[:, 1].astype(np.int64),
                "conf": arr[:, 3],
                "bbox": arr[:, 4:8].astype(np.int64),
            }


    # --------------------------- InpaintNet pipeline -------------------------

    def _inpaint_fwd_impl(self, ivars, cw, mw):
        model, _ = self.inpaintnet
        out = model.apply(ivars, cw, mw)
        out = out * mw + cw * (1.0 - mw)
        th = (out[..., 0] < COOR_TH) & (out[..., 1] < COOR_TH)
        return jnp.where(th[..., None], 0.0, out)

    def predict_rally_coordinate(self, rally_dir: str) -> Dict[str, np.ndarray]:
        """InpaintNet refinement over a rally's predicted_csv trajectory.

        Returns per-frame normalized refined coords plus the GT/pred
        references needed for classification."""
        match_dir, rally_id = parse_rally_dir(rally_dir)
        data = build_rally_coordinate_index(
            "", rally_dir, 0, self.inpaint_seq_len,
            1 if self.eval_mode != "nonoverlap" else self.inpaint_seq_len,
            padding=self.eval_mode == "nonoverlap",
        )
        csv_file = os.path.join(match_dir, "predicted_csv", f"{rally_id}_ball.csv")
        df = read_label_csv(csv_file)
        T = len(df)
        L = self.inpaint_seq_len
        norm = np.asarray([self.w, self.h], np.float32)

        S = len(data["id"])
        pad_S = self._pad_bucket(max(S + L - 1, 1), 64)
        cwin = data["coor_pred"] / norm
        mwin = data["inpaint_mask"][..., None]
        if S < pad_S:
            z = lambda a: np.concatenate(  # noqa: E731
                [a, np.zeros((pad_S - S,) + a.shape[1:], a.dtype)], axis=0
            )
            cwin, mwin = z(cwin), z(mwin)
        out = self._inpaint_fwd(jnp.asarray(cwin), jnp.asarray(mwin))

        if self.eval_mode == "nonoverlap":
            ids = data["id"][..., 1].reshape(-1)
            flat = np.asarray(out)[:S].reshape(-1, 2)
            # dedup padded repeats (keep first occurrence per frame pos)
            _, first = np.unique(ids, return_index=True)
            refined = flat[np.sort(first)][:T]
        else:
            w = jnp.asarray(get_ensemble_weight(L, self.eval_mode))
            lead = jnp.zeros((L - 1, L, 2))
            wins = jnp.concatenate([lead, out], axis=0)
            ens = ensemble_chunk(wins, w, jnp.int32(0), jnp.int32(S))
            th = (ens[..., 0] < COOR_TH) & (ens[..., 1] < COOR_TH)
            refined = np.asarray(jnp.where(th[..., None], 0.0, ens))[:T]

        return {
            "refined": refined,  # (T, 2) normalized by (self.w, self.h)
            "coor_gt": df[["X_GT", "Y_GT"]].to_numpy(np.float32) / norm,
            "coor_pred": df[["X", "Y"]].to_numpy(np.float32) / norm,
            "frame": df["Frame"].to_numpy(np.int64),
        }

    # ------------------------------ test_rally ------------------------------

    def test_rally(
        self,
        data_dir: str,
        rally_dir: str,
        cache: FrameCache,
        save_inpaint_mask: bool = False,
        output_bbox: bool = False,
        output_gt: bool = False,
    ) -> Dict[str, list]:
        match_dir, rally_id = parse_rally_dir(rally_dir)
        df = read_label_csv(label_csv_path(match_dir, rally_id))
        from PIL import Image

        with Image.open(os.path.join(rally_dir, "0.png")) as im:
            w, h = im.size
        if save_inpaint_mask:
            w_s, h_s = 1.0, 1.0
        else:
            w_s, h_s = w / self.w, h / self.h

        if self.inpaintnet is None:
            frame_ids = df["Frame"].to_numpy(np.int64)
            dec = self.predict_rally_heatmap(cache, rally_dir, frame_ids)
            cx_t, cy_t = gt_center_from_label(
                df["X"].to_numpy(), df["Y"].to_numpy(), w / self.w, h / self.h
            )
            types = classify_detections(
                dec["cx"], dec["cy"], cx_t, cy_t, self.tolerance
            )
            vis = (np.maximum(dec["cx"], dec["cy"]) > 0).astype(int)
            pred = {
                "Frame": list(range(len(frame_ids))),
                "X": [int(v * w_s) for v in dec["cx"]],
                "Y": [int(v * h_s) for v in dec["cy"]],
                "Visibility": vis.tolist(),
                "Type": types.tolist(),
            }
            if output_bbox:
                pred["BBox"] = [
                    [
                        int(b[0] * w_s),
                        int(b[1] * h_s),
                        int(b[2] * w_s),
                        int(b[3] * h_s),
                    ]
                    for b in dec["bbox"]
                ]
                pred["Confidence"] = [float(c) for c in dec["conf"]]
            if output_gt or save_inpaint_mask:
                vis_gt = (np.maximum(cx_t, cy_t) > 0).astype(int)
                pred["X_GT"] = [int(v * w_s) for v in cx_t]
                pred["Y_GT"] = [int(v * h_s) for v in cy_t]
                pred["Visibility_GT"] = vis_gt.tolist()
            # th_h=30 is an INPUT-space height threshold (reference
            # test.py:694), so the gap scan always runs on input-space
            # coordinates - pred["Y"] is in original space when
            # save_inpaint_mask is False (w_s != 1).
            mask_view = {
                "Visibility": vis.tolist(),
                "Y": [int(v) for v in dec["cy"]],
            }
            pred["Inpaint_Mask"] = generate_inpaint_mask(mask_view, th_h=30)
            return pred
        else:
            out = self.predict_rally_coordinate(rally_dir)
            cx_p = (out["refined"][:, 0] * self.w).astype(np.int64)
            cy_p = (out["refined"][:, 1] * self.h).astype(np.int64)
            cx_t = (out["coor_gt"][:, 0] * self.w).astype(np.int64)
            cy_t = (out["coor_gt"][:, 1] * self.h).astype(np.int64)
            types = classify_detections(cx_p, cy_p, cx_t, cy_t, self.tolerance)
            vis = (np.maximum(cx_p, cy_p) > 0).astype(int)
            return {
                "Frame": list(range(len(cx_p))),
                "X": [int(v * w_s) for v in cx_p],
                "Y": [int(v * h_s) for v in cy_p],
                "Visibility": vis.tolist(),
                "Type": types.tolist(),
            }

    def test_rally_linear(
        self, data_dir: str, rally_dir: str, cache: FrameCache
    ) -> Dict[str, list]:
        """Linear-interpolation baseline (reference: test.py:794-906)."""
        match_dir, rally_id = parse_rally_dir(rally_dir)
        pred = self.test_rally(data_dir, rally_dir, cache, save_inpaint_mask=False)
        # test_rally returns original-space X/Y; rebuild input-space coords.
        df = read_label_csv(label_csv_path(match_dir, rally_id))
        from PIL import Image

        with Image.open(os.path.join(rally_dir, "0.png")) as im:
            w, h = im.size
        w_s, h_s = w / self.w, h / self.h

        x_in = np.asarray(pred["X"], np.float64) / w_s
        y_in = np.asarray(pred["Y"], np.float64) / h_s
        mask = pred["Inpaint_Mask"]
        x_interp = linear_interp(x_in, mask)
        y_interp = linear_interp(y_in, mask)

        cx_t = (df["X"].to_numpy(np.float64) / w * self.w).astype(np.int64)
        cy_t = (df["Y"].to_numpy(np.float64) / h * self.h).astype(np.int64)
        cx_p = x_interp.astype(np.int64)
        cy_p = y_interp.astype(np.int64)
        types = classify_detections(cx_p, cy_p, cx_t, cy_t, self.tolerance)
        vis = (np.maximum(cx_p, cy_p) > 0).astype(int)
        return {
            "Frame": list(range(len(cx_p))),
            "X": [int(v * w_s) for v in cx_p],
            "Y": [int(v * h_s) for v in cy_p],
            "Visibility": vis.tolist(),
            "Type": types.tolist(),
        }

    # -------------------------------- test ----------------------------------

    def test(
        self,
        data_dir: str,
        split: str,
        save_inpaint_mask: bool = False,
        use_linear_interp: bool = False,
        output_bbox: bool = False,
        output_gt: bool = False,
        debug: bool = False,
        verbose: bool = False,
    ) -> Dict[str, Dict]:
        import time

        pred_dict = {}
        rally_dirs = [
            os.path.join(data_dir, rd) for rd in get_rally_dirs(data_dir, split)
        ]
        if debug:
            rally_dirs = rally_dirs[:1]
        # Multi-host: rallies are sharded round-robin across jax.distributed
        # processes (round-robin, not contiguous blocks, so long and short
        # rallies spread evenly); each process prestages/evaluates only its
        # shard and the per-rally pred dicts merge by all-gather at the end,
        # leaving every process with the identical full pred_dict. The
        # reference has no distributed path (SURVEY SS2 parallelism row); this
        # is the multi-host extension contract for the rally test engine.
        pc, pi = jax.process_count(), jax.process_index()
        my_rallies = rally_dirs if pc == 1 else rally_dirs[pi::pc]
        cache = FrameCache(data_dir, self.bg_mode, input_hw=(self.h, self.w))
        t0 = time.time()
        if self.tracknet is not None and not use_linear_interp:
            n_staged = self.prestage(data_dir, my_rallies, cache)
            if verbose:
                print(f"  prestaged {n_staged}/{len(my_rallies)} rallies")
        for rally_dir in my_rallies:
            match_dir, rally_id = parse_rally_dir(rally_dir)
            match_id = match_dir.split("match")[-1]
            rally_key = f"{match_id}_{rally_id}"
            if verbose:
                print(f"  rally {rally_key}")
            if use_linear_interp:
                pred = self.test_rally_linear(data_dir, rally_dir, cache)
            else:
                pred = self.test_rally(
                    data_dir,
                    rally_dir,
                    cache,
                    save_inpaint_mask=save_inpaint_mask,
                    output_bbox=output_bbox,
                    output_gt=output_gt,
                )
            pred_dict[rally_key] = pred
        if pc > 1:
            pred_dict = self._merge_pred_dicts(pred_dict, rally_dirs)
        if save_inpaint_mask:
            # Write predicted_csv from the MERGED dict so every process
            # holds the full CSV set even without a shared filesystem
            # (ADVICE r4: writing inside the per-shard loop left each host
            # with a partial set, breaking the downstream InpaintNet flows
            # that read these CSVs).
            for rally_dir in rally_dirs:
                match_dir, rally_id = parse_rally_dir(rally_dir)
                rally_key = f"{match_dir.split('match')[-1]}_{rally_id}"
                if rally_key not in pred_dict:
                    continue  # debug=True truncates the rally list
                out_dir = os.path.join(match_dir, "predicted_csv")
                os.makedirs(out_dir, exist_ok=True)
                write_pred_csv(
                    pred_dict[rally_key],
                    os.path.join(out_dir, f"{rally_id}_ball.csv"),
                    save_inpaint_mask=True,
                )
        seconds = time.time() - t0
        frames = sum(len(p["Frame"]) for p in pred_dict.values())
        self.last_eval_stats = dict(
            frames=frames,
            seconds=round(seconds, 3),
            fps=round(frames / seconds, 2) if seconds > 0 else 0.0,
        )
        return pred_dict

    @staticmethod
    def _merge_pred_dicts(local: Dict[str, Dict], rally_dirs) -> Dict[str, Dict]:
        """All-gather each process's per-rally pred dicts and merge them in
        the canonical split order.

        The dicts are ragged (one entry per rally, variable frame counts),
        so they ride as JSON bytes padded to the global max length: an
        initial int64 all-gather exchanges payload sizes, then one u8
        all-gather moves the payloads. JSON, not pickle - pred dicts are
        lists of Python ints/floats by construction (test_rally), and the
        same bytes are what test.py writes to the eval-analysis artifact,
        so the transport cannot change the result. Every process returns
        the identical merged dict, ordered like a single-process run.
        """
        from jax.experimental import multihost_utils

        payload = np.frombuffer(json.dumps(local).encode(), np.uint8)
        # int32 explicitly: with jax_enable_x64 off, an int64 array would be
        # silently downcast in transport, so a >2 GiB payload would wrap
        # negative and corrupt the merge. Assert instead of wrapping
        # (ADVICE r4); shard the split across more processes if this trips.
        if payload.size >= 2**31:
            raise ValueError(
                f"per-process pred-dict payload is {payload.size} bytes, "
                "over the 2 GiB int32 all-gather limit - use more processes "
                "or fewer output fields (output_bbox/output_gt)"
            )
        sizes = np.asarray(
            multihost_utils.process_allgather(np.array([payload.size], np.int32))
        ).reshape(-1)
        buf = np.zeros(int(sizes.max()), np.uint8)
        buf[: payload.size] = payload
        stacked = np.asarray(multihost_utils.process_allgather(buf))
        if stacked.ndim == 1:  # single process: allgather returns unstacked
            stacked = stacked[None]
        merged: Dict[str, Dict] = {}
        for i in range(len(sizes)):
            merged.update(json.loads(stacked[i, : int(sizes[i])].tobytes().decode()))
        ordered = {}
        for rally_dir in rally_dirs:
            match_dir, rally_id = parse_rally_dir(rally_dir)
            key = f"{match_dir.split('match')[-1]}_{rally_id}"
            ordered[key] = merged[key]
        return ordered


def get_test_res(pred_dict: Dict, data_dir: str, drop: bool = False) -> Dict:
    """Aggregate the 5-way confusion over rallies, with optional drop-frame
    windowing (reference: test.py:477-519)."""
    res = {t: 0 for t in PRED_TYPES}
    drop_dict = None
    if drop:
        with open(os.path.join(data_dir, "drop_frame.json")) as f:
            drop_dict = json.load(f)
    for rally_key, pred in pred_dict.items():
        types = np.asarray(pred["Type"])
        if drop_dict is not None:
            s = drop_dict["start"][rally_key]
            e = drop_dict["end"][rally_key]
            types = types[s:e]
        for t in PRED_TYPES:
            res[t] += int((types == PRED_TYPES_MAP[t]).sum())
    confusion = np.asarray([res[t] for t in PRED_TYPES], np.float64)
    return metrics_dict(confusion)
