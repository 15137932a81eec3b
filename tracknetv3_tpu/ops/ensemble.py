"""Streaming temporal ensemble over overlapping inference windows.

With sliding_step=1, frame ``t`` is covered by up to ``L`` windows; the
final prediction for ``t`` is a weighted sum of the window outputs taken
anti-diagonally. The reference implements this with a Python loop over a
growing CPU tensor buffer per batch element (reference: test.py:637-692,
predict.py:163-209) - quadratic torch.cat churn and completely off-device.

TPU-native design: the ensemble is expressed entirely as STATIC slice
arithmetic. State carries the last L-1 window outputs; a batch update
concatenates the new windows and computes, for every finalized frame,

    out[t] = sum_j weight[L-1-j] * buf[t - j, j]      (anti-diagonal)

as L static slices of the buffer - no scan, no gather, no scatter. (An
earlier formulation used a ring buffer with traced-shift ``jnp.roll`` +
scatter inside ``lax.scan``; that lowered to a pathological program on
TPU - 1.3 s per batch vs ~1 ms for this form.)

Semantics match the reference exactly:
  - warm-up (first L-1 frames): unweighted mean over the windows seen so
    far (reference: test.py:657-660),
  - steady state: weighted sum with ``weight[L-1-j]`` applied to the
    contribution at window offset ``j`` (reference: test.py:663),
  - tail (last L-1 frames, produced by ``flush``): unweighted mean over
    the remaining covering windows (reference: test.py:670-680).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_ensemble_weight(seq_len: int, eval_mode: str) -> np.ndarray:
    """Ensemble weights (reference contract: test.py:25-50).

    'average' -> uniform 1/L; 'weight' -> triangular [1,2,..,ceil(L/2),..,2,1]
    normalized to sum 1.
    """
    if eval_mode == "average":
        return np.full(seq_len, 1.0 / seq_len, dtype=np.float32)
    if eval_mode == "weight":
        w = np.ones(seq_len, dtype=np.float32)
        for i in range(math.ceil(seq_len / 2)):
            w[i] = i + 1
            w[seq_len - i - 1] = i + 1
        return w / w.sum()
    raise ValueError(f"Invalid eval_mode: {eval_mode!r}")


class EnsembleState(NamedTuple):
    """Carried state: the last L-1 window outputs (zeros before the first
    window / for padded windows) and the index of the next frame to
    finalize (== number of real windows consumed)."""

    tail: jax.Array  # (L-1, L, *frame_shape) float32
    next_frame: jax.Array  # scalar int32


try:
    # Allow EnsembleState to appear in jax.export-serialized program
    # signatures (the AOT program cache, inference._acquire_scan).
    jax.export.register_namedtuple_serialization(
        EnsembleState, serialized_name="tracknetv3_tpu.EnsembleState"
    )
except (AttributeError, ValueError):  # older jax / double registration
    pass


def ensemble_init(seq_len: int, frame_shape: Tuple[int, ...]) -> EnsembleState:
    shape = (seq_len - 1, seq_len) + tuple(frame_shape)
    return EnsembleState(
        tail=jnp.zeros(shape, jnp.float32),
        next_frame=jnp.int32(0),
    )


def _bshape(v: jax.Array, ndim: int) -> jax.Array:
    """Reshape (B,) to (B, 1, 1, ...) for broadcasting over frame dims."""
    return v.reshape(v.shape + (1,) * (ndim - 1))


def ensemble_update_fn(
    state: EnsembleState,
    window_preds: jax.Array,
    weights: jax.Array,
    n_valid: jax.Array,
) -> Tuple[EnsembleState, jax.Array]:
    """Consume a batch of consecutive windows; emit one frame per window.

    Only the first ``n_valid`` windows are real; padded windows neither
    contribute nor advance the frame counter (their emitted frames are
    garbage and must be discarded by the caller). This lets the final
    short chunk of a video reuse the same compiled program.

    Args:
        state: carried tail of the previous L-1 window outputs.
        window_preds: (B, L, *frame_shape); window ``b`` of this call is
            global window ``state.next_frame + b``.
        weights: (L,) ensemble weights summing to 1.

    Returns:
        (new_state, frames) with frames (B, *frame_shape): finalized
        predictions for frames next_frame .. next_frame+B-1.
    """
    B, L = window_preds.shape[0], window_preds.shape[1]
    fdims = window_preds.ndim - 1  # L axis + frame dims
    wp = window_preds.astype(jnp.float32)
    # where, not multiply: padded rows may hold arbitrary (even
    # non-finite) values per the contract, and 0 * inf = nan would
    # poison the warm-up/tail frames.
    valid = jnp.arange(B) < n_valid
    wp = jnp.where(valid.reshape((B,) + (1,) * fdims), wp, 0.0)

    buf = jnp.concatenate([state.tail, wp], axis=0)  # (L-1+B, L, *fs)

    # Frame t (batch row b, buf row b+L-1) takes buf[b+L-1-j, j] with
    # weight weights[L-1-j] -- L static slices along the window axis.
    w_rev = weights[::-1].astype(jnp.float32)
    out_w = None
    out_u = None
    for j in range(L):
        contrib = buf[L - 1 - j : L - 1 - j + B, j]
        out_u = contrib if out_u is None else out_u + contrib
        wc = contrib * w_rev[j]
        out_w = wc if out_w is None else out_w + wc

    t = state.next_frame + jnp.arange(B)
    cnt = jnp.minimum(t + 1, L).astype(jnp.float32)
    warm = t < (L - 1)
    frames = jnp.where(
        _bshape(warm, out_u.ndim),
        out_u / _bshape(cnt, out_u.ndim),
        out_w,
    )

    # New tail: the L-1 window outputs preceding the next unfinalized
    # frame. With a full batch that is buf[B:]; with padding it starts at
    # n_valid (padded rows are zeros, matching "window does not exist").
    new_tail = jax.lax.dynamic_slice_in_dim(buf, n_valid, L - 1, axis=0)
    return (
        EnsembleState(new_tail, state.next_frame + n_valid.astype(jnp.int32)),
        frames,
    )


# Jitted entry point; the pure ``ensemble_update_fn`` is for callers that
# compose the update inside their own jitted program (e.g. the carried-tail
# inference chunk, where donation is applied at the outer jit).
ensemble_update_masked = partial(jax.jit, donate_argnums=(0,))(ensemble_update_fn)


def ensemble_update(
    state: EnsembleState, window_preds: jax.Array, weights: jax.Array
) -> Tuple[EnsembleState, jax.Array]:
    """Accumulate a full batch of consecutive windows (no padding)."""
    return ensemble_update_masked(
        state, window_preds, weights, jnp.int32(window_preds.shape[0])
    )


@jax.jit
def ensemble_flush(state: EnsembleState) -> jax.Array:
    """Emit the tail frames S..S+L-2 after the last window S-1.

    Returns (L-1, *frame_shape): unweighted means over the windows that
    covered each tail frame (reference: test.py:670-680). Row k is frame
    S+k; rows beyond the true frame count are zero/garbage and must be
    trimmed by the caller.
    """
    L = state.tail.shape[1]
    S = state.next_frame
    # tail[i] holds window S-L+1+i (zeros if that window does not exist).
    # Tail frame S+k takes tail[i, k+L-1-i] for i in [k, L-2].
    outs = []
    for k in range(L - 1):
        acc = None
        for i in range(k, L - 1):
            c = state.tail[i, k + L - 1 - i]
            acc = c if acc is None else acc + c
        cnt = jnp.minimum(jnp.float32(L - 1 - k), S.astype(jnp.float32))
        outs.append(acc / jnp.maximum(cnt, 1.0))
    return jnp.stack(outs, axis=0)


def ensemble_chunk(
    window_preds: jax.Array,
    weights: jax.Array,
    t0: jax.Array,
    num_windows: jax.Array,
) -> jax.Array:
    """Stateless chunked ensemble: finalize B frames from B+L-1 windows.

    The preferred TPU form: instead of carrying window outputs across
    calls, each chunk recomputes the L-1 boundary windows, so a call has
    no large state in or out (this runtime handles big carried buffers
    poorly) and warm-up/steady/tail all collapse into one formula.

    Args:
        window_preds: (B+L-1, L, *fs); row k is the output of global
            window ``t0 - L + 1 + k`` (contents for out-of-range windows
            are arbitrary - they are masked here).
        weights: (L,) ensemble weights.
        t0: global index of the first frame this chunk finalizes.
        num_windows: S, the total number of real windows (= T - L + 1).

    Returns:
        (B, *fs) finalized frames t0 .. t0+B-1 (rows for frames beyond
        S+L-2 are garbage; the caller trims).
    """
    nwin, L = window_preds.shape[0], window_preds.shape[1]
    B = nwin - (L - 1)
    wp = window_preds.astype(jnp.float32)
    w_global = t0 - (L - 1) + jnp.arange(nwin)
    # where, not multiply: out-of-range rows are documented as arbitrary
    # (0 * inf = nan would leak into the warm-up/tail frames)
    valid = (w_global >= 0) & (w_global < num_windows)
    wp = jnp.where(valid.reshape((nwin,) + (1,) * (wp.ndim - 1)), wp, 0.0)

    w_rev = weights[::-1].astype(jnp.float32)
    out_w = None
    out_u = None
    for j in range(L):
        contrib = wp[L - 1 - j : L - 1 - j + B, j]
        out_u = contrib if out_u is None else out_u + contrib
        wc = contrib * w_rev[j]
        out_w = wc if out_w is None else out_w + wc

    t = t0 + jnp.arange(B)
    # windows covering frame t: [max(0, t-L+1), min(t, S-1)]
    cnt = jnp.minimum(t, num_windows - 1) - jnp.maximum(0, t - L + 1) + 1
    cnt = jnp.maximum(cnt, 1).astype(jnp.float32)
    steady = (t >= L - 1) & (t < num_windows)
    return jnp.where(
        _bshape(steady, out_u.ndim),
        out_w,
        out_u / _bshape(cnt, out_u.ndim),
    )


def ensemble_offline(window_preds: jax.Array, weights: jax.Array) -> jax.Array:
    """Convenience: ensemble all S windows at once -> (S+L-1, *frame_shape)."""
    S, L = window_preds.shape[0], window_preds.shape[1]
    state = ensemble_init(L, window_preds.shape[2:])
    state, frames = ensemble_update(state, window_preds, jnp.asarray(weights))
    tail = ensemble_flush(state)
    return jnp.concatenate([frames, tail], axis=0)
