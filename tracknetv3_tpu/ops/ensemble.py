"""Streaming temporal ensemble over overlapping inference windows.

With sliding_step=1, frame ``t`` is covered by up to ``L`` windows; the
final prediction for ``t`` is a weighted sum of the window outputs taken
anti-diagonally. The reference implements this with a Python loop over a
growing CPU tensor buffer per batch element (reference: test.py:637-692,
predict.py:163-209) - quadratic torch.cat churn and completely off-device.

TPU-native design: the ensemble is a **ring-buffer scan**. State is O(L)
frames; each window's contribution lands on the ring with a single
``jnp.roll``; frame ``t`` is finalized exactly when window ``t`` has been
accumulated. The whole update for a batch of windows is one ``lax.scan``
inside ``jit`` - it fuses with the network forward pass and the decoder so
ensembled frames never leave the device.

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
    """Ring-buffer state; slot ``t % L`` accumulates frame ``t``."""

    acc_w: jax.Array  # (L, *frame_shape) weighted accumulator
    acc_u: jax.Array  # (L, *frame_shape) unweighted accumulator
    count: jax.Array  # (L,) windows accumulated into each slot
    next_frame: jax.Array  # scalar int32: next frame index to finalize


def ensemble_init(seq_len: int, frame_shape: Tuple[int, ...]) -> EnsembleState:
    shape = (seq_len,) + tuple(frame_shape)
    return EnsembleState(
        acc_w=jnp.zeros(shape, jnp.float32),
        acc_u=jnp.zeros(shape, jnp.float32),
        count=jnp.zeros((seq_len,), jnp.float32),
        next_frame=jnp.int32(0),
    )


def _expand(v: jax.Array, ndim: int) -> jax.Array:
    """Reshape (L,) to (L, 1, 1, ...) for broadcasting over frame dims."""
    return v.reshape(v.shape + (1,) * (ndim - 1))


@partial(jax.jit, donate_argnums=(0,))
def ensemble_update(
    state: EnsembleState, window_preds: jax.Array, weights: jax.Array
) -> Tuple[EnsembleState, jax.Array]:
    """Accumulate a batch of consecutive windows; emit one frame per window.

    Args:
        state: current ring state.
        window_preds: (B, L, *frame_shape) float32 window outputs; window
            ``b`` of this call is global window ``state.next_frame + b``.
        weights: (L,) ensemble weights summing to 1.

    Returns:
        (new_state, frames) where frames has shape (B, *frame_shape):
        the finalized predictions for frames next_frame..next_frame+B-1.
    """
    L = state.acc_w.shape[0]
    ndim = state.acc_w.ndim
    # Weight for the contribution at window offset j is weights[L-1-j].
    w_by_offset = weights[::-1].astype(jnp.float32)

    def step(carry, y):
        acc_w, acc_u, count, t = carry
        shift = jnp.mod(t, L)
        # Route offset-j contribution to slot (t + j) % L == roll by t % L.
        contrib_u = jnp.roll(y, shift, axis=0)
        contrib_w = jnp.roll(y * _expand(w_by_offset, ndim), shift, axis=0)
        acc_w = acc_w + contrib_w
        acc_u = acc_u + contrib_u
        count = count + 1.0

        # Finalize frame t living at slot t % L.
        slot = shift
        warm = t < (L - 1)
        frame = jnp.where(
            warm,
            acc_u[slot] / jnp.maximum(count[slot], 1.0),
            acc_w[slot],
        )
        # Reset the slot for frame t + L.
        acc_w = acc_w.at[slot].set(0.0)
        acc_u = acc_u.at[slot].set(0.0)
        count = count.at[slot].set(0.0)
        return (acc_w, acc_u, count, t + 1), frame

    (acc_w, acc_u, count, t), frames = jax.lax.scan(
        step,
        (state.acc_w, state.acc_u, state.count, state.next_frame),
        window_preds.astype(jnp.float32),
    )
    return EnsembleState(acc_w, acc_u, count, t), frames


@jax.jit
def ensemble_flush(state: EnsembleState) -> jax.Array:
    """Emit the tail frames S..S+L-2 after the last window S-1.

    Returns (L-1, *frame_shape): unweighted means over the windows that
    covered each tail frame (empty slots produce zero frames; callers know
    the true tail length is L-1).
    """
    L = state.acc_w.shape[0]
    slots = jnp.mod(state.next_frame + jnp.arange(L - 1), L)
    acc = state.acc_u[slots]
    cnt = state.count[slots]
    return acc / jnp.maximum(_expand(cnt, acc.ndim), 1.0)


def ensemble_offline(window_preds: jax.Array, weights: jax.Array) -> jax.Array:
    """Convenience: ensemble all S windows at once -> (S+L-1, *frame_shape)."""
    S, L = window_preds.shape[0], window_preds.shape[1]
    state = ensemble_init(L, window_preds.shape[2:])
    state, frames = ensemble_update(state, window_preds, jnp.asarray(weights))
    tail = ensemble_flush(state)
    return jnp.concatenate([frames, tail], axis=0)
