"""Loss functions.

- ``wbce``: the focal-style weighted BCE of the TrackNetV2 paper, applied to
  sigmoid probabilities exactly as the reference defines it
  (reference: utils/metric.py:3-20):
      loss = -( (1-p)^2 * y * log(clamp(p)) + p^2 * (1-y) * log(clamp(1-p)) )
  with clamp to [1e-7, 1] and mean (or per-sample mean) reduction.

- ``wbce_from_logits``: numerically-stable fused sigmoid + WBCE used on the
  training hot path. log(sigmoid(z)) is computed via log_sigmoid so the TPU
  never materializes a rounded probability; equals ``wbce(sigmoid(z), y)``
  to f32 tolerance (verified by tests) while avoiding the clamp cliff.

- ``masked_mse``: MSE over masked trajectory positions, the InpaintNet
  training loss (reference: train.py:159-161). NOTE: the reference computes
  MSE over the *whole* tensor after zeroing unmasked positions (divides by
  N*L*2, not by the mask count); we keep those semantics for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def wbce(y_pred: jax.Array, y: jax.Array, reduce: bool = True) -> jax.Array:
    """Weighted BCE on probabilities; mirrors reference utils/metric.py:3-20."""
    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)
    loss = -(
        jnp.square(1.0 - y_pred) * y * jnp.log(jnp.clip(y_pred, _EPS, 1.0))
        + jnp.square(y_pred) * (1.0 - y) * jnp.log(jnp.clip(1.0 - y_pred, _EPS, 1.0))
    )
    if reduce:
        return jnp.mean(loss)
    return jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)


def wbce_from_logits(logits: jax.Array, y: jax.Array, reduce: bool = True) -> jax.Array:
    """Fused sigmoid + WBCE from logits (stable training hot path).

    Upcast-only: bf16 inputs compute in f32 (production), f64 inputs stay
    f64 (the multi-host numerics dryrun)."""
    acc = jnp.result_type(jnp.float32, logits.dtype)
    logits = logits.astype(acc)
    y = y.astype(acc)
    p = jax.nn.sigmoid(logits)
    log_p = jax.nn.log_sigmoid(logits)  # = -softplus(-z)
    log_1mp = jax.nn.log_sigmoid(-logits)  # = -softplus(z)
    # Apply the same clamp floor as the reference so values match bit-for-bit
    # in the saturated tails (log(1e-7) = -16.118...).
    log_floor = jnp.float32(jnp.log(_EPS))
    log_p = jnp.maximum(log_p, log_floor)
    log_1mp = jnp.maximum(log_1mp, log_floor)
    loss = -(jnp.square(1.0 - p) * y * log_p + jnp.square(p) * (1.0 - y) * log_1mp)
    if reduce:
        return jnp.mean(loss)
    return jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """MSE of ``pred*mask`` vs ``target*mask`` (reference: train.py:159-161)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    return jnp.mean(jnp.square(pred * mask - target * mask))
