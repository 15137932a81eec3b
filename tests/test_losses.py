"""Golden-value tests for losses against independent numpy implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from tracknetv3_tpu.ops import masked_mse, wbce, wbce_from_logits


def _np_wbce(p, y):
    # Independent re-statement of the TrackNetV2 paper loss
    # (reference contract: utils/metric.py:15-16).
    eps = 1e-7
    p = np.asarray(p, np.float64)
    y = np.asarray(y, np.float64)
    return -np.mean(
        (1 - p) ** 2 * y * np.log(np.clip(p, eps, 1.0))
        + p**2 * (1 - y) * np.log(np.clip(1 - p, eps, 1.0))
    )


def test_wbce_matches_numpy():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 1, size=(2, 4, 8, 8)).astype(np.float32)
    y = (rng.uniform(0, 1, size=(2, 4, 8, 8)) > 0.9).astype(np.float32)
    got = float(wbce(jnp.asarray(p), jnp.asarray(y)))
    want = _np_wbce(p, y)
    assert abs(got - want) < 1e-5


def test_wbce_perfect_prediction_is_zero():
    y = jnp.zeros((1, 4, 4))
    assert float(wbce(jnp.zeros((1, 4, 4)), y)) == 0.0
    assert float(wbce(jnp.ones((1, 4, 4)), jnp.ones((1, 4, 4)))) == 0.0


def test_wbce_reduce_false_shape():
    p = jnp.full((3, 2, 5), 0.3)
    y = jnp.zeros((3, 2, 5))
    per_sample = wbce(p, y, reduce=False)
    assert per_sample.shape == (3,)
    assert np.allclose(float(jnp.mean(per_sample)), float(wbce(p, y)))


def test_wbce_from_logits_matches_probability_form():
    rng = np.random.default_rng(1)
    z = rng.normal(0, 4, size=(2, 8, 8)).astype(np.float32)
    y = (rng.uniform(0, 1, size=(2, 8, 8)) > 0.8).astype(np.float32)
    got = float(wbce_from_logits(jnp.asarray(z), jnp.asarray(y)))
    want = float(wbce(jax.nn.sigmoid(jnp.asarray(z)), jnp.asarray(y)))
    assert abs(got - want) < 1e-5


def test_wbce_from_logits_stable_at_extremes():
    z = jnp.array([[-50.0, 50.0, 0.0]])
    y = jnp.array([[1.0, 0.0, 1.0]])
    val = float(wbce_from_logits(z, y))
    assert np.isfinite(val)
    # Saturated-wrong predictions should cost about |log(eps)| each.
    assert val > 5.0


def test_masked_mse_semantics():
    pred = jnp.array([[[0.5, 0.5], [0.2, 0.2]]])
    tgt = jnp.array([[[0.0, 0.0], [0.2, 0.2]]])
    mask = jnp.array([[[1.0], [0.0]]])
    # Only first position counts, but denominator is the full size (N*L*2),
    # matching the reference's nn.MSELoss over masked tensors.
    want = (0.5**2 + 0.5**2) / 4.0
    assert abs(float(masked_mse(pred, tgt, mask)) - want) < 1e-7
