"""Parity: hand-scheduled forwards vs the flax module definition."""

import jax
import jax.numpy as jnp
import numpy as np

from tracknetv3_tpu.models import get_model
from tracknetv3_tpu.models.fused_forward import (
    fold_batchnorm,
    tracknet_fused_forward,
    tracknet_train_forward,
)


def _setup(seq_len=3, bg_mode=""):
    model, variables = get_model("TrackNet", seq_len, bg_mode)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, seq_len * 3))
    return model, variables, x


def test_fused_inference_matches_flax_eval():
    model, variables, x = _setup()
    ref = model.apply(variables, x, train=False, apply_sigmoid=True)
    got = tracknet_fused_forward(fold_batchnorm(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)


def test_train_forward_eval_mode_matches_flax():
    model, variables, x = _setup()
    ref = model.apply(variables, x, train=False)
    got, stats = tracknet_train_forward(
        variables["params"], variables["batch_stats"], x, train=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    # eval mode must not touch the stats
    assert stats is variables["batch_stats"]


def test_train_forward_train_mode_matches_flax():
    model, variables, x = _setup()
    ref, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    got, new_stats = tracknet_train_forward(
        variables["params"], variables["batch_stats"], x, train=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    # running-stat updates must match flax's momentum semantics
    ref_stats = mutated["batch_stats"]
    for block in ("down_block_1", "bottleneck", "up_block_3"):
        for sub in ("conv_1", "conv_2"):
            np.testing.assert_allclose(
                np.asarray(new_stats[block][sub]["bn"]["mean"]),
                np.asarray(ref_stats[block][sub]["bn"]["mean"]),
                atol=1e-3,
                err_msg=f"{block}/{sub} mean",
            )
            np.testing.assert_allclose(
                np.asarray(new_stats[block][sub]["bn"]["var"]),
                np.asarray(ref_stats[block][sub]["bn"]["var"]),
                atol=1e-3,
                err_msg=f"{block}/{sub} var",
            )


def test_train_forward_is_differentiable():
    model, variables, x = _setup()

    def loss(params):
        logits, _ = tracknet_train_forward(
            params, variables["batch_stats"], x, train=True
        )
        return jnp.mean(jnp.square(logits))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_subpixel_up_conv_matches_naive():
    """The subpixel-decomposed up blocks must equal the upsample+concat
    form (same math, 2.25x fewer MACs on the upsampled half)."""
    model, variables, x = _setup(seq_len=3, bg_mode="")
    folded = fold_batchnorm(variables)
    ref = tracknet_fused_forward(folded, x, subpixel=False, dtype=jnp.float32)
    got = tracknet_fused_forward(folded, x, subpixel=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # and in the production bf16 path
    ref16 = tracknet_fused_forward(folded, x, subpixel=False)
    got16 = tracknet_fused_forward(folded, x, subpixel=True)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref16), atol=5e-3)
