"""Model shape/parameter-count tests against the reference architecture.

Golden values computed from the reference architecture definition
(reference: model.py:44-73, 100-129) - channel arithmetic per bg_mode from
reference utils/general.py:66-74.
"""

import jax
import jax.numpy as jnp
import pytest

from tracknetv3_tpu.config import HEIGHT, WIDTH, tracknet_in_channels
from tracknetv3_tpu.models import get_model
from tracknetv3_tpu.models.tracknet import param_count


@pytest.mark.parametrize(
    "bg_mode,expected_in",
    [("", 24), ("subtract", 8), ("subtract_concat", 32), ("concat", 27)],
)
def test_tracknet_channel_arithmetic(bg_mode, expected_in):
    assert tracknet_in_channels(8, bg_mode) == expected_in


def _conv_params(cin, cout, k=3, bias=False):
    return k * k * cin * cout + (cout if bias else 0)


def _bn_params(c):
    return 2 * c  # scale + bias (running stats are state, not params)


def _tracknet_expected_params(in_dim, out_dim):
    total = 0
    chans = [
        (in_dim, 64), (64, 64),                     # down_block_1
        (64, 128), (128, 128),                      # down_block_2
        (128, 256), (256, 256), (256, 256),         # down_block_3
        (256, 512), (512, 512), (512, 512),         # bottleneck
        (768, 256), (256, 256), (256, 256),         # up_block_1
        (384, 128), (128, 128),                     # up_block_2
        (192, 64), (64, 64),                        # up_block_3
    ]
    for cin, cout in chans:
        total += _conv_params(cin, cout) + _bn_params(cout)
    total += 1 * 1 * 64 * out_dim + out_dim  # predictor 1x1 conv (with bias)
    return total


def test_tracknet_forward_and_params():
    seq_len, bg_mode = 8, "concat"
    model, variables = get_model("TrackNet", seq_len, bg_mode)
    in_ch = tracknet_in_channels(seq_len, bg_mode)
    x = jnp.zeros((2, HEIGHT, WIDTH, in_ch), jnp.float32)
    y = model.apply(variables, x, train=False, apply_sigmoid=True)
    assert y.shape == (2, HEIGHT, WIDTH, seq_len)
    assert y.dtype == jnp.float32
    assert bool(jnp.all((y >= 0) & (y <= 1)))
    assert param_count(variables["params"]) == _tracknet_expected_params(in_ch, seq_len)


def test_tracknet_small_input_runs():
    # Tiny spatial shape for fast CI; H, W must be divisible by 8.
    model, variables = get_model("TrackNet", 3, "")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 9))
    logits = model.apply(variables, x, train=False)
    probs = model.apply(variables, x, train=False, apply_sigmoid=True)
    assert logits.shape == (1, 32, 64, 3)
    assert jnp.allclose(jax.nn.sigmoid(logits), probs)


def _inpaintnet_expected_params():
    total = 0
    chans = [(3, 32), (32, 64), (64, 128), (128, 256), (256, 256),
             (384, 128), (192, 64), (96, 32), (32, 2)]
    for cin, cout in chans:
        total += 3 * cin * cout + cout  # k=3 conv1d with bias
    return total


def test_inpaintnet_forward_and_params():
    model, variables = get_model("InpaintNet")
    coords = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 2))
    mask = jnp.zeros((4, 16, 1))
    out = model.apply(variables, coords, mask)
    assert out.shape == (4, 16, 2)
    assert bool(jnp.all((out >= 0) & (out <= 1)))
    assert param_count(variables["params"]) == _inpaintnet_expected_params()


def test_tracknet_batchnorm_state_updates():
    model, variables = get_model("TrackNet", 3, "")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32, 9))
    y, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not jnp.allclose(a, b) for a, b in zip(old, new))
