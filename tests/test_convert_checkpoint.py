"""Cross-framework parity: converted torch weights must reproduce torch math.

Builds a random reference-layout state_dict, converts it with
tools/convert_reference_checkpoint, and compares our model's forward
against an independent torch.functional computation of the documented
architecture (reference: model.py:44-129).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_reference_checkpoint import (  # noqa: E402
    _INPAINT_LAYERS,
    _TRACKNET_BLOCKS,
    convert_inpaintnet,
    convert_tracknet,
)


def _tracknet_state_dict(in_dim, out_dim, rng):
    chans = {
        "down_block_1": (in_dim, 64),
        "down_block_2": (64, 128),
        "down_block_3": (128, 256),
        "bottleneck": (256, 512),
        "up_block_1": (768, 256),
        "up_block_2": (384, 128),
        "up_block_3": (192, 64),
    }
    sd = {}
    for block, n in _TRACKNET_BLOCKS:
        cin, cout = chans[block]
        for i in range(1, n + 1):
            c_in = cin if i == 1 else cout
            pre = f"{block}.conv_{i}"
            sd[f"{pre}.conv.weight"] = torch.tensor(
                rng.normal(0, 0.1, (cout, c_in, 3, 3)).astype(np.float32)
            )
            sd[f"{pre}.bn.weight"] = torch.tensor(
                rng.uniform(0.5, 1.5, cout).astype(np.float32)
            )
            sd[f"{pre}.bn.bias"] = torch.tensor(
                rng.normal(0, 0.1, cout).astype(np.float32)
            )
            sd[f"{pre}.bn.running_mean"] = torch.tensor(
                rng.normal(0, 0.1, cout).astype(np.float32)
            )
            sd[f"{pre}.bn.running_var"] = torch.tensor(
                rng.uniform(0.5, 1.5, cout).astype(np.float32)
            )
    sd["predictor.weight"] = torch.tensor(
        rng.normal(0, 0.1, (out_dim, 64, 1, 1)).astype(np.float32)
    )
    sd["predictor.bias"] = torch.tensor(rng.normal(0, 0.1, out_dim).astype(np.float32))
    return sd


def _torch_tracknet_forward(sd, x_nchw):
    """Independent torch.functional statement of the TrackNet architecture."""
    import torch.nn.functional as F

    def block(x, name, n):
        for i in range(1, n + 1):
            pre = f"{name}.conv_{i}"
            x = F.conv2d(x, sd[f"{pre}.conv.weight"], padding="same")
            x = F.batch_norm(
                x,
                sd[f"{pre}.bn.running_mean"],
                sd[f"{pre}.bn.running_var"],
                sd[f"{pre}.bn.weight"],
                sd[f"{pre}.bn.bias"],
                training=False,
                eps=1e-5,
            )
            x = F.relu(x)
        return x

    x1 = block(x_nchw, "down_block_1", 2)
    x = F.max_pool2d(x1, 2)
    x2 = block(x, "down_block_2", 2)
    x = F.max_pool2d(x2, 2)
    x3 = block(x, "down_block_3", 3)
    x = F.max_pool2d(x3, 2)
    x = block(x, "bottleneck", 3)
    x = torch.cat([F.interpolate(x, scale_factor=2), x3], dim=1)
    x = block(x, "up_block_1", 3)
    x = torch.cat([F.interpolate(x, scale_factor=2), x2], dim=1)
    x = block(x, "up_block_2", 2)
    x = torch.cat([F.interpolate(x, scale_factor=2), x1], dim=1)
    x = block(x, "up_block_3", 2)
    x = F.conv2d(x, sd["predictor.weight"], sd["predictor.bias"])
    return torch.sigmoid(x)


def test_tracknet_conversion_matches_torch_forward():
    rng = np.random.default_rng(0)
    seq_len, in_dim = 3, 9  # bg_mode '' at seq_len 3
    sd = _tracknet_state_dict(in_dim, seq_len, rng)
    variables = convert_tracknet(sd)

    x = rng.uniform(0, 1, (2, 32, 64, in_dim)).astype(np.float32)
    want = (
        _torch_tracknet_forward(sd, torch.tensor(x.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )

    import jax.numpy as jnp

    from tracknetv3_tpu.models.fused_forward import (
        fold_batchnorm,
        tracknet_fused_forward,
    )

    got = np.asarray(
        tracknet_fused_forward(fold_batchnorm(variables), jnp.asarray(x), dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_inpaintnet_conversion_matches_torch_forward():
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
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
    for ref, _ in _INPAINT_LAYERS:
        cin, cout = chans[ref]
        key = f"{ref}.conv" if not ref.startswith("buttleneck") else ref
        sd[f"{key}.weight"] = torch.tensor(
            rng.normal(0, 0.2, (cout, cin, 3)).astype(np.float32)
        )
        sd[f"{key}.bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
    sd["predictor.weight"] = torch.tensor(
        rng.normal(0, 0.2, (2, 32, 3)).astype(np.float32)
    )
    sd["predictor.bias"] = torch.tensor(rng.normal(0, 0.1, 2).astype(np.float32))

    def tblock(x, ref):
        key = f"{ref}.conv" if not ref.startswith("buttleneck") else ref
        x = F.conv1d(x, sd[f"{key}.weight"], sd[f"{key}.bias"], padding="same")
        return F.leaky_relu(x, 0.01)

    coords = rng.uniform(0, 1, (2, 16, 2)).astype(np.float32)
    mask = (rng.uniform(0, 1, (2, 16, 1)) > 0.5).astype(np.float32)
    xt = torch.tensor(np.concatenate([coords, mask], -1).transpose(0, 2, 1))
    x1 = tblock(xt, "down_1")
    x2 = tblock(x1, "down_2")
    x3 = tblock(x2, "down_3")
    x = tblock(tblock(x3, "buttleneck.conv_1"), "buttleneck.conv_2")
    x = tblock(torch.cat([x, x3], 1), "up_1")
    x = tblock(torch.cat([x, x2], 1), "up_2")
    x = tblock(torch.cat([x, x1], 1), "up_3")
    x = F.conv1d(x, sd["predictor.weight"], sd["predictor.bias"], padding="same")
    want = torch.sigmoid(x).numpy().transpose(0, 2, 1)

    variables = convert_inpaintnet(sd)

    import jax.numpy as jnp

    from tracknetv3_tpu.models import get_model

    model, _ = get_model("InpaintNet", 16, init_params=False)
    got = np.asarray(model.apply(variables, jnp.asarray(coords), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-5)
