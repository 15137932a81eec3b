"""Checkpoint save/load round-trip and param_dict architecture rebuild."""

import numpy as np
import pytest

from tracknetv3_tpu.models import get_model
from tracknetv3_tpu.training.checkpoint import (
    load_checkpoint,
    load_model_from_checkpoint,
    save_checkpoint,
)


def test_roundtrip_tracknet(tmp_path):
    model, variables = get_model("TrackNet", 3, "subtract")
    pd = dict(model_name="TrackNet", seq_len=3, bg_mode="subtract", epochs=5)
    path = str(tmp_path / "TrackNet_cur.pt")
    save_checkpoint(
        path, epoch=2, max_val_acc=0.9, model=variables, optimizer=None, param_dict=pd
    )
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 2 and ckpt["max_val_acc"] == 0.9
    assert ckpt["param_dict"]["bg_mode"] == "subtract"

    model2, vars2, pd2 = load_model_from_checkpoint(path)
    assert pd2["seq_len"] == 3
    a = np.asarray(variables["params"]["down_block_1"]["conv_1"]["conv"]["kernel"])
    b = np.asarray(vars2["params"]["down_block_1"]["conv_1"]["conv"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # Rebuilt model runs.
    import jax.numpy as jnp

    x = jnp.zeros((1, 16, 32, 3))
    out = model2.apply(vars2, x, train=False)
    assert out.shape == (1, 16, 32, 3)


def test_roundtrip_inpaintnet(tmp_path):
    model, variables = get_model("InpaintNet", 16)
    path = str(tmp_path / "InpaintNet_cur.pt")
    save_checkpoint(
        path,
        epoch=0,
        max_val_acc=0.0,
        model=variables,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    model2, vars2, pd = load_model_from_checkpoint(path)
    import jax.numpy as jnp

    out = model2.apply(vars2, jnp.zeros((2, 16, 2)), jnp.zeros((2, 16, 1)))
    assert out.shape == (2, 16, 2)


def test_structure_mismatch_rejected(tmp_path):
    _, tn_vars = get_model("TrackNet", 3, "")
    path = str(tmp_path / "bad.pt")
    save_checkpoint(
        path,
        epoch=0,
        max_val_acc=0.0,
        model=tn_vars,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    with pytest.raises(ValueError, match="does not match"):
        load_model_from_checkpoint(path)
