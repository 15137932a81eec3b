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


def test_checkpoint_is_pickle_free_npz(tmp_path):
    """Current-format checkpoints must be npz archives loadable with
    allow_pickle=False (VERDICT r1 item 9: de-pickle the format)."""
    import zipfile

    model, variables = get_model("InpaintNet", 16)
    path = str(tmp_path / "c.pt")
    save_checkpoint(
        path, epoch=1, max_val_acc=0.5, model=variables,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    assert zipfile.is_zipfile(path)
    with np.load(path, allow_pickle=False) as z:  # must not raise
        assert "__meta__" in z.files


def test_legacy_pickle_checkpoint_still_loads(tmp_path):
    import pickle

    model, variables = get_model("InpaintNet", 16)
    import jax

    legacy = dict(
        epoch=3, max_val_acc=0.7,
        model=jax.tree_util.tree_map(np.asarray, dict(variables)),
        optimizer=None, scheduler=None,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    path = str(tmp_path / "legacy.pt")
    with open(path, "wb") as f:
        pickle.dump(legacy, f)
    model2, vars2, pd = load_model_from_checkpoint(path)
    assert pd["seq_len"] == 16 and load_checkpoint(path)["epoch"] == 3


def test_optimizer_roundtrip_and_scheduler_record(tmp_path):
    """Optimizer leaves + explicit scheduler position survive the npz
    round trip and unflatten into a freshly-built state."""
    import jax

    from tracknetv3_tpu.training.checkpoint import unflatten_optimizer_state
    from tracknetv3_tpu.training.optim import build_optimizer
    from tracknetv3_tpu.training.steps import create_train_state

    model, variables = get_model("InpaintNet", 16)
    tx = build_optimizer("Adam", 1e-3, "StepLR", epochs=9, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    # advance the optax count so the schedule position is nontrivial
    import optax

    grads = jax.tree_util.tree_map(np.ones_like, state.params)
    opt_state = state.opt_state
    for _ in range(5):
        _, opt_state = tx.update(grads, opt_state, state.params)

    path = str(tmp_path / "o.pt")
    save_checkpoint(
        path, epoch=2, max_val_acc=0.1, model=variables, optimizer=opt_state,
        scheduler=dict(lr_scheduler="StepLR", opt_step=5),
        param_dict=dict(model_name="InpaintNet", seq_len=16),
    )
    ckpt = load_checkpoint(path)
    assert ckpt["scheduler"] == {"lr_scheduler": "StepLR", "opt_step": 5}
    fresh = create_train_state(variables, tx)
    restored = unflatten_optimizer_state(fresh.opt_state, ckpt["optimizer"])
    ref_leaves = jax.tree_util.tree_leaves(opt_state)
    got_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_async_write_roundtrip(tmp_path):
    """async_write defers zip+disk to a background thread; the host
    snapshot is taken synchronously so callers may mutate immediately."""
    from tracknetv3_tpu.training.checkpoint import flush_checkpoint_writes

    model, variables = get_model("InpaintNet", 16)
    path = str(tmp_path / "a.pt")
    snap = np.asarray(variables["params"]["down_1"]["conv"]["kernel"]).copy()
    save_checkpoint(
        path, epoch=4, max_val_acc=0.2, model=variables,
        param_dict=dict(model_name="InpaintNet", seq_len=16),
        async_write=True,
    )
    flush_checkpoint_writes()
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 4
    np.testing.assert_array_equal(
        ckpt["model"]["params"]["down_1"]["conv"]["kernel"], snap
    )
