"""Checkpoint save/load with the config-in-checkpoint contract.

Mirrors the reference checkpoint contract (reference: train.py:286-301):
a single file holding ``dict(epoch, max_val_acc, model, optimizer,
scheduler, param_dict)``, written as ``{model_name}_best.pt`` and
``{model_name}_cur.pt``. The ``param_dict`` round-trip is load-bearing:
inference CLIs reconstruct the architecture from it
(reference: predict.py:98-101, test.py:936-939).

Here ``model`` is the flax variables pytree ({'params', 'batch_stats'}),
``optimizer`` the optax state, all converted to numpy for serialization.
Like the reference's torch.save, the container is a pickle file - only
load checkpoints you trust.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    *,
    epoch: int,
    max_val_acc: float,
    model: Any,
    optimizer: Any = None,
    scheduler: Any = None,
    param_dict: Optional[Dict[str, Any]] = None,
):
    ckpt = dict(
        epoch=int(epoch),
        max_val_acc=float(max_val_acc),
        model=_to_numpy(model),
        optimizer=_to_numpy(optimizer) if optimizer is not None else None,
        scheduler=_to_numpy(scheduler) if scheduler is not None else None,
        param_dict=dict(param_dict or {}),
    )
    tmp = f"{path}.tmp{os.getpid()}"  # unique per process: concurrent
    with open(tmp, "wb") as f:  # writers must not race on the rename
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_model_from_checkpoint(path: str):
    """Rebuild (module, variables, param_dict) from a checkpoint file.

    The architecture is reconstructed from ``param_dict`` exactly like the
    reference inference CLIs do (reference: predict.py:98-101).
    """
    from ..models import get_model

    ckpt = load_checkpoint(path)
    pd = ckpt["param_dict"]
    name = pd.get("model_name", "TrackNet")
    if name == "TrackNet":
        model, init_vars = get_model(
            "TrackNet", pd["seq_len"], pd.get("bg_mode", ""), init_params=False
        )
    else:
        model, init_vars = get_model(
            "InpaintNet", pd.get("seq_len", 16), init_params=False
        )
    variables = dict(ckpt["model"])
    if not variables.get("batch_stats"):
        # Stat-less models (InpaintNet) may carry an empty batch_stats dict.
        variables.pop("batch_stats", None)
    # Sanity: tree structure must match a freshly-initialized model.
    ref_struct = jax.tree_util.tree_structure(init_vars)
    got_struct = jax.tree_util.tree_structure(variables)
    if ref_struct != got_struct:
        raise ValueError(
            f"Checkpoint variable tree does not match {name} architecture: "
            f"{got_struct} vs {ref_struct}"
        )
    return model, variables, pd
