#!/usr/bin/env python
"""Convert a reference (PyTorch) TrackNetV3 checkpoint to this framework.

Reference checkpoints are ``torch.save`` dicts with ``model`` (a
state_dict), ``param_dict``, ``epoch``, ``max_val_acc`` (reference:
train.py:286-301). This tool maps the tensors into the flax variable tree
used here so users of the reference can bring their trained weights:

    python tools/convert_reference_checkpoint.py \
        --in TrackNet_best.pt --out exp/TrackNet_best.pt

Layout mapping (standard torch<->flax conventions):
  Conv2d weight (Cout, Cin, kh, kw) -> kernel (kh, kw, Cin, Cout)
  Conv1d weight (Cout, Cin, k)      -> kernel (k, Cin, Cout)
  BatchNorm weight/bias             -> bn scale/bias (params)
  BatchNorm running_mean/var        -> batch_stats mean/var

The channel order of stacked frames is identical in both frameworks
(frame-major, color-minor), so converted weights consume our NHWC inputs
directly.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TRACKNET_BLOCKS = [
    ("down_block_1", 2),
    ("down_block_2", 2),
    ("down_block_3", 3),
    ("bottleneck", 3),
    ("up_block_1", 3),
    ("up_block_2", 2),
    ("up_block_3", 2),
]

_INPAINT_LAYERS = [
    # (reference prefix, our name)
    ("down_1", "down_1"),
    ("down_2", "down_2"),
    ("down_3", "down_3"),
    ("buttleneck.conv_1", "bottleneck_1"),  # sic - reference typo
    ("buttleneck.conv_2", "bottleneck_2"),
    ("up_1", "up_1"),
    ("up_2", "up_2"),
    ("up_3", "up_3"),
]


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_tracknet(state_dict):
    params, stats = {}, {}
    for block, n in _TRACKNET_BLOCKS:
        params[block], stats[block] = {}, {}
        for i in range(1, n + 1):
            pre = f"{block}.conv_{i}"
            w = _np(state_dict[f"{pre}.conv.weight"])  # (Cout, Cin, kh, kw)
            params[block][f"conv_{i}"] = {
                "conv": {"kernel": w.transpose(2, 3, 1, 0)},
                "bn": {
                    "scale": _np(state_dict[f"{pre}.bn.weight"]),
                    "bias": _np(state_dict[f"{pre}.bn.bias"]),
                },
            }
            stats[block][f"conv_{i}"] = {
                "bn": {
                    "mean": _np(state_dict[f"{pre}.bn.running_mean"]),
                    "var": _np(state_dict[f"{pre}.bn.running_var"]),
                }
            }
    pw = _np(state_dict["predictor.weight"])  # (Cout, Cin, 1, 1)
    params["predictor"] = {
        "kernel": pw.transpose(2, 3, 1, 0),
        "bias": _np(state_dict["predictor.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def convert_inpaintnet(state_dict):
    params = {}
    for ref, ours in _INPAINT_LAYERS:
        key = f"{ref}.conv" if not ref.startswith("buttleneck") else ref
        w = _np(state_dict[f"{key}.weight"])  # (Cout, Cin, k)
        params[ours] = {
            "conv": {
                "kernel": w.transpose(2, 1, 0),
                "bias": _np(state_dict[f"{key}.bias"]),
            }
        }
    pw = _np(state_dict["predictor.weight"])
    params["predictor"] = {
        "kernel": pw.transpose(2, 1, 0),
        "bias": _np(state_dict["predictor.bias"]),
    }
    return {"params": params}


def convert_checkpoint(in_path: str, out_path: str):
    import torch

    ckpt = torch.load(in_path, map_location="cpu", weights_only=False)
    pd = dict(ckpt.get("param_dict", {}))
    model_name = pd.get("model_name") or (
        "TrackNet" if any("down_block" in k for k in ckpt["model"]) else "InpaintNet"
    )
    pd.setdefault("model_name", model_name)
    if model_name == "TrackNet":
        variables = convert_tracknet(ckpt["model"])
    else:
        variables = convert_inpaintnet(ckpt["model"])

    from tracknetv3_tpu.training.checkpoint import save_checkpoint

    save_checkpoint(
        out_path,
        epoch=int(ckpt.get("epoch", 0)),
        max_val_acc=float(ckpt.get("max_val_acc", 0.0)),
        model=variables,
        param_dict=pd,
    )
    print(f"Converted {model_name} checkpoint -> {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True, help="reference .pt file")
    ap.add_argument("--out", dest="out_path", required=True, help="output checkpoint")
    args = ap.parse_args()
    convert_checkpoint(args.in_path, args.out_path)


if __name__ == "__main__":
    main()
