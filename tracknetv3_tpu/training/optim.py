"""Optimizer construction (optax) with the reference's optimizer surface.

Reference choices (train.py:241-254): Adam / SGD(momentum=0.9) /
Adadelta, and an optional StepLR schedule (step_size = epochs/3,
gamma = 0.1) stepped per epoch. Gradient clipping by global norm 1.0 is
applied for InpaintNet (reference: train.py:165).
"""

from __future__ import annotations

from typing import Optional

import optax


def build_schedule(
    learning_rate: float,
    lr_scheduler: str,
    epochs: int,
    steps_per_epoch: int,
):
    if lr_scheduler == "StepLR":
        step_size = max(int(epochs / 3), 1) * steps_per_epoch
        return optax.piecewise_constant_schedule(
            init_value=learning_rate,
            boundaries_and_scales={
                step_size * k: 0.1 for k in range(1, epochs // max(int(epochs / 3), 1) + 1)
            },
        )
    if lr_scheduler == "":
        return learning_rate
    raise ValueError(f"Invalid lr_scheduler: {lr_scheduler!r}")


def build_optimizer(
    optim_name: str,
    learning_rate: float,
    lr_scheduler: str = "",
    epochs: int = 1,
    steps_per_epoch: int = 1,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    schedule = build_schedule(learning_rate, lr_scheduler, epochs, steps_per_epoch)
    if optim_name == "Adam":
        tx = optax.adam(schedule)  # b1=0.9, b2=0.999, eps=1e-8 (torch defaults)
    elif optim_name == "SGD":
        tx = optax.sgd(schedule, momentum=0.9)
    elif optim_name == "Adadelta":
        tx = optax.adadelta(schedule, rho=0.9, eps=1e-6)
    else:
        raise ValueError(f"Invalid optimizer: {optim_name!r}")
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
