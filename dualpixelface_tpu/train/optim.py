"""Optimizer & LR-schedule selectors.

Parity target: reference `src/model/model_selector.py:31-58` —
  adam(betas 0.9/0.999, eps 1e-5) | sgd(momentum 0.9, weight_decay 2e-4) |
  rmsprop, and steplr(35, 0.5) | explr(0.5) | cosanneal(T_max 500, eta 1e-6) |
  none, all stepping per EPOCH (PyTorch-Lightning default). Expressed as
  optax transforms with a per-step schedule derived from steps_per_epoch.
"""
from __future__ import annotations

import math

import optax


def scheduler_selector(option, steps_per_epoch: int):
    """Returns an optax schedule fn step -> lr (epoch-granular like the ref)."""
    init_lr = option.init_lr
    name = getattr(option, "scheduler", "none")

    def epoch_of(step):
        return step // max(steps_per_epoch, 1)

    if name == "steplr":
        return lambda step: init_lr * (0.5 ** (epoch_of(step) // 35))
    if name == "explr":
        return lambda step: init_lr * (0.5 ** epoch_of(step))
    if name == "cosanneal":
        t_max, eta_min = 500, 1e-6
        return lambda step: eta_min + (init_lr - eta_min) * 0.5 * (
            1 + math.cos(math.pi * (epoch_of(step) / t_max))
        )
    if name in ("none", None):
        return lambda step: init_lr
    raise NotImplementedError(f"scheduler {name!r}")


def optimizer_selector(option, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = scheduler_selector(option, steps_per_epoch)
    name = option.optim
    if name == "adam":
        return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-5)
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(2e-4),
            optax.sgd(schedule, momentum=0.9),
        )
    if name == "rmsprop":
        return optax.rmsprop(schedule)
    raise NotImplementedError(f"optimizer {name!r}")
