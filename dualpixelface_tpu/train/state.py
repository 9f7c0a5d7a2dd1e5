"""Train state: params + BatchNorm statistics + optimizer state.

TPU-native replacement for the LightningModule's implicit state (ref
main.py:43-62): one pytree, replicated over the mesh, updated by a single
pjit'd step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, option, sample_batch: dict, steps_per_epoch: int, rng=None) -> TrainState:
    from dualpixelface_tpu.train.optim import optimizer_selector

    rng = rng if rng is not None else jax.random.PRNGKey(1)  # seed_everything(1) parity
    # jitted init: one compiled program instead of thousands of eager ops
    # (critical on remote/tunneled devices where per-op latency dominates)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rng, sample_batch)
    tx = optimizer_selector(option, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
