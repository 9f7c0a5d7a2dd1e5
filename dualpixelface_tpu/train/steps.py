"""pjit'd train / eval steps.

ONE global-view jitted program per step (SURVEY.md §2.9): the batch arrives
sharded over the mesh's `data` axis, parameters replicated; XLA inserts the
gradient all-reduce over ICI and BatchNorm statistics are global-batch by
construction. Donation recycles the state buffers every step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_train_step(model, loss_bank):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            results, mutated = model.apply(
                variables, batch, train=True, mutable=["batch_stats"]
            )
            losses = loss_bank(results, batch)
            return losses["final_loss"], (losses, mutated)

        grads, (losses, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
        return state, {k: v for k, v in losses.items() if k.endswith("loss")}

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, batch, train=False)

    return eval_step
