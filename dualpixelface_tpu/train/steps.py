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

from dualpixelface_tpu.ops.precision import cast_floating


def make_train_step(model, loss_bank, compute_dtype=jnp.float32):
    """compute_dtype=bfloat16 gives the TPU mixed-precision policy: fp32
    master params, bf16 conv/matmul compute, fp32 loss — gradients flow back
    to the fp32 masters through the cast edges (no loss scaling needed)."""
    bf16 = compute_dtype == jnp.bfloat16

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        def loss_fn(params):
            p = cast_floating(params, compute_dtype) if bf16 else params
            b = cast_floating(batch, compute_dtype) if bf16 else batch
            variables = {"params": p, "batch_stats": state.batch_stats}
            results, mutated = model.apply(
                variables, b, train=True, mutable=["batch_stats"]
            )
            if bf16:
                results = cast_floating(results, jnp.float32)
            losses = loss_bank(results, batch)
            return losses["final_loss"], (losses, mutated)

        grads, (losses, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        batch_stats = cast_floating(mutated["batch_stats"], jnp.float32) if bf16 else mutated["batch_stats"]
        state = state.apply_gradients(grads=cast_floating(grads, jnp.float32), batch_stats=batch_stats)
        return state, {k: v for k, v in losses.items() if k.endswith("loss")}

    return train_step


def make_eval_step(model, compute_dtype=jnp.float32):
    bf16 = compute_dtype == jnp.bfloat16

    @jax.jit
    def eval_step(state, batch):
        p = cast_floating(state.params, compute_dtype) if bf16 else state.params
        b = cast_floating(batch, compute_dtype) if bf16 else batch
        stats = cast_floating(state.batch_stats, compute_dtype) if bf16 else state.batch_stats
        variables = {"params": p, "batch_stats": stats}
        results = model.apply(variables, b, train=False)
        return cast_floating(results, jnp.float32) if bf16 else results

    return eval_step
