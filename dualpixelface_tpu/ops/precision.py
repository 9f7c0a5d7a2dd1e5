"""Mixed-precision policy (TPU-native bf16).

The reference uses NVIDIA-apex AMP 'O2' (ref main.py:53,56); on TPU the
equivalent is a bf16 compute policy with fp32 master params and no loss
scaling (bf16 shares fp32's exponent range — SURVEY.md §2.9).

Implemented as a cast-at-the-boundary policy: float32 leaves of params and
batch are cast to bfloat16 inside the jitted step, so every conv/matmul runs
on the MXU in bf16 while optimizer state and master params stay fp32.
Outputs are cast back to fp32 for losses/metrics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_policy(option) -> jnp.dtype:
    p = str(option.get("precision", 32)) if hasattr(option, "get") else str(option)
    return jnp.bfloat16 if p in ("bf16", "bfloat16", "16") else jnp.float32


def cast_floating(tree, dtype):
    """Cast float32/float64 leaves to `dtype`; leave ints/bools untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
