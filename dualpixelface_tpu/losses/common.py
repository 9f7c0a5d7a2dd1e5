"""Shared loss helpers: static-shape masked reductions and gt preparation."""
from __future__ import annotations

import jax.numpy as jnp

from dualpixelface_tpu.ops import geometry


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, eps: float = 1e-8) -> jnp.ndarray:
    """Mean over masked elements without boolean indexing (shape-static).

    Equivalent to torch `x[mask].mean()` for a {0,1} mask.
    """
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 / Huber (torch F.smooth_l1_loss, beta=1)."""
    a = jnp.abs(diff)
    return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)


def loss_weights(option, num_pred: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-scale weights: [1.0] if a single prediction, else
    option.model.loss_weight (ref smoothL1.py:20-22)."""
    if num_pred == 1:
        return jnp.ones((1,), dtype)
    w = jnp.asarray(list(option.model.loss_weight), dtype)
    assert w.shape[0] == num_pred, f"loss_weight len {w.shape[0]} != num_pred {num_pred}"
    return w


def prepare_disparity_gt(option, results: dict, batch: dict, target_type: str):
    """Ground-truth disparity + abvalue per the reference's conversion logic
    (ref smoothL1.py:24-34): if dataset.dp_conversion == 'least_square' or no
    abvalue in the batch, regress the affine DP parameters from the first
    prediction scale against the inverse gt depth, else use the given values.

    Returns (pred_, gt, abvalue, mask) where pred_ [B,N,H,W], gt [B,H,W].
    """
    pred = results["pred_depth"]  # [B, N, H, W]
    mask = (batch["mask"] > 0) if "mask" in batch else None

    pred_ = pred if target_type in ("disp", "idepth") else geometry.inverse_depth(pred)
    conversion = option.dataset.dp_conversion
    if conversion == "least_square" or "abvalue" not in batch:
        ab_value = geometry.regress_affine(pred[:, 0:1], batch["idepth"][:, None])
        gt = geometry.depth2disp(batch["depth"][:, None], ab_value)[:, 0]
    else:
        ab_value = batch["abvalue"]
        gt = batch["disp"] if target_type == "disp" else batch["idepth"]

    if batch.get("conf") is not None:
        pred_ = pred_ * batch["conf"][:, None]
        gt = gt * batch["conf"]

    return pred_, gt, ab_value, mask
