"""Masked cosine-embedding loss for surface normals (ref src/loss/normal/cosine.py:10-55).

Predicted normals are [B, N, H, W, 3] (channels-last), gt [B, H, W, 3].
Both are L2-normalized (eps-clamped, fp16/bf16-safe as in the reference) and
the per-pixel 1 - cos similarity is mean-reduced over masked pixels with
static shapes (weighted mean == torch boolean-index mean).
"""
from __future__ import annotations

import jax.numpy as jnp

from dualpixelface_tpu.losses import register_loss
from dualpixelface_tpu.losses.common import loss_weights, masked_mean


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm


@register_loss("cosine")
class CosineLoss:
    def __init__(self, option):
        self.option = option

    def __call__(self, results: dict, batch: dict, target_type=None) -> dict:
        pred = results["pred_normal"]  # [B, N, H, W, 3]
        num_pred = pred.shape[1]
        weights = loss_weights(self.option, num_pred, pred.dtype)
        mask = (batch["mask"] > 0) if "mask" in batch else None

        gt = l2_normalize(batch["normal"])  # [B, H, W, 3]
        mask_c = (
            None
            if mask is None
            else jnp.broadcast_to(mask[..., None], gt.shape)
        )
        loss = 0.0
        for i in range(num_pred):
            p = l2_normalize(pred[:, i])
            # NOTE exact parity: the reference's cosine_embedding_loss
            # (cosine.py:15-29) takes the mean of the per-COMPONENT normalized
            # products, i.e. mean(1 - x_c*y_c/(|x||y|)) = 1 - cos/3, not
            # 1 - cos. We reproduce that reduction bit-for-bit.
            sim = jnp.clip(p * gt, -1.0, 1.0)  # [B, H, W, 3]
            loss = loss + weights[i] * masked_mean(1.0 - sim, mask_c)
        return {"loss": loss}
