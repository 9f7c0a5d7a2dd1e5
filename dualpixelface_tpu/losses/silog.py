"""Scale-invariant log loss (ref src/loss/depth/silog.py:9-52, BTS-style)."""
from __future__ import annotations

import jax.numpy as jnp

from dualpixelface_tpu.losses import register_loss
from dualpixelface_tpu.losses.common import loss_weights, masked_mean, prepare_disparity_gt


@register_loss("silog")
class SilogLoss:
    def __init__(self, option):
        self.option = option
        self.variance_focus = option.model.variance_focus

    def __call__(self, results: dict, batch: dict, target_type: str = "disp") -> dict:
        assert target_type in ("disp", "depth", "idepth")
        pred_, gt, ab_value, mask = prepare_disparity_gt(self.option, results, batch, target_type)
        if target_type == "depth":  # BTS trains directly on depth (ref silog.py:39-41)
            pred_ = results["pred_depth"]
            gt = batch["depth"]

        num_pred = pred_.shape[1]
        weights = loss_weights(self.option, num_pred, pred_.dtype)

        loss = 0.0
        m = None if mask is None else mask.astype(pred_.dtype)
        # neutralize out-of-mask pixels BEFORE the log: the reference indexes
        # pred[mask]/gt[mask] so log never sees the zero-filled invalid region
        # (silog.py:44-46); with weighted means, log(0) * 0 would be NaN.
        gt_safe = gt if m is None else jnp.where(m > 0, gt, 1.0)
        for i in range(num_pred):
            p_safe = pred_[:, i] if m is None else jnp.where(m > 0, pred_[:, i], 1.0)
            d = weights[i] * (jnp.log(p_safe) - jnp.log(gt_safe))
            mean_d2 = masked_mean(d * d, m)
            mean_d = masked_mean(d, m)
            loss = loss + jnp.sqrt(mean_d2 - self.variance_focus * mean_d**2) * 10.0
        return {"loss": loss, "abvalue": ab_value}
