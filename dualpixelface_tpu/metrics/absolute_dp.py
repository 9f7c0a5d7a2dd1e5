"""Absolute depth metrics at threshold 1.01 (ref src/metric/absolute_dp/).

abs_rel, abs_diff, sq_rel, rmse, rmse_log, a1/a2/a3 on masked pixels,
computed after disparity -> depth conversion with the batch abvalue
(ref absolute_dp/logger.py:40-47). Masked selection is done host-side with
numpy exactly like the reference (metric.py:5-31); the eval hot path (the
network forward) stays on-device.
"""
from __future__ import annotations

import numpy as np

from dualpixelface_tpu.metrics import register_metric
from dualpixelface_tpu.metrics.base import Benchmark
from dualpixelface_tpu.ops import geometry
from dualpixelface_tpu.utils.file_manager import tensor2numpy


def compute_errors_test_depth(gt: np.ndarray, pred: np.ndarray, mask: np.ndarray, threshold: float):
    """Ref absolute_dp/metric.py:5-31, verbatim math."""
    gt = gt[mask > 0]
    pred = pred[mask > 0]
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < threshold).mean()
    a2 = (thresh < threshold**2).mean()
    a3 = (thresh < threshold**3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_diff = np.mean(np.abs(gt - pred))
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)
    return [abs_rel, abs_diff, sq_rel, rmse, rmse_log, a1, a2, a3]


@register_metric("absolute_dp")
class AbsoluteDPBenchmark(Benchmark):
    keys = ("abs_rel", "abs_diff", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
    threshold = 1.01

    def measure(self, results: dict, batch: dict, log: bool = True, target_type: str = "disp"):
        assert target_type in ("disp", "depth", "idepth")
        pred = results["pred_depth"]  # [B, N, H, W] disparity
        abvalue = batch["abvalue"] if "abvalue" in batch else results["abvalue"]
        if target_type in ("disp", "idepth"):
            pred = geometry.disp2depth(pred, abvalue)
        pred = tensor2numpy(pred)
        target = tensor2numpy(batch["depth"])
        mask = tensor2numpy(batch["mask"]) if "mask" in batch else np.ones_like(pred[:, 0])
        data = compute_errors_test_depth(target, pred[:, 0], mask, self.threshold)
        if log:
            self.update(data)
        return data
