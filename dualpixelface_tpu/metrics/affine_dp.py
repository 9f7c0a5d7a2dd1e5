"""Affine-invariant dual-pixel metrics: WMAE, WRMSE, 1-Spearman.

Parity target: the Google dual_pixels metrics the reference runs through a
TensorFlow 2.3 detour (ref src/metric/affine_dp/metric.py:22-151,
logger.py:31-46). Re-implemented here in pure numpy — no TF dependency, no
framework boundary in the eval loop (SURVEY.md §7.2 step 7):

  * WMAE: 5 IRLS iterations; each solves a confidence-weighted 2-parameter
    least squares (pred -> depth affine fit) and reweights by 1/max(eps,|r|)
    (metric.py:22-44). The reference's tf.linalg.lstsq(fast=False) ignores
    its l2_regularizer, so a plain lstsq matches.
  * WRMSE: single weighted lstsq, residuals squared/clipped (metric.py:47-62).
  * Spearman: double-argsort ranks rescaled to [-1,1], weighted Pearson, max
    over sign, reported as 1-rho (metric.py:65-101,143).

Per-sample optional center-crop, averaged over the batch (metric.py:104-151).
"""
from __future__ import annotations

import numpy as np

from dualpixelface_tpu.metrics import register_metric
from dualpixelface_tpu.metrics.base import Benchmark
from dualpixelface_tpu.ops.geometry import inverse_depth
from dualpixelface_tpu.utils.file_manager import tensor2numpy


def _weighted_lstsq_affine(pred: np.ndarray, depth: np.ndarray, sqrt_w: np.ndarray):
    """Solve min || sqrt_w * (s*pred + t - depth) ||^2 for (s, t)."""
    lhs = sqrt_w[:, None] * np.stack([pred, np.ones_like(pred)], axis=1)
    rhs = sqrt_w * depth
    sol, *_ = np.linalg.lstsq(lhs, rhs[:, None], rcond=None)
    return sol[0, 0], sol[1, 0]


def affine_inv_wmae(prediction: np.ndarray, depth: np.ndarray, depth_conf: np.ndarray,
                    irls_iters: int = 5, epsilon: float = 1e-3) -> float:
    pred_vec = prediction.reshape(-1).astype(np.float64)
    depth_vec = depth.reshape(-1).astype(np.float64)
    conf_vec = depth_conf.reshape(-1).astype(np.float64)
    irls_weight = np.ones_like(conf_vec)
    resid = np.zeros_like(conf_vec)
    for _ in range(irls_iters):
        sqrt_weight = np.sqrt(conf_vec * irls_weight)
        s, t = _weighted_lstsq_affine(pred_vec, depth_vec, sqrt_weight)
        resid = np.abs(pred_vec * s + t - depth_vec)
        irls_weight = 1.0 / np.maximum(epsilon, resid)
    return float(np.sum(conf_vec * resid) / np.sum(conf_vec))


def affine_inv_wrmse(prediction: np.ndarray, depth: np.ndarray, depth_conf: np.ndarray) -> float:
    pred_vec = prediction.reshape(-1).astype(np.float64)
    depth_vec = depth.reshape(-1).astype(np.float64)
    conf_vec = depth_conf.reshape(-1).astype(np.float64)
    s, t = _weighted_lstsq_affine(pred_vec, depth_vec, np.sqrt(conf_vec))
    resid_sq = np.minimum((pred_vec * s + t - depth_vec) ** 2, np.finfo(np.float32).max)
    return float(np.sqrt(np.sum(conf_vec * resid_sq) / np.sum(conf_vec)))


def _pearson(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> float:
    w_sum = np.sum(w)
    e = lambda z: np.sum(w * z) / w_sum
    mu_x, mu_y = e(x), e(y)
    var_x = e(x**2) - mu_x**2
    var_y = e(y**2) - mu_y**2
    cov = e(x * y) - mu_x * mu_y
    return cov / np.sqrt(var_x * var_y)


def spearman_rank_correlation(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> float:
    x = x.reshape(-1)
    y = y.reshape(-1)
    w = w.reshape(-1).astype(np.float64)
    rank = lambda z: np.argsort(np.argsort(z))
    n = x.shape[0]

    def cast_and_rescale(r):
        return (r - n // 2).astype(np.float64) / float(n // 2)

    x_rank = cast_and_rescale(rank(x))
    x_rank_neg = cast_and_rescale(rank(-x))
    y_rank = cast_and_rescale(rank(y))
    return max(_pearson(x_rank, y_rank, w), _pearson(x_rank_neg, y_rank, w))


def metrics(prediction: np.ndarray, gt_depth: np.ndarray, gt_depth_conf: np.ndarray,
            crop_height: int | None = None, crop_width: int | None = None):
    """[B, H, W] arrays -> [wmae, wrmse, 1-spearman] (ref metric.py:104-151)."""

    def center_crop(image):
        if crop_height is not None and crop_width is not None:
            h, w = image.shape[:2]
            oy, ox = (h - crop_height) // 2, (w - crop_width) // 2
            image = image[oy : oy + crop_height, ox : ox + crop_width]
        return image.astype(np.float32)

    batch = prediction.shape[0]
    wmae, wrmse, spearman = [], [], []
    for i in range(batch):
        p = center_crop(prediction[i])
        d = center_crop(gt_depth[i])
        c = center_crop(gt_depth_conf[i])
        wmae.append(affine_inv_wmae(p, d, c))
        wrmse.append(affine_inv_wrmse(p, d, c))
        spearman.append(1.0 - spearman_rank_correlation(p, d, c))
    return [float(np.mean(wmae)), float(np.mean(wrmse)), float(np.mean(spearman))]


def metrics_jax(prediction, gt_depth, gt_depth_conf, irls_iters: int = 5, epsilon: float = 1e-3):
    """On-device (jit/vmap) twin of `metrics` — the pure-JAX affine_dp path
    SURVEY.md §7.2 step 7 calls for. Per-sample IRLS WMAE / WRMSE via the
    closed-form 2x2 weighted normal equations, Spearman via double argsort.
    Returns [wmae, wrmse, 1-spearman] averaged over the batch.
    """
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.ops.geometry import _wls_affine

    def one(pred, depth, conf):
        p = pred.reshape(-1).astype(jnp.float32)
        d = depth.reshape(-1).astype(jnp.float32)
        c = conf.reshape(-1).astype(jnp.float32)

        # WMAE: IRLS with soft reweighting 1/max(eps, |r|)
        def body(_, carry):
            w, _resid = carry
            s, t = _wls_affine(p, d, c * w)
            resid = jnp.abs(p * s + t - d)
            return 1.0 / jnp.maximum(epsilon, resid), resid

        w0 = jnp.ones_like(c)
        _, resid = jax.lax.fori_loop(0, irls_iters, body, (w0, jnp.zeros_like(c)))
        wmae = jnp.sum(c * resid) / jnp.sum(c)

        # WRMSE: single weighted fit
        s, t = _wls_affine(p, d, c)
        resid_sq = jnp.minimum((p * s + t - d) ** 2, jnp.finfo(jnp.float32).max)
        wrmse = jnp.sqrt(jnp.sum(c * resid_sq) / jnp.sum(c))

        # Spearman: double-argsort ranks rescaled to [-1, 1]
        n = p.shape[0]
        rank = lambda z: jnp.argsort(jnp.argsort(z))
        resc = lambda r: (r - n // 2).astype(jnp.float32) / float(n // 2)

        def pearson(x, y, w):
            ws = jnp.sum(w)
            e = lambda z: jnp.sum(w * z) / ws
            mx, my = e(x), e(y)
            cov = e(x * y) - mx * my
            return cov / jnp.sqrt((e(x * x) - mx**2) * (e(y * y) - my**2))

        xr, xrn, yr = resc(rank(p)), resc(rank(-p)), resc(rank(d))
        rho = jnp.maximum(pearson(xr, yr, c), pearson(xrn, yr, c))
        return jnp.stack([wmae, wrmse, 1.0 - rho])

    out = jax.vmap(one)(prediction, gt_depth, gt_depth_conf)  # [B, 3]
    return jnp.mean(out, axis=0)


@register_metric("affine_dp")
class AffineDPBenchmark(Benchmark):
    keys = ("wmae", "wrmse", "spearman")

    def measure(self, results: dict, batch: dict, log: bool = True, target_type: str = "disp"):
        assert target_type in ("disp", "depth", "idepth")
        pred = results["pred_depth"]
        if target_type not in ("disp", "idepth"):
            pred = inverse_depth(pred)
        target = batch[target_type] if target_type in ("disp", "idepth") else batch["idepth"]
        pred = tensor2numpy(pred[:, 0])
        target = tensor2numpy(target)
        mask = tensor2numpy(batch["mask"]) if "mask" in batch else np.ones_like(pred)
        conf = tensor2numpy(batch["conf"]) if batch.get("conf") is not None else mask
        data = metrics(pred, target, conf)
        if log:
            self.update(data)
        return data
