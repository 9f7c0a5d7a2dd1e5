"""Folded multi-view photometric loss (Google ICCV'19 "Learning Single Camera
Depth Estimation Using Dual-Pixels", reimplemented).

Parity target: ref `src/loss/depth/folded.py:18-372` — batch-wise crop
alignment via grid sampling, pixel2cam/cam2pixel warping of the target view
through the K,P of selected reference views, SSIM (3x3 valid avg-pool form)
blended with Barron's general robust (Charbonnier) loss by weight_ssim.

Two latent reference bugs are fixed here (SURVEY.md §2.5):
  * `refPs` was read before definition (folded.py:348) — the view count
    comes from batch['Ps'].
  * the return referenced an undefined `abvalue` (folded.py:370) — the
    regressed/given ab_value is returned.

Deviation: the reference shuffles reference views with host RNG at trace
time (folded.py:314-318), which is incompatible with a jitted step; we take
the first `num_neighbor_view` views deterministically.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.losses import register_loss
from dualpixelface_tpu.losses.common import prepare_disparity_gt
from dualpixelface_tpu.ops.resample import grid_sample


def avg_pool3_valid(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 VALID average pool, channels-last (torch AvgPool2d(3,1))."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="VALID")


def ssim(x: jnp.ndarray, y: jnp.ndarray, conf=None) -> jnp.ndarray:
    """(ref folded.py:39-70); x, y: [B, H, W, C]."""
    C1, C2 = 0.01**2, 0.03**2
    mu_x = avg_pool3_valid(x)
    mu_y = avg_pool3_valid(y)
    sigma_x = avg_pool3_valid(x * x) - mu_x**2
    sigma_y = avg_pool3_valid(y * y) - mu_y**2
    sigma_xy = avg_pool3_valid(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    out = jnp.clip((1 - num / den) / 2, 0.0, 1.0)
    if conf is not None:
        out = out * avg_pool3_valid(conf)
    return out


def general_robust_loss(x: jnp.ndarray, alpha: float, scale: float) -> jnp.ndarray:
    """Barron's general adaptive robust loss, exact form (ref folded.py:72-160).
    alpha/scale are static config floats, so the case split is trace-time."""
    ssx = (x / scale) ** 2
    if alpha == 2:
        return 0.5 * ssx
    if alpha == 0:
        return jnp.log1p(jnp.minimum(0.5 * ssx, 33e37))
    if np.isinf(alpha) and alpha < 0:
        return -jnp.expm1(-0.5 * ssx)
    if np.isinf(alpha) and alpha > 0:
        return jnp.expm1(jnp.minimum(0.5 * ssx, 87.5))
    eps = float(np.finfo(np.float32).eps)
    beta_safe = max(eps, abs(alpha - 2.0))
    alpha_safe = np.sign(alpha) * max(eps, abs(alpha)) if alpha != 0 else eps
    return (beta_safe / alpha_safe) * ((ssx / beta_safe + 1.0) ** (0.5 * alpha) - 1.0)


def make_grid(b: int, h: int, w: int) -> jnp.ndarray:
    """[B, 3, H, W] homogeneous pixel grid (ref folded.py:162-181)."""
    xg, yg = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    grid = jnp.stack([xg, yg, jnp.ones_like(xg)], 0)
    return jnp.broadcast_to(grid[None], (b, 3, h, w))


def batch_crop(feature: jnp.ndarray, ch: int, cw: int, coords: jnp.ndarray) -> jnp.ndarray:
    """Batch-wise crop via grid sampling at per-sample offsets
    (ref folded.py:183-206). feature [B, H, W, C], coords [B, 2] (x, y)."""
    b, h, w, c = feature.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :] + coords[:, 1:2]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + coords[:, 0:1]
    yv = jnp.broadcast_to(ys[:, :, None], (b, h, w))
    xv = jnp.broadcast_to(xs[:, None, :], (b, h, w))
    grid = jnp.stack([xv / (w - 1) * 2 - 1, yv / (h - 1) * 2 - 1], -1)
    return grid_sample(feature, grid, align_corners=False)[:, :ch, :cw]


def pixel2cam(grid: jnp.ndarray, K: jnp.ndarray, depth: jnp.ndarray, mask=None) -> jnp.ndarray:
    """(ref folded.py:208-228) -> [B, 3, H, W] camera-frame points."""
    b, h, w = depth.shape
    cam = jnp.einsum("bij,bjn->bin", jnp.linalg.inv(K), grid.reshape(b, 3, -1)).reshape(b, 3, h, w)
    if mask is not None:
        depth = depth * (mask > 0)
    return cam * depth[:, None]


def cam2pixel(tar3dpts, tarP, refP, refK, ref_h, ref_w) -> jnp.ndarray:
    """(ref folded.py:230-269) -> normalized ref-view coords [B, H, W, 2]."""
    b, _, h, w = tar3dpts.shape
    tar2ref = jnp.einsum("bij,bjk->bik", refP, jnp.linalg.inv(tarP))
    proj = jnp.einsum("bij,bjk->bik", refK, tar2ref[:, :3])
    rot, trans = proj[:, :, :3], proj[:, :, 3:]
    ref = jnp.einsum("bij,bjn->bin", rot, tar3dpts.reshape(b, 3, -1)) + trans
    X, Y = ref[:, 0], ref[:, 1]
    Z = jnp.maximum(ref[:, 2], 1e-3)
    Xn = 2 * (X / Z) / (ref_w - 1) - 1
    Yn = 2 * (Y / Z) / (ref_h - 1) - 1
    bad_x = (Xn > 1) | (Xn < -1) | ~jnp.isfinite(Xn)
    bad_y = (Yn > 1) | (Yn < -1) | ~jnp.isfinite(Yn)
    Xn = jnp.where(bad_x, 2.0, Xn)
    Yn = jnp.where(bad_y, 2.0, Yn)
    return jnp.stack([Xn, Yn], -1).reshape(b, h, w, 2)


@register_loss("folded")
class FoldedLoss:
    def __init__(self, option):
        self.option = option
        m = option.model
        self.num_neighbor_view = int(
            m.get("num_neighbor_view", m.get("select_view", 3))
        )
        self.weight_ssim = m.weight_ssim
        self.alpha = float(m.alpha)
        self.scale = float(m.scale)

    def __call__(self, results: dict, batch: dict, target_type: str = "disp") -> dict:
        assert target_type in ("disp", "depth", "idepth")
        pred = results["pred_depth"]
        _pred_, _gt, ab_value, mask = prepare_disparity_gt(
            self.option, results, batch, target_type
        )
        conf = batch.get("conf")

        coords = batch["coords"].astype(jnp.float32)
        tar_center = batch["raw_center"].astype(jnp.float32)  # [B, H, W, 3]
        ref_centers = batch["centers"].astype(jnp.float32)  # [B, N, H, W, 3]
        refKs, refPs = batch["Ks"], batch["Ps"]

        n_views = ref_centers.shape[1]
        selected = list(range(min(n_views, self.num_neighbor_view)))

        b, ch, cw = pred.shape[0], pred.shape[2], pred.shape[3]
        ref_h, ref_w = ref_centers.shape[2], ref_centers.shape[3]
        grid = make_grid(b, ch, cw)

        ctarimg = batch_crop(tar_center, ch, cw, coords)
        tar3dpts = pixel2cam(grid, batch["K"], pred[:, 0], mask)

        loss1, loss2 = [], []
        for i in selected:
            refcoord = cam2pixel(tar3dpts, batch["P"], refPs[:, i], refKs[:, i], ref_h, ref_w)
            warped = grid_sample(ref_centers[:, i], refcoord, align_corners=False)
            warped = warped[:, :ch, :cw]
            ct, cw_img = ctarimg, warped
            if mask is not None:
                roimask = (mask > 0).astype(ct.dtype)[..., None]
                ct = ct * roimask
                cw_img = cw_img * roimask
            conf_c = None if conf is None else conf[..., None]
            loss1.append(jnp.mean(ssim(ct, cw_img, conf_c)))
            resid = ct - cw_img
            rl = general_robust_loss(resid, self.alpha, self.scale)
            if conf_c is not None:
                rl = rl * conf_c
            loss2.append(jnp.mean(rl))

        l1 = sum(loss1) / len(loss1)
        l2 = sum(loss2) / len(loss2)
        loss = self.weight_ssim * l1 + (1 - self.weight_ssim) * l2
        return {"loss": loss, "abvalue": ab_value}
