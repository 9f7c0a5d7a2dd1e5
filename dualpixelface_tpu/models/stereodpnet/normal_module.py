"""ANM — Adaptive Normal Module (ref src/model/stereodpnet/normal_module.py:32-194).

From the aggregated cost volume and the regressed disparity:
  1. sample_with_sort: top-k disparity-plane slices nearest the predicted
     disparity (topk of 1/|costrange - disp|, indices sorted ascending)
  2. grid_maker_3d: normalized 3-D world-coordinate volume
     K^-1 [u,v,1] * disp2depth(disp_range) at quarter-scale intrinsics
  3. two deformable 3-D convs over the [cost | coords] volume (D3D module,
     use_deform) or a plain ConvBN3D pair (fallback, normal_module.py:52-56)
  4. a shared dilated 2-D conv stack applied per depth-slice, mean over
     slices, sigmoid + x4 bilinear upsample, mapped to [-1, 1]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.ops import geometry
from dualpixelface_tpu.ops.blocks import ConvBN3D, he_normal_out
from dualpixelface_tpu.ops.cost_volume import costrange as make_costrange
from dualpixelface_tpu.ops.deform_conv3d import DeformConvPack3D
from dualpixelface_tpu.ops.resize import downsample2d_nearest, upsample2d_bilinear


def sample_with_sort(cost: jnp.ndarray, disp: jnp.ndarray, costrange: np.ndarray, k: int):
    """Top-k disparity planes nearest `disp`, sorted (ref normal_module.py:120-138).

    TPU-native formulation: costrange is a UNIFORM grid, so the k nearest
    planes sorted ascending are always k CONSECUTIVE planes, with window
    start j = clip(floor(f) - ceil((k-1)/2) ..) for f = (disp-cr0)/step —
    verified exactly equivalent to topk(1/|diff|)+sort including ties (the
    tie at an exact plane hit resolves to the lower window, matching
    torch.topk's first-index preference). The select is then D-K+1 masked
    adds instead of a per-pixel XLA gather (15-20 ns/index; the gather was
    ~30 ms of the 768x576 forward).

    :param cost: [B, D, H, W, C]
    :param disp: [B, H, W] quarter-scale disparity
    :return: (cost [B, K, H, W, C], disp_range [B, K, H, W])
    """
    cr = np.asarray(costrange, np.float32)  # [D]
    d = cost.shape[1]
    assert d == len(cr)
    step = float(cr[1] - cr[0]) if d > 1 else 1.0
    if k % 2 != 0 or not np.allclose(np.diff(cr), step):
        # general path (odd k / non-uniform grid): the reference's own
        # topk(1/|costrange - disp|) + sort + gather formulation
        return _sample_topk_fallback(cost, disp, cr, k)

    f = (disp.astype(jnp.float32) - float(cr[0])) / step  # [B, H, W]
    j0 = jnp.floor(f)
    tie = (f == j0).astype(jnp.float32)
    j = jnp.clip(j0 - (k // 2 - 1) - tie, 0, d - k)  # [B, H, W] window start

    squeezed_cost = jnp.zeros(
        (cost.shape[0], k) + cost.shape[2:4] + cost.shape[4:], cost.dtype
    )
    squeezed_disp = jnp.zeros((cost.shape[0], k) + cost.shape[2:4], jnp.float32)
    for jj in range(d - k + 1):
        m = (j == jj).astype(cost.dtype)[:, None, :, :]
        squeezed_cost = squeezed_cost + m[..., None] * cost[:, jj : jj + k]
        squeezed_disp = squeezed_disp + m.astype(jnp.float32) * jnp.asarray(
            cr[jj : jj + k], jnp.float32
        )[None, :, None, None]
    return squeezed_cost, squeezed_disp


def _sample_topk_fallback(cost, disp, cr, k):
    """General sample_with_sort: topk of 1/|costrange - disp| over planes,
    indices sorted ascending, per-pixel gather (ref normal_module.py:120-138).
    Used when the fast consecutive-window rule doesn't apply (odd k or a
    non-uniform costrange); both shipped configs (k=4, uniform grid) take the
    masked-add fast path instead — this pays the per-pixel XLA gather cost.
    """
    diff = jnp.abs(
        jnp.asarray(cr, jnp.float32)[None, :, None, None]
        - disp[:, None].astype(jnp.float32)
    )  # [B, D, H, W]
    # same ordering as the reference's 1/diff score (inf on exact hits is
    # fine for top_k; lax.top_k shares torch.topk's first-index tie rule)
    score = 1.0 / jnp.maximum(diff, 1e-30)
    _, idx = jax.lax.top_k(jnp.moveaxis(score, 1, -1), k)  # [B, H, W, K]
    idx = jnp.sort(idx, axis=-1)
    cost_bhwdc = jnp.moveaxis(cost, 1, 3)  # [B, H, W, D, C]
    gathered = jnp.take_along_axis(cost_bhwdc, idx[..., None], axis=3)
    squeezed_cost = jnp.moveaxis(gathered, 3, 1)  # [B, K, H, W, C]
    disp_planes = jnp.asarray(cr, jnp.float32)[idx]  # [B, H, W, K]
    squeezed_disp = jnp.moveaxis(disp_planes, -1, 1)  # [B, K, H, W]
    return squeezed_cost, squeezed_disp


def grid_maker_3d(K: jnp.ndarray, disp_range: jnp.ndarray, ab_value: jnp.ndarray):
    """Normalized world-coordinate volume (ref normal_module.py:80-118).

    :param K: [B, 3, 3] full-res intrinsics
    :param disp_range: [B, D, H, W] quarter-scale disparities
    :param ab_value: [B, 2] ([b, a])
    :return: [B, D, H, W, 3]
    """
    b, d, h, w = disp_range.shape
    K = K.astype(jnp.float32)
    K_q = K.at[:, :2, :].set(K[:, :2, :] / 4.0)

    xg, yg = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    grid = jnp.stack([xg, yg, jnp.ones_like(xg)], 0).reshape(3, h * w)  # [3, HW]
    warp = jnp.einsum("bij,jn->bin", jnp.linalg.inv(K_q), grid).reshape(b, 3, h, w)

    depth = geometry.disp2depth(disp_range.astype(jnp.float32), ab_value)  # [B, D, H, W]
    vol = warp[:, :, None] * depth[:, None]  # [B, 3, D, H, W]

    vmin = jnp.min(vol.reshape(b, -1), -1).reshape(b, 1, 1, 1, 1)
    vmax = jnp.max(vol.reshape(b, -1), -1).reshape(b, 1, 1, 1, 1)
    vol = (vol - vmin) / (vmax - vmin + 1e-6)
    return jnp.moveaxis(vol, 1, -1)  # [B, D, H, W, 3]


class ANM(nn.Module):
    option: object
    mindisp: float
    maxdisp: float

    @nn.compact
    def __call__(self, costs, disp_maps, batch, train: bool = False):
        """costs: list of [B, D, H/4, W/4, C]; disp_maps: list of [B, H, W].
        Returns (normals [each B, H, W, 3], offset1s, offset2s)."""
        opt = self.option.model
        c = opt.inplanes
        cr = make_costrange(self.mindisp, self.maxdisp, opt.level)
        ab_value = batch.get("abvalue")

        # submodules created ONCE and shared across the costs loop, exactly as
        # the reference shares self.deform_conv*/n_convs (normal_module.py:44-66)
        if opt.use_deform:
            # deform_impl: 'pallas' (default) = windowed-aperture Mosaic
            # kernel (docs/PERFORMANCE.md); 'packed8' = unbounded XLA gather
            # matching the reference's sampling semantics exactly
            dimpl = opt.get("deform_impl", "pallas")
            # deform_offset_clamp: train-time straight-through clamp of the
            # predicted offsets to the windowed kernel's +-AP aperture
            # (ops/deform_conv3d.clamp_offsets_to_window). A checkpoint
            # trained with it evaluates IDENTICALLY under packed8 and the
            # serving Pallas kernel — the stereodpnet_plus serving contract.
            oclamp = bool(opt.get("deform_offset_clamp", False))
            gchunks = int(opt.get("deform_gather_chunks", 1))
            deform1 = DeformConvPack3D(2 * c, (3, 3, 3), 1, 1, maxsize=self.maxdisp * 2,
                                       impl=dimpl, offset_clamp=oclamp,
                                       gather_chunks=gchunks, name="deform_conv1")
            deform2 = DeformConvPack3D(2 * c, (3, 3, 3), 1, 1, maxsize=self.maxdisp * 2,
                                       impl=dimpl, offset_clamp=oclamp,
                                       gather_chunks=gchunks, name="deform_conv2")
            act1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="act1")
            act2 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="act2")
        else:
            orig0 = ConvBN3D(2 * c, 3, 1, 1, name="orig_conv0")
            orig1 = ConvBN3D(2 * c, 3, 1, 1, name="orig_conv1")
        plan = [(3 * c, 1), (3 * c, 2), (2 * c, 4), (2 * c, 8), (c, 1), (3, 1)]
        n_convs = [
            nn.Conv(
                ch, (3, 3), padding=[(dil, dil), (dil, dil)], kernel_dilation=(dil, dil),
                use_bias=False, kernel_init=he_normal_out, name=f"n_convs{li}",
            )
            for li, (ch, dil) in enumerate(plan)
        ]

        normals, offset1s, offset2s = [], [], []
        for idx, cost in enumerate(costs):
            b = cost.shape[0]
            # quarter-scale disparity (ref normal_module.py:156)
            disp = downsample2d_nearest(disp_maps[idx][..., None], 4)[..., 0] * 0.25

            if opt.use_sampling:
                cost_s, disp_range = sample_with_sort(cost, disp, cr, opt.dsample_num)
            else:
                cost_s = cost
                disp_range = jnp.broadcast_to(
                    jnp.asarray(cr, jnp.float32)[None, :, None, None],
                    (b, len(cr)) + cost.shape[2:4],
                )

            # cast the (f32, [0,1]-normalized) coordinate volume to the cost
            # dtype BEFORE the concat: an f32 leak here promotes the whole
            # feature volume, silently flipping the deform kernel onto its
            # 3x-slower high-precision fp32 path under the bf16 policy
            coordV = grid_maker_3d(batch["K"], disp_range, ab_value)
            feature_volume = jnp.concatenate(
                [cost_s, coordV.astype(cost_s.dtype)], axis=-1
            )  # [B,K,H,W,C+3]

            if opt.use_deform:
                fv1, offset1 = deform1(feature_volume)
                fv1 = nn.relu(act1(fv1))
                fv2, offset2 = deform2(fv1)
                fv2 = nn.relu(act2(fv2))
            else:
                fv2 = nn.relu(orig0(feature_volume, train))
                fv2 = nn.relu(orig1(fv2, train))
                offset1 = offset2 = None

            # shared 2-D dilated stack per depth slice (ref normal_module.py:58-66)
            bk, d_s, hh, ww, cc = fv2.shape
            feats = fv2.reshape(b * d_s, hh, ww, cc)
            for conv in n_convs:
                feats = nn.leaky_relu(conv(feats), 0.1)

            # final: x4 bilinear upsample then sigmoid (ref normal_module.py:69-72)
            feats = nn.sigmoid(upsample2d_bilinear(feats, 4))
            feats = feats.reshape(b, d_s, feats.shape[1], feats.shape[2], 3).mean(axis=1)
            normals.append(feats * 2.0 - 1.0)
            offset1s.append(offset1)
            offset2s.append(offset2)

        return normals, offset1s, offset2s
