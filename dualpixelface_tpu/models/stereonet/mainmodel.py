"""StereoNet (ECCV'18 guided hierarchical refinement), DP-adapted.

Parity target: reference `src/model/stereonet/{mainmodel,modules}.py` — the
smallest model in the zoo: k stride-2 downsampling convs + 6 residual blocks,
a subtraction cost volume over 2^k disparity planes along the DP (H) axis,
four 3-D conv filters + soft-argmin, and one edge-aware refinement stage
guided by the full-resolution right image.

TPU-first notes: channels-last everywhere; the cost volume is one fused
stack of static row shifts (no zero-init scatter loop, ref
mainmodel.py:100-114); bilinear rescaling uses interpolation-matrix matmuls
with torch's align_corners=False convention (ref modules.py:81-86).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.base import select_ref_target
from dualpixelface_tpu.ops import cost_volume as cv
from dualpixelface_tpu.ops import resize
from dualpixelface_tpu.ops.blocks import ConvBN, ConvBN3D, he_normal_out


class ResidualBlock(nn.Module):
    """convbn + leaky-relu with identity skip (ref stereonet/modules.py:10-29;
    the reference's conv2 is dead code and is not replicated)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.features, 3, 1, dilation=self.dilation)(x, train)
        out = nn.leaky_relu(out, 0.2)
        return x + out


class FeatureExtraction(nn.Module):
    """k stride-2 5x5 convs to 1/2^k res + 6 residual blocks + plain conv
    (ref stereonet/modules.py:32-61)."""

    k: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.k):
            x = nn.Conv(32, (5, 5), strides=(2, 2), padding=[(2, 2), (2, 2)],
                        kernel_init=he_normal_out)(x)
        for _ in range(6):
            x = ResidualBlock(32)(x, train)
        return nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=he_normal_out)(x)


class EdgeAwareRefinement(nn.Module):
    """Dilated-residual refinement on the guidance image
    (ref stereonet/modules.py:64-95)."""

    @nn.compact
    def __call__(self, low_disparity, rgb, train: bool = False):
        # [B, h, w] -> [B, H, W, 1] bilinear (align_corners=False)
        b, h_low, w_low = low_disparity.shape
        H, W = rgb.shape[1], rgb.shape[2]
        twice = resize.resize_linear(
            low_disparity[..., None], (H, W), (1, 2), align_corners=False
        )
        if W / w_low >= 1.5:
            twice = twice * 8.0
        out = ConvBN(32, 3, 1)(jnp.concatenate([twice, rgb], -1), train)
        out = nn.leaky_relu(out, 0.2)
        for di in (1, 2, 4, 8, 1, 1):
            out = ResidualBlock(32, dilation=di)(out, train)
        out = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=he_normal_out)(out)
        return nn.relu((twice + out)[..., 0])


@register_model("stereonet")
class STEREONET(nn.Module):
    option: object

    def setup(self):
        opt = self.option.model
        self.mindisp = opt.mindisp
        self.maxdisp = opt.maxdisp
        self.level = int(math.pow(2, opt.k))
        self.costrange = cv.costrange(self.mindisp, self.maxdisp, self.level)
        self.disparities = cv.regression_disparities(self.mindisp, self.maxdisp, self.level, 1)

        self.feature_extraction = FeatureExtraction(opt.k)
        self.filters = [ConvBN3D(32, 3, 1, 1, name=f"filter{i}") for i in range(4)]
        self.conv3d_alone = nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, kernel_init=he_normal_out)
        self.refinement = EdgeAwareRefinement()

    def __call__(self, batch: dict, train: bool = False) -> dict:
        ref_img, tar_img = select_ref_target(batch, self.option)

        ref_fea = self.feature_extraction(ref_img, train)
        tar_fea = self.feature_extraction(tar_img, train)

        # subtraction cost volume [B, D, h, w, C] (ref mainmodel.py:100-114)
        costv = cv.subtraction_volume(ref_fea, tar_fea, self.costrange)

        for f in self.filters:
            costv = nn.leaky_relu(f(costv, train), 0.2)
        costv = self.conv3d_alone(costv)[..., 0]  # [B, D, h, w]

        disp_low, prob = cv.soft_argmin(costv, self.disparities)

        guidance = batch["right"]
        refined = self.refinement(disp_low, guidance, train)

        # coarse branch: x(W/w) then full-res bilinear (ref mainmodel.py:137-147)
        H, W = guidance.shape[1], guidance.shape[2]
        coarse = disp_low * (W / disp_low.shape[-1])
        coarse = resize.resize_linear(coarse[..., None], (H, W), (1, 2), align_corners=False)[..., 0]

        results = {
            "pred_depth": jnp.stack([coarse, refined], axis=1),  # [B, 2, H, W]
            "prob_depth": prob[:, None],  # [B, 1, D, h, w]
            "ref_feature": jnp.max(ref_fea, axis=-1),
        }
        return results
