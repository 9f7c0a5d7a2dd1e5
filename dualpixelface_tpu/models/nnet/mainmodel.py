"""NNet — normal-assisted stereo (CVPR'20), DP-adapted.

Parity target: ref `src/model/nnet/{mainmodel,modules,normal_module_}.py` —
PSMNet-style SPP features, integer-shift concat volume, flat (non-hourglass)
3-D residual aggregation dres0-4, per-slice 2-D context refinement of the
classified cost (convs on [ref_fea | cost_slice]), soft-argmin over
[costs, costss], and a NormalModule that pools a world-coordinate volume down
the disparity axis and sums per-slice 2-D stacks into a normalized normal map.

TPU-first: the reference's python loop writing costss slice-by-slice
(mainmodel.py:140-146) becomes one batched 2-D conv call with D folded into
the batch axis; trilinear upsampling here uses align_corners=False — NNet
differs from StereoDPNet on this (mainmodel.py:148-152).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.base import select_ref_target
from dualpixelface_tpu.models.psmnet.mainmodel import SPPFeatureExtraction
from dualpixelface_tpu.models.stereodpnet.normal_module import grid_maker_3d
from dualpixelface_tpu.ops.blocks import ConvBN3D, he_normal_out
from dualpixelface_tpu.ops.cost_volume import (
    concat_volume_int,
    costrange,
    regression_disparities,
    soft_argmin,
)
from dualpixelface_tpu.ops.resize import resize_linear, upsample2d_bilinear


def convtext_stack(x, plan, name_prefix):
    """Shared conv+leaky(0.1) dilated 2-D stack (ref nnet/modules.py convtext)."""
    for li, (ch, dil) in enumerate(plan):
        x = nn.Conv(
            ch, (3, 3), padding=[(dil, dil), (dil, dil)], kernel_dilation=(dil, dil),
            use_bias=False, kernel_init=he_normal_out, name=f"{name_prefix}{li}",
        )(x)
        x = nn.leaky_relu(x, 0.1)
    return x


class NNetNormalModule(nn.Module):
    """(ref normal_module_.py:14-118)"""

    option: object
    mindisp: float
    maxdisp: float

    @nn.compact
    def __call__(self, cost_in, batch, train: bool = False):
        """cost_in: [B, D, h, w, 2C] -> normal map [B, H, W, 3]."""
        opt = self.option.model
        c = opt.inplanes
        b, d, h, w, _ = cost_in.shape
        cr = costrange(self.mindisp, self.maxdisp, opt.level)

        disp_range = jnp.broadcast_to(
            jnp.asarray(cr, jnp.float32)[None, :, None, None], (b, d, h, w)
        )
        wc = grid_maker_3d(batch["K"], disp_range, batch.get("abvalue"))  # [B,D,h,w,3]
        wc = jnp.concatenate([wc, cost_in], axis=-1)

        y = nn.relu(ConvBN3D(c, 3, 1, 1, name="wc0_0")(wc, train))
        y = nn.relu(ConvBN3D(c, 3, 1, 1, name="wc0_1")(y, train))
        # three stride-2 depth-axis pools: D 8 -> 4 -> 2 -> 1 (ref :31-36)
        for i in range(3):
            y = nn.relu(
                ConvBN3D(c, (2, 3, 3), (2, 1, 1), (0, 1, 1), name=f"pool{i + 1}")(y, train)
            )

        # per-slice 2-D stack, summed over remaining slices (ref :104-110)
        bd = y.shape[0] * y.shape[1]
        feats = y.reshape(bd, h, w, c)
        plan = [(3 * c, 1), (3 * c, 2), (3 * c, 4), (2 * c, 8), (2 * c, 16), (c, 1), (3, 1)]
        feats = convtext_stack(feats, plan, "n_convs")
        nmap = feats.reshape(b, -1, h, w, 3).sum(axis=1)

        nmap = upsample2d_bilinear(nmap, 4)  # align_corners=True (ref :112)
        norm = jnp.maximum(jnp.linalg.norm(nmap, axis=-1, keepdims=True), 1e-12)
        return nmap / norm


@register_model("nnet")
class NNET(nn.Module):
    option: object

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        opt = self.option.model
        c = opt.inplanes
        cr = costrange(opt.mindisp, opt.maxdisp, opt.level)
        disparities = regression_disparities(opt.mindisp, opt.maxdisp, opt.level, 4)

        feature_extraction = SPPFeatureExtraction(self.option, name="feature_extraction")
        ref_img, tar_img = select_ref_target(batch, self.option)
        ref_fea = feature_extraction(ref_img, train)  # [B, h, w, C]
        tar_fea = feature_extraction(tar_img, train)

        cost = concat_volume_int(ref_fea, tar_fea, cr)  # [B, D, h, w, 2C]

        def dres(x, name, relu_out=False):
            y = nn.relu(ConvBN3D(c, 3, 1, 1, name=f"{name}_0")(x, train))
            y = ConvBN3D(c, 3, 1, 1, name=f"{name}_1")(y, train)
            return y

        cost0 = nn.relu(ConvBN3D(c, 3, 1, 1, name="dres0_0")(cost, train))
        cost0 = nn.relu(ConvBN3D(c, 3, 1, 1, name="dres0_1")(cost0, train))
        cost_in0 = cost0
        for name in ("dres1", "dres2", "dres3", "dres4"):
            cost0 = dres(cost0, name) + cost0
        cost_in = jnp.concatenate([cost_in0, cost0], axis=-1)  # [B, D, h, w, 2C]

        y = nn.relu(ConvBN3D(c, 3, 1, 1, name="classify_0")(cost0, train))
        costs = nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                        kernel_init=he_normal_out, name="classify_1")(y)  # [B,D,h,w,1]

        # per-slice 2-D context refinement, batched over D (ref :140-146)
        b, d, h, w, _ = costs.shape
        ref_tiled = jnp.broadcast_to(ref_fea[:, None], (b, d, h, w, c))
        slices_in = jnp.concatenate([ref_tiled, costs], axis=-1).reshape(b * d, h, w, c + 1)
        plan = [(4 * c, 1), (4 * c, 2), (4 * c, 4), (3 * c, 8), (2 * c, 16), (c, 1), (1, 1)]
        refined = convtext_stack(slices_in, plan, "convs")
        costss = refined.reshape(b, d, h, w, 1) + costs

        # x4 trilinear, align_corners=FALSE (ref :148-152)
        up = lambda v: resize_linear(
            v[..., 0], (4 * d, 4 * h, 4 * w), (1, 2, 3), align_corners=False
        )
        costs_up = up(costs)
        costss_up = up(costss)

        disp_out, prob_out = [], []
        for logits in (costs_up, costss_up):
            dd, p = soft_argmin(logits, disparities)
            disp_out.append(dd)
            prob_out.append(p)

        normal = None
        if opt.predict_normal:
            nmap = NNetNormalModule(self.option, opt.mindisp, opt.maxdisp, name="normal_module")(
                cost_in, batch, train
            )
            normal = nmap[:, None]  # [B, 1, H, W, 3]

        return {
            "pred_depth": jnp.stack(disp_out, axis=1),
            "prob_depth": jnp.stack(prob_out, axis=1),
            "pred_normal": normal,
            "ref_feature": jnp.max(ref_fea, axis=-1),
        }
