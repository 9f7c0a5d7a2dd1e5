"""PSMNet (CVPR'18) baseline stereo, DP-adapted, + GwcNet correlation volume.

Parity target: ref `src/model/psmnet/{mainmodel,modules}.py` — SPP feature
extractor (ResNet-style layers to 1/4 res + 4 average-pool branches fused by
bilinear upsample), integer-shift concat volume or group-wise correlation
volume (cost_volume config 'psmnet' | 'gwcnet'), the shared 3-hourglass
aggregation, soft-argmin over 4*level bins.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.base import select_ref_target
from dualpixelface_tpu.ops.aggregation import PSMNetHGAggregation
from dualpixelface_tpu.ops.blocks import ConvBN, he_normal_out
from dualpixelface_tpu.ops.cost_volume import (
    concat_volume_int,
    costrange,
    gwc_volume,
    regression_disparities,
    soft_argmin,
)
from dualpixelface_tpu.ops.resize import resize_linear


class BasicBlock(nn.Module):
    """ResNet basic block, optional strided 1x1 downsample skip
    (ref psmnet/modules.py:14-34)."""

    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(ConvBN(self.features, 3, self.strides, dilation=self.dilation)(x, train))
        out = ConvBN(self.features, 3, 1, dilation=self.dilation)(out, train)
        if self.downsample:
            x = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, kernel_init=he_normal_out)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return out + x


class SPPFeatureExtraction(nn.Module):
    """(ref psmnet/modules.py:63-170) -> [B, H/4, W/4, C]"""

    option: object

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.option.model.inplanes

        y = nn.relu(ConvBN(c, 3, 2, 1, 1)(x, train))
        y = nn.relu(ConvBN(c, 3, 1, 1, 1)(y, train))
        y = nn.relu(ConvBN(c, 3, 1, 1, 1)(y, train))

        def layer(y, planes, blocks, stride, dilation, first_down):
            y = BasicBlock(planes, stride, dilation, downsample=first_down)(y, train)
            for _ in range(1, blocks):
                y = BasicBlock(planes, 1, dilation)(y, train)
            return y

        y = layer(y, c, 3, 1, 1, False)  # layer1
        output_raw = layer(y, 2 * c, c // 2, 2, 1, True)  # layer2: C/2 blocks @ 1/4
        y = layer(output_raw, 4 * c, 3, 1, 1, True)  # layer3
        output_skip = layer(y, 4 * c, 3, 1, 2, False)  # layer4 (dilated)

        h, w = output_skip.shape[1], output_skip.shape[2]
        # the reference derives SPP pool sizes from the channel count
        # (modules.py:89-103): kernels 2C, C, C/2, C/4
        branches = []
        for pool in (2 * c, c, c // 2, c // 4):
            br = nn.avg_pool(output_skip, (pool, pool), strides=(pool, pool))
            br = nn.relu(ConvBN(c, 1, 1, 0, 1)(br, train))
            br = resize_linear(br, (h, w), (1, 2), align_corners=True)
            branches.append(br)

        feat = jnp.concatenate([output_raw, output_skip] + branches[::-1], axis=-1)
        feat = nn.relu(ConvBN(4 * c, 3, 1, 1, 1)(feat, train))
        return nn.Conv(c, (1, 1), use_bias=False, kernel_init=he_normal_out)(feat)


@register_model("psmnet")
class PSMNET(nn.Module):
    option: object

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        opt = self.option.model
        cr = costrange(opt.mindisp, opt.maxdisp, opt.level)
        disparities = regression_disparities(opt.mindisp, opt.maxdisp, opt.level, 4)

        feature_extraction = SPPFeatureExtraction(self.option, name="feature_extraction")
        ref_img, tar_img = select_ref_target(batch, self.option)
        ref_fea = feature_extraction(ref_img, train)
        tar_fea = feature_extraction(tar_img, train)

        if opt.cost_volume == "psmnet":
            cost = concat_volume_int(ref_fea, tar_fea, cr)
        elif opt.cost_volume == "gwcnet":
            cost = jnp.concatenate(
                [
                    concat_volume_int(ref_fea, tar_fea, cr),
                    gwc_volume(ref_fea, tar_fea, cr, opt.group_num),
                ],
                axis=-1,
            )
        else:
            raise NotImplementedError(f"cost volume style {opt.cost_volume!r}")

        # resident D-packed aggregation (exact reparametrization; falls back
        # per-shape when D doesn't support the pack factor — ops/aggregation)
        cost_logits, _feats = PSMNetHGAggregation(
            opt.inplanes,
            dpack_mode=str(opt.get("agg_dpack", "full")),
            name="aggregation",
        )(cost, train)

        disp_out, prob_out = [], []
        for logits in cost_logits:
            d, p = soft_argmin(logits, disparities)
            disp_out.append(d)
            prob_out.append(p)

        return {
            "pred_depth": jnp.stack(disp_out, axis=1),
            "prob_depth": jnp.stack(prob_out, axis=1),
            "ref_feature": jnp.max(ref_fea, axis=-1),
        }
