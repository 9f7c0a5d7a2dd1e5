"""BTS — monocular depth with local planar guidance (DP center image only).

Parity target: ref `src/model/bts/{mainmodel,modules}.py` — backbone encoder
skips + BTS decoder: nearest-upsample ELU upconvs, dilated ASPP chain
(3/6/12/18/24), `reduction_1x1` plane-parameter heads (theta/phi/dist ->
plane equation), `local_planar_guidance` at x8/x4/x2, sigmoid depth scaled to
[min_depth, max_depth]. Trains with silog on target_type='depth'
(ref mainmodel.py:52-54). pred_depth is the final depth only [B, 1, H, W].

BatchNorm layers use the BTS momentum 0.01 / eps 1.1e-5 settings
(ref modules.py:32-41).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.bts.encoder import ResNetEncoder
from dualpixelface_tpu.ops.resize import downsample2d_nearest, upsample2d_nearest

xavier = nn.initializers.xavier_uniform()


def bts_bn(train: bool, name: str):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1.1e-5, name=name
    )


class Upconv(nn.Module):
    """nearest x2 + 3x3 conv + ELU (ref modules.py:54-67)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = upsample2d_nearest(x, 2)
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=xavier)(x)
        return nn.elu(x)


class AtrousConv(nn.Module):
    """(optional BN) -> ReLU -> 1x1 conv(2C) -> BN -> ReLU -> dilated 3x3
    (ref modules.py:26-51)."""

    features: int
    dilation: int
    apply_bn_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.apply_bn_first:
            x = bts_bn(train, "first_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features * 2, (1, 1), use_bias=False, kernel_init=xavier)(x)
        x = bts_bn(train, "mid_bn")(x)
        x = nn.relu(x)
        d = self.dilation
        return nn.Conv(self.features, (3, 3), padding=[(d, d), (d, d)],
                       kernel_dilation=(d, d), use_bias=False, kernel_init=xavier)(x)


class Reduction1x1(nn.Module):
    """Cascade of 1x1+ELU reductions to plane params (theta, phi, dist) or a
    final sigmoid depth (ref modules.py:70-112)."""

    num_out_filters: int
    max_depth: float
    is_final: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.num_out_filters
        while nf >= 4:
            if nf < 8:
                if self.is_final:
                    x = nn.Conv(1, (1, 1), use_bias=False, kernel_init=xavier)(x)
                    return nn.sigmoid(x)
                x = nn.Conv(3, (1, 1), use_bias=False, kernel_init=xavier)(x)
                break
            x = nn.elu(nn.Conv(nf, (1, 1), use_bias=False, kernel_init=xavier)(x))
            nf = nf // 2

        theta = nn.sigmoid(x[..., 0]) * math.pi / 3
        phi = nn.sigmoid(x[..., 1]) * math.pi * 2
        dist = nn.sigmoid(x[..., 2]) * self.max_depth
        n1 = jnp.sin(theta) * jnp.cos(phi)
        n2 = jnp.sin(theta) * jnp.sin(phi)
        n3 = jnp.cos(theta)
        return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq: jnp.ndarray, upratio: int) -> jnp.ndarray:
    """Plane-equation upsampling (ref modules.py:115-138).
    plane_eq [B, h, w, 4] -> depth [B, h*r, w*r]."""
    r = upratio
    pe = jnp.repeat(jnp.repeat(plane_eq, r, axis=1), r, axis=2)
    n1, n2, n3, n4 = pe[..., 0], pe[..., 1], pe[..., 2], pe[..., 3]
    h, w = plane_eq.shape[1], plane_eq.shape[2]
    u = jnp.tile(jnp.arange(r, dtype=jnp.float32), w)  # along width
    u = (u - (r - 1) * 0.5) / r
    v = jnp.tile(jnp.arange(r, dtype=jnp.float32), h)  # along height
    v = (v - (r - 1) * 0.5) / r
    return n4 / (n1 * u[None, None, :] + n2 * v[None, :, None] + n3)


class BTSDecoder(nn.Module):
    """(ref modules.py:141-265)"""

    option: object
    num_features: int = 512

    @nn.compact
    def __call__(self, features, train: bool = False):
        opt = self.option.model
        min_depth, max_depth = opt.min_depth, opt.max_depth
        nf = self.num_features

        skip0, skip1, skip2, skip3 = features[1], features[2], features[3], features[4]
        dense = nn.relu(features[5])

        up5 = bts_bn(train, "bn5")(Upconv(nf, name="upconv5")(dense))  # H/16
        iconv5 = nn.elu(nn.Conv(nf, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=xavier, name="conv5")(jnp.concatenate([up5, skip3], -1)))

        up4 = bts_bn(train, "bn4")(Upconv(nf // 2, name="upconv4")(iconv5))  # H/8
        concat4 = jnp.concatenate([up4, skip2], -1)
        iconv4 = nn.elu(nn.Conv(nf // 2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=xavier, name="conv4")(concat4))
        iconv4 = bts_bn(train, "bn4_2")(iconv4)

        d3 = AtrousConv(nf // 4, 3, apply_bn_first=False, name="daspp_3")(iconv4, train)
        c42 = jnp.concatenate([concat4, d3], -1)
        d6 = AtrousConv(nf // 4, 6, name="daspp_6")(c42, train)
        c43 = jnp.concatenate([c42, d6], -1)
        d12 = AtrousConv(nf // 4, 12, name="daspp_12")(c43, train)
        c44 = jnp.concatenate([c43, d12], -1)
        d18 = AtrousConv(nf // 4, 18, name="daspp_18")(c44, train)
        c45 = jnp.concatenate([c44, d18], -1)
        d24 = AtrousConv(nf // 4, 24, name="daspp_24")(c45, train)
        daspp = jnp.concatenate([iconv4, d3, d6, d12, d18, d24], -1)
        daspp_feat = nn.elu(nn.Conv(nf // 4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                    kernel_init=xavier, name="daspp_conv")(daspp))

        def plane_head(feat, out_filters, upratio, name):
            pe = Reduction1x1(out_filters, max_depth, name=name)(feat)
            normal = pe[..., :3]
            normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
            pe = jnp.concatenate([normal, pe[..., 3:]], -1)
            depth = local_planar_guidance(pe, upratio)
            return depth[..., None] / max_depth  # scaled, [B, H, W, 1]

        depth_8x8 = plane_head(daspp_feat, nf // 4, 8, "reduc8x8")
        depth_8x8_ds = downsample2d_nearest(depth_8x8, 4)

        up3 = bts_bn(train, "bn3")(Upconv(nf // 4, name="upconv3")(daspp_feat))  # H/4
        iconv3 = nn.elu(nn.Conv(nf // 4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=xavier, name="conv3")(
            jnp.concatenate([up3, skip1, depth_8x8_ds], -1)))

        depth_4x4 = plane_head(iconv3, nf // 8, 4, "reduc4x4")
        depth_4x4_ds = downsample2d_nearest(depth_4x4, 2)

        up2 = bts_bn(train, "bn2")(Upconv(nf // 8, name="upconv2")(iconv3))  # H/2
        iconv2 = nn.elu(nn.Conv(nf // 8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=xavier, name="conv2")(
            jnp.concatenate([up2, skip0, depth_4x4_ds], -1)))

        depth_2x2 = plane_head(iconv2, nf // 16, 2, "reduc2x2")

        up1 = Upconv(nf // 16, name="upconv1")(iconv2)  # H
        reduc1x1 = Reduction1x1(nf // 32, max_depth, is_final=True, name="reduc1x1")(up1)
        iconv1 = nn.elu(nn.Conv(nf // 16, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=xavier, name="conv1")(
            jnp.concatenate([up1, reduc1x1, depth_2x2, depth_4x4, depth_8x8], -1)))
        final = nn.sigmoid(nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                                   kernel_init=xavier, name="get_depth")(iconv1))
        final_depth = jnp.maximum(max_depth * final, min_depth)
        return final_depth[..., 0]


@register_model("bts")
class BTS(nn.Module):
    option: object

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        opt = self.option.model
        skips = ResNetEncoder(opt.encoder, name="encoder")(batch["center"], train)
        depth = BTSDecoder(self.option, opt.bts_size, name="decoder")(skips, train)
        return {
            "pred_depth": depth[:, None],  # [B, 1, H, W]
            "ref_feature": jnp.max(skips[1], axis=-1),
        }
