"""DPNet — monocular-style DP encoder-decoder (reimpl. of Google ICCV'19 DPNet).

Parity target: ref `src/model/dpnet/{mainmodel,modules}.py` — left/right pair
concatenated channel-wise, 5 encoder stages of residual Encoder blocks
(max-pool skips), 4 Decoder stages (k=4 s=2 deconvs + depthwise-separable
stacks), depthwise-separable skip connections, 5 multi-scale heads upsampled
x16/8/4/2/1 and stacked into pred_depth [B, 5, H, W].

The reference's idiosyncratic padding algebra (1x1 convs with nonzero pad,
pool-without-pad skips) is replicated exactly — it is what makes all five
output scales land on the same full resolution for factor-96 crops. Weights
are xavier-uniform with zero bias per the model's init_weights override
(ref mainmodel.py:112-117).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.base import select_ref_target
from dualpixelface_tpu.ops.blocks import PReLU
from dualpixelface_tpu.ops.resize import upsample2d_bilinear

xavier = nn.initializers.xavier_uniform()


class TorchBlock(nn.Module):
    """conv (or k4s2 deconv) with explicit torch padding + optional BN+PReLU
    (ref src/module/asm/basics.py BasicBlock)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    deconv: bool = False
    bn: bool = True
    relu: bool = True
    reluw: float = 0.05

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, p = self.kernel_size, self.pad
        if self.deconv:
            x = nn.ConvTranspose(
                self.features, (k, k), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False, kernel_init=xavier, transpose_kernel=True,
            )(x)
            # torch ConvTranspose padding trims p from each side
            if p:
                x = x[:, p:-p, p:-p, :]
        else:
            x = nn.Conv(
                self.features, (k, k), strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)], use_bias=False, kernel_init=xavier,
            )(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        if self.relu:
            x = PReLU(self.reluw)(x)
        return x


class DWSep(nn.Module):
    """depthwise-separable conv with BN+PReLU and explicit pad (ref basics.py)."""

    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k, p = self.kernel_size, self.padding
        x = nn.Conv(cin, (k, k), padding=[(p, p), (p, p)], feature_group_count=cin,
                    use_bias=False, kernel_init=xavier)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, kernel_init=xavier)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return PReLU(0.05)(x)


class Encoder(nn.Module):
    """(ref dpnet/modules.py:7-36)"""

    infilter: int
    outfilter: int
    stride: int
    pad_basic: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchBlock(self.infilter, 3, self.stride, self.pad_basic)(x, train)
        y = DWSep(self.infilter, 3, 1)(y, train)
        y = TorchBlock(self.outfilter, 1, 1, 0)(y, train)

        skip = TorchBlock(self.outfilter, 1, 1, self.pad_basic)(x, train)
        skip = nn.max_pool(skip, (3, 3), strides=(self.stride, self.stride), padding="VALID")
        return PReLU(0.05)(y + skip)


class Encoder2(nn.Module):
    """Stem: k7 s2 conv || k7 s2 maxpool, concatenated (ref modules.py:40-56)."""

    outfilter: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = nn.max_pool(x, (7, 7), strides=(2, 2), padding=[(1, 1), (1, 1)])
        y = TorchBlock(self.outfilter, 7, 2, 1)(x, train)
        return jnp.concatenate([y, skip], axis=-1)


class Decoder(nn.Module):
    """k4 s2 deconv + 3 depthwise-separable convs (ref modules.py:59-85)."""

    infilter: int
    pad_basic: int
    pad_1: int
    pad_2: int
    pad_3: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchBlock(self.infilter, 4, 2, self.pad_basic, deconv=True)(x, train)
        y = DWSep(self.infilter, 3, self.pad_1)(y, train)
        y = DWSep(self.infilter, 1, self.pad_2)(y, train)
        y = DWSep(self.infilter, 3, self.pad_3)(y, train)
        return y


@register_model("dpnet")
class DPNET(nn.Module):
    option: object

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        ref_img, tar_img = select_ref_target(batch, self.option)
        x = jnp.concatenate([ref_img, tar_img], axis=-1)

        # encoder (ref mainmodel.py:41-58,142-166)
        x1 = Encoder2(8, name="enc_layer1_1")(x, train)
        x1 = Encoder(11, 11, 1, 1, name="enc_layer1_2")(x1, train)

        x2 = Encoder(16, 32, 2, 0, name="enc_layer2_1")(x1, train)
        x2 = Encoder(16, 32, 1, 1, name="enc_layer2_2")(x2, train)
        x2 = Encoder(16, 32, 1, 1, name="enc_layer2_3")(x2, train)

        x3 = Encoder(16, 64, 2, 2, name="enc_layer3_1")(x2, train)
        x3 = Encoder(16, 64, 1, 1, name="enc_layer3_2")(x3, train)
        x3 = Encoder(16, 64, 1, 1, name="enc_layer3_3")(x3, train)

        x4 = Encoder(32, 128, 2, 1, name="enc_layer4_1")(x3, train)
        x4 = Encoder(32, 128, 1, 1, name="enc_layer4_2")(x4, train)
        x4 = Encoder(32, 128, 1, 1, name="enc_layer4_3")(x4, train)

        x5 = Encoder(32, 128, 2, 1, name="enc_layer5_1")(x4, train)
        x5 = Encoder(32, 128, 1, 1, name="enc_layer5_2")(x5, train)
        x5 = Encoder(32, 128, 1, 1, name="enc_layer5_3")(x5, train)

        prelu = PReLU(0.05, name="shared_prelu")  # ONE shared param (ref :87)

        # decoder with depthwise-separable skips (ref mainmodel.py:160-186)
        y5 = Decoder(32, 1, 1, 1, 1, name="dec_layer4")(x5, train)
        y5 = prelu(y5 + DWSep(32, 3, 2, name="skip_layer4")(x4, train))
        y5 = TorchBlock(128, 1, 1, 1, bn=False, relu=False, name="dec_layer4_b")(y5, train)

        y4 = Decoder(16, 2, 0, 1, 0, name="dec_layer3")(y5, train)
        y4 = prelu(y4 + DWSep(16, 3, 3, name="skip_layer3")(x3, train))
        y4 = TorchBlock(64, 1, 1, 1, bn=False, relu=False, name="dec_layer3_b")(y4, train)

        y3 = Decoder(16, 4, 0, 0, 0, name="dec_layer2")(y4, train)
        y3 = prelu(y3 + DWSep(16, 3, 3, name="skip_layer2")(x2, train))
        y3 = TorchBlock(32, 1, 1, 1, bn=False, relu=False, name="dec_layer2_b")(y3, train)

        y2 = Decoder(16, 4, 1, 0, 1, name="dec_layer1")(y3, train)
        y2 = prelu(y2 + DWSep(16, 3, 3, name="skip_layer1")(x1, train))
        y2 = TorchBlock(32, 1, 1, 1, bn=False, relu=False, name="dec_layer1_b")(y2, train)

        y1 = Decoder(8, 4, 1, 0, 1, name="last_layer")(y2, train)
        y1 = TorchBlock(8, 1, 1, 1, bn=False, relu=False, name="last_layer_b")(y1, train)

        def head(y, pad, factor, name):
            o = TorchBlock(1, 7, 1, pad, name=name)(y, train)
            if factor > 1:
                o = upsample2d_bilinear(o, factor)
            return o[..., 0]

        out5 = head(y5, 1, 16, "conv_last_layer5")
        out4 = head(y4, 0, 8, "conv_last_layer4")
        out3 = head(y3, 1, 4, "conv_last_layer3")
        out2 = head(y2, 1, 2, "conv_last_layer2")
        out1 = head(y1, 1, 1, "conv_last_layer1")

        return {
            "pred_depth": jnp.stack([out1, out2, out3, out4, out5], axis=1),
            "ref_feature": jnp.max(x1, axis=-1),
        }
