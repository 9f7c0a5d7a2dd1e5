"""BTS backbone encoders: ResNet-50/101, ResNeXt-50/101, DenseNet-121/161 in Flax.

Parity target: ref `src/model/bts/modules.py:268-311` — the reference wraps
torchvision pretrained backbones and taps skip features at
['relu', 'layer1', 'layer2', 'layer3', 'layer4'] with channel counts
[64, 256, 512, 1024, 2048].

Deviation (documented, SURVEY.md §7.3): no torchvision-pretrained weights
exist for JAX in this environment, so encoders initialize from scratch;
`tools/convert_bts_encoder.py` imports torch checkpoints (ResNet/ResNeXt and
DenseNet-121/161 alike) into this parameter tree when pretrained weights are
available.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.ops.blocks import he_normal_out

RESNET_SPECS = {
    "resnet50_bts": dict(blocks=(3, 4, 6, 3), groups=1, width_per_group=64),
    "resnet101_bts": dict(blocks=(3, 4, 23, 3), groups=1, width_per_group=64),
    "resnext50_bts": dict(blocks=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_bts": dict(blocks=(3, 4, 23, 3), groups=32, width_per_group=8),
}

DENSENET_SPECS = {
    # (growth_rate, block_config, init_features) per torchvision
    "densenet121_bts": dict(growth=32, blocks=(6, 12, 24, 16), init=64),
    "densenet161_bts": dict(growth=48, blocks=(6, 12, 36, 24), init=96),
}

FEAT_OUT_CHANNELS = [64, 256, 512, 1024, 2048]


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        y = nn.Conv(width, (1, 1), use_bias=False, kernel_init=he_normal_out, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                    use_bias=False, kernel_init=he_normal_out, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=he_normal_out, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=he_normal_out, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(y + x)


class DenseLayer(nn.Module):
    growth: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        y = nn.relu(bn("norm1")(x))
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, kernel_init=he_normal_out, name="conv1")(y)
        y = nn.relu(bn("norm2")(y))
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=he_normal_out, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetEncoder(nn.Module):
    """DenseNet-121/161 features with BTS skip taps at
    ['relu0', 'pool0', 'transition1', 'transition2', 'norm5']
    (ref bts/modules.py:270-279)."""

    encoder: str = "densenet121_bts"

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = DENSENET_SPECS[self.encoder]
        growth, blocks, init = spec["growth"], spec["blocks"], spec["init"]
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        skips = [x]

        y = nn.Conv(init, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_normal_out, name="conv0")(x)
        y = nn.relu(bn("norm0")(y))
        skips.append(y)  # 'relu0' @ 1/2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        skips.append(y)  # 'pool0' @ 1/4

        features = init
        for bi, nlayers in enumerate(blocks):
            for li in range(nlayers):
                y = DenseLayer(growth, name=f"denseblock{bi + 1}_layer{li + 1}")(y, train)
            features += nlayers * growth
            if bi < len(blocks) - 1:
                y = nn.relu(bn(f"transition{bi + 1}_norm")(y))
                features = features // 2
                y = nn.Conv(features, (1, 1), use_bias=False, kernel_init=he_normal_out,
                            name=f"transition{bi + 1}_conv")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                if bi < 2:
                    skips.append(y)  # transition1 @ 1/8, transition2 @ 1/16
        y = bn("norm5")(y)
        skips.append(y)  # norm5 @ 1/32
        return skips


class ResNetEncoder(nn.Module):
    """Returns skip features [x, relu, layer1, layer2, layer3, layer4]
    (channel counts [3, 64, 256, 512, 1024, 2048]), mirroring the reference's
    skip_feat list (bts/modules.py:300-311). DenseNet encoder names dispatch
    to DenseNetEncoder (taps [relu0, pool0, transition1, transition2, norm5])."""

    encoder: str = "resnet50_bts"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.encoder in DENSENET_SPECS:
            return DenseNetEncoder(self.encoder, name="densenet")(x, train)
        spec = RESNET_SPECS[self.encoder]
        skips = [x]

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_normal_out, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        skips.append(y)  # 'relu' @ 1/2, 64

        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = 64
        for li, nblocks in enumerate(spec["blocks"]):
            stride = 1 if li == 0 else 2
            y = Bottleneck(planes, stride, True, spec["groups"], spec["width_per_group"],
                           name=f"layer{li + 1}_0")(y, train)
            for bi in range(1, nblocks):
                y = Bottleneck(planes, 1, False, spec["groups"], spec["width_per_group"],
                               name=f"layer{li + 1}_{bi}")(y, train)
            skips.append(y)  # layer{li+1}
            planes *= 2

        return skips
