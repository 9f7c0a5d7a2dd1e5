"""BTS backbone encoders: ResNet-50/101 and ResNeXt-50/101 in Flax.

Parity target: ref `src/model/bts/modules.py:268-311` — the reference wraps
torchvision pretrained backbones and taps skip features at
['relu', 'layer1', 'layer2', 'layer3', 'layer4'] with channel counts
[64, 256, 512, 1024, 2048].

Deviation (documented, SURVEY.md §7.3): no torchvision-pretrained weights
exist for JAX in this environment, so encoders initialize from scratch;
`tools/convert_bts_encoder.py` imports torch checkpoints into this parameter
tree when pretrained weights are available. DenseNet variants are not yet
implemented (tracked gap).
"""
from __future__ import annotations

from flax import linen as nn

from dualpixelface_tpu.ops.blocks import he_normal_out

RESNET_SPECS = {
    "resnet50_bts": dict(blocks=(3, 4, 6, 3), groups=1, width_per_group=64),
    "resnet101_bts": dict(blocks=(3, 4, 23, 3), groups=1, width_per_group=64),
    "resnext50_bts": dict(blocks=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_bts": dict(blocks=(3, 4, 23, 3), groups=32, width_per_group=8),
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


class ResNetEncoder(nn.Module):
    """Returns skip features [x, relu, layer1, layer2, layer3, layer4]
    (channel counts [3, 64, 256, 512, 1024, 2048]), mirroring the reference's
    skip_feat list (bts/modules.py:300-311)."""

    encoder: str = "resnet50_bts"

    @nn.compact
    def __call__(self, x, train: bool = False):
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
