"""BiSeNet face parser (standalone demo-mask tool).

Parity target: ref `src/module/face_seg/{model,resnet}.py` — ResNet18
backbone ContextPath with attention refinement at 1/16 and 1/32, the spatial
path replaced by the backbone's 1/8 feature (ref model.py:246-249), feature
fusion module, three output heads bilinearly upsampled to input size.
The reference copy is not runnable in-tree (stale `Module.External` imports,
ref model.py:10, SURVEY.md §2.10); this one is.

The reference's InPlaceABN native extension is an in-place fused BN+act
memory optimization (ref src/module/face_seg/modules/) — on TPU, XLA fuses
BatchNorm+activation chains natively, so plain BatchNorm is the equivalent
(SURVEY.md §2.8).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.ops.resize import resize_linear, resize_nearest

kaiming = nn.initializers.kaiming_normal()


class ConvBNReLU(nn.Module):
    features: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(self.features, (self.ks, self.ks), strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False, kernel_init=kaiming)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class ResNet18Block(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=kaiming)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming)(y)
        y = bn()(y)
        if self.downsample:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=kaiming)(x)
            x = bn()(x)
        return nn.relu(y + x)


class ResNet18(nn.Module):
    """Returns (feat8 [256ch? no: 128], feat16, feat32) like ref resnet.py:
    layer2 (1/8, 128), layer3 (1/16, 256), layer4 (1/32, 512)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=kaiming)(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def layer(y, ch, stride):
            y = ResNet18Block(ch, stride, downsample=(stride != 1 or y.shape[-1] != ch))(y, train)
            return ResNet18Block(ch, 1)(y, train)

        y = layer(y, 64, 1)  # 1/4
        feat8 = layer(y, 128, 2)  # 1/8
        feat16 = layer(feat8, 256, 2)  # 1/16
        feat32 = layer(feat16, 512, 2)  # 1/32
        return feat8, feat16, feat32


class AttentionRefinement(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNReLU(self.features)(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False, kernel_init=kaiming)(atten)
        atten = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(atten)
        return feat * nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, fsp, fcp, train: bool = False):
        feat = ConvBNReLU(self.features, 1, 1, 0)(jnp.concatenate([fsp, fcp], -1), train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(self.features // 4, (1, 1), use_bias=False, kernel_init=kaiming)(atten))
        atten = nn.sigmoid(nn.Conv(self.features, (1, 1), use_bias=False, kernel_init=kaiming)(atten))
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid: int
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.mid)(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, kernel_init=kaiming)(x)


class BiSeNet(nn.Module):
    n_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1], x.shape[2]
        feat8, feat16, feat32 = ResNet18(name="resnet")(x, train)
        h16, w16 = feat16.shape[1], feat16.shape[2]
        h8, w8 = feat8.shape[1], feat8.shape[2]

        # context path (ref model.py:95-131)
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, 1, 0, name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        f32 = AttentionRefinement(128, name="arm32")(feat32, train) + avg_up
        f32_up = resize_nearest(f32, (h16, w16), (1, 2))
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up, train)

        f16 = AttentionRefinement(128, name="arm16")(feat16, train) + f32_up
        f16_up = resize_nearest(f16, (h8, w8), (1, 2))
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up, train)

        # spatial path == backbone 1/8 feature (ref model.py:246-249)
        fuse = FeatureFusion(256, name="ffm")(feat8, f16_up, train)

        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(fuse, train)
        out16 = BiSeNetOutput(64, self.n_classes, name="conv_out16")(f16_up, train)
        out32 = BiSeNetOutput(64, self.n_classes, name="conv_out32")(f32_up, train)

        up = lambda o: resize_linear(o, (H, W), (1, 2), align_corners=True)
        return up(out), up(out16), up(out32)
