"""Shared Flax NN building blocks (channels-last, TPU-native layouts).

Parity target: reference `src/module/asm/basics.py:9-112` (convbn, convbn_3d,
tconvbn, depthwise_separable_conv, BasicBlock, DomainNorm). Re-designed for
TPU: NHWC / NDHWC layouts (XLA's native conv layouts on TPU), explicit
symmetric padding matching torch's `padding=p` semantics, BatchNorm whose
batch statistics are computed over the *global* batch — under pjit with the
batch sharded over the `data` mesh axis this is cross-replica SyncBN by
construction (the reference only gets this with accelerator='ddp',
config_manager.py:57).

All modules take a `dtype`; the default None follows the input/param
promotion (bf16 end-to-end once the step casts params + batch, fp32 when
uncast), so the training policy's cast actually reaches every conv — flax
modules with an explicit fp32 dtype silently promote bf16 inputs back up.
Norm layers still compute their statistics in fp32 internally (flax
`_compute_stats` upcasts half precision), so bf16 here only changes the
activation traffic, not the stats math.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal with fan_out, matching the reference's weight init
# normal_(0, sqrt(2/n)) with n = prod(kernel) * out_channels
# (ref src/model/stereodpnet/mainmodel.py:51-65).
he_normal_out = jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")

Dtype = Any


def torch_pad(kernel_size: int, dilation: int = 1) -> int:
    """The reference's dilation-aware padding: pad = dilation if dilation > 1
    else (k-1)//2 — for k=3 both equal dilation*(k-1)//2 (ref basics.py:17)."""
    return dilation * (kernel_size - 1) // 2


class ConvBN(nn.Module):
    """2D conv + BatchNorm, no activation (ref basics.py convbn).

    Input/Output: [B, H, W, C]. Padding follows torch's symmetric
    `padding=p` convention exactly (flax 'SAME' differs for stride>1).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    pad: int | None = None
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.pad if self.pad is not None else torch_pad(self.kernel_size, self.dilation)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=he_normal_out,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return x


class _BandedConv3D(nn.Module):
    """Param-compatible stand-in for nn.Conv(3x3x3, stride 1, pad 1) that
    computes the 3-D conv as ONE dense 2-D conv over D-folded channels.

    XLA's TPU 3-D conv runs at single-digit MFU for the cost-volume channel
    widths (C=32: 9 TF/s measured) because lanes pad to 128; folding the
    small D axis into channels (D*C = 256+) reaches the MXU's efficient
    regime despite the ~8/3x structural-zero FLOPs — 1.1-1.8x measured
    (docs/PERFORMANCE.md). The parameter is the same [3,3,3,Cin,Cout] kernel,
    so checkpoints/converters are unaffected.
    """

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        kernel = self.param("kernel", he_normal_out, (3, 3, 3, c, self.features))
        co = self.features
        kb = jnp.zeros((3, 3, d * c, d * co), kernel.dtype)
        for do in range(d):
            for kd in range(3):
                di = do + kd - 1
                if 0 <= di < d:
                    kb = kb.at[:, :, di * c : (di + 1) * c, do * co : (do + 1) * co].set(
                        kernel[kd]
                    )
        dt = x.dtype if self.dtype is None else self.dtype
        xf = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c).astype(dt)
        y = jax.lax.conv_general_dilated(
            xf, kb.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        return y.reshape(b, h, w, d, co).transpose(0, 3, 1, 2, 4)


class ConvBN3D(nn.Module):
    """3D conv + BatchNorm (ref basics.py convbn_3d). Input: [B, D, H, W, C].

    Stride-1 3x3x3 convs with a small D axis automatically use the D-folded
    banded 2-D formulation (_BandedConv3D — numerically the same conv, much
    better MXU utilization)."""

    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    pad: int | Sequence[int] | None = None
    use_bias: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (
            (self.kernel_size,) * 3
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (self.strides,) * 3 if isinstance(self.strides, int) else tuple(self.strides)
        if self.pad is None:
            pad = tuple((k - 1) // 2 for k in ks)
        elif isinstance(self.pad, int):
            pad = (self.pad,) * 3
        else:
            pad = tuple(self.pad)
        banded = (
            ks == (3, 3, 3)
            and st == (1, 1, 1)
            and pad == (1, 1, 1)
            and not self.use_bias
            and 2 <= x.shape[1] <= 8
        )
        if banded:
            x = _BandedConv3D(self.features, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=ks,
                strides=st,
                padding=[(p, p) for p in pad],
                use_bias=self.use_bias,
                kernel_init=he_normal_out,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return x


class TConvBN3D(nn.Module):
    """3D transposed conv (stride-2 upsampling) + BatchNorm.

    Matches torch ConvTranspose3d(k=3, padding=1, output_padding=1, stride=2)
    used in the PSMNet hourglass (ref stereodpnet/modules.py:219-227): output
    spatial size is exactly 2x input.
    """

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose output: (i-1)*s - 2p + k + output_padding = 2i.
        # flax ConvTranspose pads the *output*; with transpose_kernel semantics
        # the equivalent explicit padding for (k=3, s=2, p=1, op=1) is
        # low = k - 1 - p = 1, high = k - 1 - p + op = 2.
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding=[(1, 2), (1, 2), (1, 2)],
            use_bias=False,
            kernel_init=he_normal_out,
            transpose_kernel=True,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise kxk + pointwise 1x1 (+BN +PReLU by default), matching
    ref basics.py depthwise_separable_conv(bn=True, relu=True, reluw=0.05)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = False
    bn: bool = True
    relu: bool = True
    reluw: float = 0.05
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        p = self.padding
        x = nn.Conv(
            in_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding=[(p, p), (p, p)],
            feature_group_count=in_ch,
            use_bias=self.use_bias,
            kernel_init=he_normal_out,
            dtype=self.dtype,
        )(x)
        x = nn.Conv(
            self.features, kernel_size=(1, 1), use_bias=self.use_bias,
            kernel_init=he_normal_out, dtype=self.dtype,
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.relu:
            x = PReLU(init=self.reluw)(x)
        return x


class PReLU(nn.Module):
    """Single-parameter PReLU with configurable init (torch PReLU(init=w))."""

    init: float = 0.05
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.asarray(self.init, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class InstanceNorm(nn.Module):
    """InstanceNorm over all spatial dims, per channel, with affine params
    (torch InstanceNorm3d(affine=True), ref asm.py:138). Channels-last."""

    epsilon: float = 1e-5
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.GroupNorm(
            num_groups=c, epsilon=self.epsilon, use_bias=True, use_scale=True, dtype=self.dtype
        )(x)
