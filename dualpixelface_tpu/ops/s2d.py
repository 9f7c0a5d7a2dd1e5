"""Space-to-depth (s2d) execution of small-channel 2-D convs.

The StereoDPNet feature towers run 3x3 convs at C=32 over 384x288 maps
(ref `src/model/stereodpnet/modules.py:21-80`) — the worst shape for the
MXU: 32 of 128 input/output lanes used, and XLA's small-channel conv
layouts ({1,3,2,0} spatial-minor shuffles) surround every conv with
relayout copies. Measured on chip (tools/bench_conv_probe.py --part s2d):

    fine 3x3  [8,384,288,32->32]   1.31 ms   6.3% MFU
    s2d  3x3  [8,192,144,128->128] 0.69 ms  48.2% MFU   (same math, 4x FLOPs)
    s2d  5x5  [8,192,144,128->128] 1.30 ms  71.0% MFU   (= fine dilation-3)
    s2d  7x7  [8,192,144,128->128] 2.19 ms  82.2% MFU   (= fine dilation-5)

A fine 3x3/stride-1/dilation-d conv over [N, H, W, C] is EXACTLY a single
coarse conv over the packed [N, H/2, W/2, 4C] tensor: output fine row
2m + a_o reads fine rows 2m + a_o + d*(dy-1) = 2*(m + s_y) + a_i with
s_y = floor((a_o + d*(dy-1))/2), a_i = (a_o + d*(dy-1)) mod 2 — so each
fine tap (dy, dx, ci, co) lands at exactly one coarse-kernel position
(s_y, s_x) and one (parity_in -> parity_out) channel-block. The coarse
kernel is [K, K, 4C, 4Co] with K = 2*max|s| + 1 and the fine taps
scattered in (the rest structural zeros). Fine SAME padding (= dilation
for k=3, ops/blocks.torch_pad) equals coarse SAME padding (K-1)//2 when
H and W are even. Stride-2 fine convs read a single input parity per tap
and emit the dense coarse grid, so the s2d region needs NO unpack op: the
strided tail of a packed block IS the next scale.

The fine [k, k, Cin, Cout] kernel stays the parameter (scattering happens
per apply), so checkpoints, converters and the weight-transfer parity
tests are unaffected; BatchNorm in packed space normalizes the
[..., 4, C] view, which pools the four parities per fine channel — the
IDENTICAL reduction set as fine BN, so train-mode statistics match
bit-for-bit too.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def s2d_pack(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; channel layout (row-parity,
    col-parity) major, fine channel minor."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def s2d_unpack(y):
    """Inverse of :func:`s2d_pack`."""
    n, hc, wc, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, hc, wc, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hc, 2 * wc, c)


def s2d_concat(tensors):
    """Channel-concat of packed tensors matching fine-space concat order
    (fine concat then pack == per-parity concat of the packed operands)."""
    views = []
    for t in tensors:
        n, hc, wc, c4 = t.shape
        views.append(t.reshape(n, hc, wc, 4, c4 // 4))
    cat = jnp.concatenate(views, axis=-1)
    n, hc, wc, _, cs = cat.shape
    return cat.reshape(n, hc, wc, 4 * cs)


def dpack(x):
    """Depth-to-channels pack for 3-D volumes: [B, D, H, W, C] ->
    [B, D/4, H, W, 4C], D-plane major / fine channel minor. The RESIDENT
    layout for the aggregation dres chain (ops/aggregation.py): groups of 4
    D-planes ride the lane dim so the 32-channel stride-1 convs contract
    over 128+ lanes (the per-conv pack/unpack variant of this layout won its
    microbench but lost full-model to relayout churn — resident packing
    amortizes ONE pack/unpack over the whole chain,
    docs/PERFORMANCE.md round 4)."""
    b, d, h, w, c = x.shape
    assert d % 4 == 0 and d >= 4, d
    return (
        x.reshape(b, d // 4, 4, h, w, c)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(b, d // 4, h, w, 4 * c)
    )


def dunpack(q):
    """Inverse of :func:`dpack`."""
    b, g, h, w, c4 = q.shape
    c = c4 // 4
    return (
        q.reshape(b, g, h, w, 4, c)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, 4 * g, h, w, c)
    )


def _tap_positions(k: int, dilation: int, stride: int):
    """Static tap map: yields (dy, a_o, s, a_i) per 1-D tap/output-parity.
    stride 2 emits only a_o = 0 (the dense coarse grid)."""
    taps = []
    r = (k - 1) // 2
    for a_o in (0,) if stride == 2 else (0, 1):
        for dy in range(k):
            t = a_o + dilation * (dy - r)
            taps.append((dy, a_o, t // 2, t % 2))
    return taps


def s2d_kernel_extent(k: int, dilation: int, stride: int) -> int:
    """Coarse kernel size K for a fine k/dilation/stride conv."""
    return 2 * max(abs(s) for _, _, s, _ in _tap_positions(k, dilation, stride)) + 1


def scatter_kernel(kernel, dilation: int, stride: int):
    """Fine [k, k, C, Co] kernel -> coarse [K, K, 4C, {4Co | Co}] kernel."""
    k = kernel.shape[0]
    c, co = kernel.shape[2], kernel.shape[3]
    taps = _tap_positions(k, dilation, stride)
    kk = s2d_kernel_extent(k, dilation, stride)
    p = (kk - 1) // 2
    out_par = 1 if stride == 2 else 4
    kc = jnp.zeros((kk, kk, 4 * c, out_par * co), kernel.dtype)
    for dy, a_o, sy, a_i in taps:
        for dx, b_o, sx, b_i in taps:
            pi = (a_i * 2 + b_i) * c
            po = 0 if stride == 2 else (a_o * 2 + b_o) * co
            kc = kc.at[
                sy + p, sx + p, pi : pi + c, po : po + co
            ].set(kernel[dy, dx])
    return kc


def scatter_kernel_depthwise(kernel, dilation: int = 1):
    """Fine DEPTHWISE [k, k, 1, C] kernel (flax grouped-conv layout) ->
    dense coarse [K, K, 4C, 4C] kernel whose (parity_in -> parity_out)
    blocks are C-diagonal.

    A fine depthwise conv crosses parity blocks in packed space (the packed
    layout is parity-major, so the four parities of one fine channel are
    strided by C — not expressible as a coarse grouped conv), and depthwise
    convs are VPU work the MXU runs circles around anyway: the dense
    scattered form burns 4C x the FLOPs but stays in the packed 4C-lane
    layout with zero relayouts."""
    k = kernel.shape[0]
    c = kernel.shape[3]
    taps = _tap_positions(k, dilation, 1)
    kk = s2d_kernel_extent(k, dilation, 1)
    p = (kk - 1) // 2
    ar = jnp.arange(c)
    kc = jnp.zeros((kk, kk, 4 * c, 4 * c), kernel.dtype)
    for dy, a_o, sy, a_i in taps:
        for dx, b_o, sx, b_i in taps:
            pi = (a_i * 2 + b_i) * c
            po = (a_o * 2 + b_o) * c
            kc = kc.at[sy + p, sx + p, pi + ar, po + ar].set(kernel[dy, dx, 0])
    return kc


class S2DDepthwiseConv(nn.Module):
    """Drop-in for `nn.Conv(C, (k,k), feature_group_count=C, padding=p)`
    on a PACKED [N, Hc, Wc, 4C] tensor (stride 1). Declares the identical
    ('kernel' [k,k,1,C], optional 'bias' [C]) parameters — instantiate with
    the fine module's name for a checkpoint-identical tree."""

    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init, (k, k, 1, c))
        dt = x.dtype if self.dtype is None else self.dtype
        kc = scatter_kernel_depthwise(kernel, self.dilation).astype(dt)
        p = (kc.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kc, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (c,)).astype(dt)
            y = y + jnp.tile(bias, 4)
        return y


class S2DConv(nn.Module):
    """Drop-in for `nn.Conv(features, (k,k), strides, padding=torch_pad,
    kernel_dilation)` operating on a PACKED [N, Hc, Wc, 4*Cin] tensor.

    Declares the identical parameters ('kernel' [k,k,Cin,Cout], optional
    'bias' [Cout]) — instantiate with name="Conv_0" inside ConvBN-style
    wrappers for a checkpoint-identical tree. stride 1 emits packed
    [.., 4*Cout]; stride 2 emits the dense coarse grid [.., Cout] (which IS
    the fine stride-2 output)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c4 = x.shape[-1]
        c = c4 // 4
        co = self.features
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init, (k, k, c, co))
        dt = x.dtype if self.dtype is None else self.dtype
        kc = scatter_kernel(kernel, self.dilation, self.strides).astype(dt)
        p = (kc.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kc, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (co,)).astype(dt)
            y = y + (bias if self.strides == 2 else jnp.tile(bias, 4))
        return y


class S2DBatchNorm(nn.Module):
    """BatchNorm over the FINE channels of a packed [.., G*C] tensor, without
    ever leaving the packed layout (`groups` = G, default 4: the four spatial
    parities / packed D-planes; the mode-packed ASM attention uses G=3).

    Reshaping to a [..., 4, C] view and calling nn.BatchNorm is numerically
    identical but collapses the lane dim 4C -> C, forcing a physical
    relayout before AND after every conv — measured to eat the entire s2d
    conv win on chip. Here the affine stays on the 4C lanes (params tiled
    4x) and the train-mode statistics reduce to [4C] vectors first (tiny),
    then pool the four parity groups — the identical reduction set as fine
    BN (flax's E[x^2]-E[x]^2 fast variance in f32), so running statistics
    and outputs match nn.BatchNorm exactly.

    Parameter/collection names and shapes mirror nn.BatchNorm ('scale',
    'bias'; batch_stats 'mean', 'var', all [C]) — instantiate with
    name="BatchNorm_0" for a checkpoint-identical tree."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    groups: int = 4

    @nn.compact
    def __call__(self, x):
        g = self.groups
        c = x.shape[-1] // g
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # all-but-last axes: the packed tensor may be 4-D (spatial s2d)
            # or 5-D (depth-packed aggregation volumes, [B, G, H, W, 4C])
            red = tuple(range(x.ndim - 1))
            m4 = jnp.mean(xf, axis=red)                  # [G*C]
            e4 = jnp.mean(jnp.square(xf), axis=red)
            mean = jnp.mean(m4.reshape(g, c), axis=0)    # fine-channel stats
            var = jnp.mean(e4.reshape(g, c), axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        dt = jnp.promote_types(
            x.dtype, self.dtype if self.dtype is not None else scale.dtype
        )
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dt)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(dt)
        return x.astype(dt) * jnp.tile(mul, g) + jnp.tile(add, g)
