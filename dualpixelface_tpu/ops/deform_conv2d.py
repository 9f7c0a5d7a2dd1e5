"""2-D deformable & modulated deformable convolution (DCNv1/v2).

Parity target: the reference's `src/module/dcn/` CUDA extension
(deform_conv_cuda.cpp/.cu, ~1900 LoC; Python wrappers DeformConv(Pack) /
ModulatedDeformConv(Pack), deform_conv.py:15-310). The extension is built by
installer.sh but never imported by the main pipeline (SURVEY.md §2.8) — it is
provided here as an optional op for API parity, specialized from the same
gather-im2col + MXU-matmul formulation as ops/deform_conv3d.

Offset layout per tap k (row-major over the kernel window): channels
(2k, 2k+1) = (dy, dx); the modulated variant adds a per-tap sigmoid mask
multiplying the sampled value (DCNv2).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 1,
    dilation: int | Sequence[int] = 1,
) -> jnp.ndarray:
    """x [B, H, W, Cin]; offset [B, Ho, Wo, 2K] (dy, dx per tap);
    weight [KH, KW, Cin, Cout]; mask [B, Ho, Wo, K] or None (DCNv2).
    Returns [B, Ho, Wo, Cout] with bilinear sampling, zeros out of bounds.
    """
    st, pad, dil = _pair(stride), _pair(padding), _pair(dilation)
    b, h, w, cin = x.shape
    kh, kw, cin_w, cout = weight.shape
    assert cin_w == cin
    k = kh * kw
    bo, ho, wo, off_c = offset.shape
    assert off_c == 2 * k
    n = ho * wo

    f32 = jnp.float32
    yy, xx = jnp.meshgrid(jnp.arange(ho), jnp.arange(wo), indexing="ij")
    ky, kx = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    base_h = (yy.reshape(-1, 1) * st[0] - pad[0] + ky.reshape(1, -1) * dil[0]).astype(f32)
    base_w = (xx.reshape(-1, 1) * st[1] - pad[1] + kx.reshape(1, -1) * dil[1]).astype(f32)

    off = offset.reshape(b, n, k, 2).astype(f32)
    pos_h = base_h[None] + off[..., 0]
    pos_w = base_w[None] + off[..., 1]

    h0 = jnp.floor(pos_h)
    w0 = jnp.floor(pos_w)
    fh = pos_h - h0
    fw = pos_w - w0

    x_flat = x.reshape(b, h * w, cin)
    cols = jnp.zeros((b, n, k, cin), x.dtype)
    for cy in (0, 1):
        yi = h0 + cy
        wy = jnp.where(cy == 0, 1.0 - fh, fh)
        y_ok = (yi >= 0) & (yi <= h - 1)
        for cx in (0, 1):
            xi = w0 + cx
            wx = jnp.where(cx == 0, 1.0 - fw, fw)
            x_ok = (xi >= 0) & (xi <= w - 1)
            wgt = (wy * wx) * (y_ok & x_ok).astype(f32)
            lin = (jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
                   + jnp.clip(xi, 0, w - 1).astype(jnp.int32))
            gathered = jnp.take_along_axis(
                x_flat, lin.reshape(b, n * k, 1), axis=1
            ).reshape(b, n, k, cin)
            cols = cols + gathered * wgt[..., None].astype(x.dtype)

    if mask is not None:
        cols = cols * mask.reshape(b, n, k, 1).astype(cols.dtype)

    out = jax.lax.dot_general(
        cols.reshape(b, n, k * cin), weight.reshape(k * cin, cout).astype(cols.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, ho, wo, cout)


def _torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class DeformConvPack2D(nn.Module):
    """Self-offset 2-D deformable conv (ref dcn deform_conv.py DeformConvPack);
    modulated=True adds the DCNv2 sigmoid mask head (ModulatedDeformConvPack)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    modulated: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel_size
        k = kh * kw
        cin = x.shape[-1]
        head_ch = 3 * k if self.modulated else 2 * k
        head = nn.Conv(
            head_ch, (kh, kw), strides=(self.stride,) * 2,
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        if self.modulated:
            offset, mask_logits = head[..., : 2 * k], head[..., 2 * k :]
            mask = nn.sigmoid(mask_logits)
        else:
            offset, mask = head, None

        weight = self.param("weight", _torch_kaiming_uniform, (kh, kw, cin, self.features))
        bias = None
        if self.use_bias:
            bound = 1.0 / np.sqrt(k * cin)
            bias = self.param(
                "bias", lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                (self.features,),
            )
        out = deform_conv2d(
            x, offset, weight, bias, mask, stride=self.stride, padding=self.padding
        )
        return out, offset
