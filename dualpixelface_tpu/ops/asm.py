"""Adaptive Sampling Module (ASM): sub-pixel shift + masking attention.

Parity target: reference `src/module/asm/asm.py` (subpixel_shift:9-127,
MaskingAttention:131-173). The DP defocus disparity axis is the image y/H
axis (see the axis diagram at ref stereodpnet/modules.py:153-179); `forward`
shifts by +disp, `backward` by -disp.

TPU-first re-design — the reference loops over the D disparity planes, doing
two grid_samples and a full FFT/iFFT pair *per plane per direction*
(stereodpnet/modules.py:185-194). Here all D planes are produced at once:

  * nearest / bilinear: the per-plane shifts are compile-time constants
    (costrange is derived from static config), so each plane is a static
    slice-and-pad — no gather, no grid_sample; XLA fuses the D plane shifts
    into the downstream concat.
  * phase (Fourier) shift: ONE forward FFT along H per feature map, a
    broadcast multiply with a [D, H] phase-ramp matrix (the column shift is
    always 0, ref asm.py:64, so the 2-D FFT of the reference reduces exactly
    to a 1-D FFT along H), and one batched inverse FFT for all D planes.

Deviation (documented): the reference's 'nearest' branch samples a grid built
with align-corners normalization through grid_sample's default
align_corners=False, off by a sub-pixel scale factor h/(h-1); we implement the
geometrically exact nearest shift src[round(y+disp)]. The 'bilinear' branch
(align_corners=True) is matched exactly: zero contribution outside [0, H-1].
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.ops.blocks import InstanceNorm, PReLU, he_normal_out


def shift_h_static(x: jnp.ndarray, k: int, axis: int = 1) -> jnp.ndarray:
    """dst[y] = src[y + k] along `axis`, zero-filled out of bounds. k static."""
    if k == 0:
        return x
    n = x.shape[axis]
    if abs(k) >= n:
        return jnp.zeros_like(x)
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    if k > 0:
        idx[axis] = slice(k, None)
        pad[axis] = (0, k)
    else:
        idx[axis] = slice(None, k)
        pad[axis] = (-k, 0)
    return jnp.pad(x[tuple(idx)], pad)


def shift_h_nearest(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Nearest-neighbor fractional shift: src[round(y + delta)]."""
    return shift_h_static(x, int(np.round(delta)), axis)


def _compat_nearest_index(n: int, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact nearest sampling index along one axis.

    The reference builds an align-corners-normalized grid
    (asm.py:39-41, v/(n-1)*2-1) but samples it through grid_sample's
    default align_corners=False, so the source position is
    (i + delta) * n / (n - 1) - 0.5 — a sub-pixel STRETCH, not a uniform
    shift (it even zeroes the last row/column for even n). np.round is
    half-to-even, matching grid_sample's nearbyint.
    """
    pos = (np.arange(n) + delta) * n / (n - 1) - 0.5
    idx = np.round(pos).astype(np.int64)
    valid = (idx >= 0) & (idx <= n - 1)
    return np.clip(idx, 0, n - 1), valid


def shift_h_nearest_compat(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Bit-compatible twin of the reference's nearest branch: the H axis gets
    the (stretched) +delta map and the W axis (axis+1) the delta=0 map —
    both remapped, exactly as grid_sample sees the full 2-D grid."""
    h, w = x.shape[axis], x.shape[axis + 1]
    idx_h, ok_h = _compat_nearest_index(h, delta)
    idx_w, ok_w = _compat_nearest_index(w, 0.0)
    out = jnp.take(x, jnp.asarray(idx_h), axis=axis)
    out = jnp.take(out, jnp.asarray(idx_w), axis=axis + 1)
    shape_h = [1] * x.ndim
    shape_h[axis] = h
    shape_w = [1] * x.ndim
    shape_w[axis + 1] = w
    mask = jnp.asarray(ok_h, x.dtype).reshape(shape_h) * jnp.asarray(
        ok_w, x.dtype
    ).reshape(shape_w)
    return out * mask


def shift_h_bilinear(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Bilinear fractional shift along `axis` with zero padding.

    Matches torch grid_sample(mode='bilinear', align_corners=True,
    padding_mode='zeros') on the reference's +delta row grid (asm.py:35-47):
    each of the two integer corners contributes 0 when outside [0, H-1].
    """
    lo = int(math.floor(delta))
    w = delta - lo
    out = (1.0 - w) * shift_h_static(x, lo, axis)
    if w != 0.0:
        out = out + w * shift_h_static(x, lo + 1, axis)
    return out


def phase_shift_multi(x: jnp.ndarray, deltas: Sequence[float], axis: int = 1) -> jnp.ndarray:
    """Fourier (circular) sub-pixel shift for ALL deltas at once.

    x: [B, H, W, C]; returns [B, D, H, W, C] where out[:, i, y] = x[y + deltas[i]]
    (circular). Matches the reference's rfft-phase-irfft chain (asm.py:104-125):
    F -> F * exp(+i*2*pi*delta*Nr/H) -> real(iF).
    """
    h = x.shape[axis]
    freqs = np.fft.fftfreq(h) * h  # integer frequency grid Nr (ref asm.py:67)
    deltas = np.asarray(list(deltas), dtype=np.float64)
    # [D, H] complex phase ramp
    phase = np.exp(2j * np.pi * (deltas[:, None] / h) * freqs[None, :])

    fx = jnp.fft.fft(x.astype(jnp.float32), axis=axis)  # [B, H, W, C] complex
    fx = jnp.expand_dims(fx, 1)  # [B, 1, H, W, C]
    shape = [1, len(deltas), 1, 1, 1]
    shape[axis + 1] = h
    ramp = jnp.asarray(phase.reshape([len(deltas), h]).reshape(shape))
    out = jnp.fft.ifft(fx * ramp, axis=axis + 1).real
    return out.astype(x.dtype)


def subpixel_shift_planes(
    feat: jnp.ndarray,
    disps: Sequence[float],
    direction: str,
    nearest: bool = True,
    bilinear: bool = True,
    phase: bool = True,
    compat_nearest: bool = False,
) -> jnp.ndarray:
    """Shift `feat` [B, H, W, C] by every disparity in `disps` along H, in up
    to three modes simultaneously (ref asm.py:87-127).

    Returns [B, D, M, H, W, C] with M = number of enabled modes, ordered
    (nearest, bilinear, phase) as in the reference's dstfeats list.
    `compat_nearest` reproduces the reference's align-corners-mismatched
    nearest grid bit-for-bit (needed for checkpoint-level parity).
    """
    sign = 1.0 if direction == "forward" else -1.0
    shift_nearest = shift_h_nearest_compat if compat_nearest else shift_h_nearest
    planes_by_mode = []
    if nearest:
        planes_by_mode.append(
            jnp.stack([shift_nearest(feat, sign * d) for d in disps], axis=1)
        )
    if bilinear:
        planes_by_mode.append(
            jnp.stack([shift_h_bilinear(feat, sign * d) for d in disps], axis=1)
        )
    if phase:
        planes_by_mode.append(phase_shift_multi(feat, [sign * d for d in disps]))
    return jnp.stack(planes_by_mode, axis=2)  # [B, D, M, H, W, C]


class MaskingAttention(nn.Module):
    """Shift-mode gating attention (ref asm.py:131-173).

    Input: [B, D, M, H, W, C] (all disparity planes at once — D folds into the
    batch so the (1,3,3) mask conv, BN, InstanceNorm and softmax-over-M are one
    fused call instead of the reference's per-plane/per-direction loop).
    Output: [B, D, H, W, C] — softmax(activation(mask)) over M gates the
    shifted variants, then mean (or MVSNet-style variance) over M.

    Deviation (documented): train-mode BatchNorm statistics are computed over
    all planes and both call sites jointly rather than per plane-call.
    """

    features: int
    act: str = "sigmoid"
    feature_fetch: bool = False
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, d, m, h, w, c = x.shape
        y = x.reshape(b * d, m, h, w, c)

        mask = nn.Conv(
            self.features,
            kernel_size=(1, 3, 3),
            padding=[(0, 0), (1, 1), (1, 1)],
            use_bias=False,
            kernel_init=he_normal_out,
            dtype=self.dtype,
        )(y)
        mask = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(mask)
        mask = nn.relu(mask)
        mask = nn.Conv(
            self.features, kernel_size=(1, 1, 1), use_bias=False,
            kernel_init=he_normal_out, dtype=self.dtype,
        )(mask)
        mask = InstanceNorm(dtype=self.dtype)(mask)

        if self.act == "relu":
            mask = PReLU(init=0.05)(mask)
        elif self.act == "sigmoid":
            mask = nn.sigmoid(mask)
        else:
            raise NotImplementedError(f"asm activation {self.act!r}")

        gate = nn.softmax(mask, axis=1)  # softmax over shift-mode axis M
        y = y * gate

        if self.feature_fetch:
            avg = jnp.mean(y, axis=1)
            avg2 = jnp.mean(y * y, axis=1)
            out = avg2 - avg * avg
        else:
            out = jnp.mean(y, axis=1)

        return out.reshape(b, d, h, w, c)
