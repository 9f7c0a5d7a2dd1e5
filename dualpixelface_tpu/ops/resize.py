"""Align-corners-aware interpolation, implemented as small matmuls.

The reference relies on torch `F.interpolate(..., align_corners=True)` in
bilinear/trilinear modes (e.g. stereodpnet/modules.py:127-128,327). JAX's
`jax.image.resize` implements only the half-pixel (align_corners=False)
convention, so we build each 1-D linear-interpolation operator as a dense
[out, in] matrix and contract it along the target axis — on TPU these run on
the MXU and XLA fuses the per-axis contractions, which is both exact and fast
for the small upsample factors used here (x2/x4).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_matrix(out_size: int, in_size: int, align_corners: bool = True) -> np.ndarray:
    """Dense [out, in] linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        coords = np.arange(out_size) * (in_size - 1) / max(out_size - 1, 1)
    else:
        coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        coords = np.clip(coords, 0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (coords - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - w
    m[np.arange(out_size), hi] += w
    return m


@functools.lru_cache(maxsize=128)
def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense [out, in] nearest-neighbor matrix (torch 'nearest' convention:
    src = floor(dst * in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    src = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    m[np.arange(out_size), src] = 1.0
    return m


def _apply_axis(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    mat = jnp.asarray(mat, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("...i,oi->...o", x, mat)
    return jnp.moveaxis(x, -1, axis)


def resize_linear(x: jnp.ndarray, sizes, axes, align_corners: bool = True) -> jnp.ndarray:
    """Multi-axis separable linear resize (bilinear/trilinear)."""
    for size, axis in zip(sizes, axes):
        in_size = x.shape[axis]
        if size == in_size:
            continue
        x = _apply_axis(x, _linear_matrix(size, in_size, align_corners), axis)
    return x


def resize_nearest(x: jnp.ndarray, sizes, axes) -> jnp.ndarray:
    for size, axis in zip(sizes, axes):
        in_size = x.shape[axis]
        if size == in_size:
            continue
        x = _apply_axis(x, _nearest_matrix(size, in_size), axis)
    return x


def upsample2d_bilinear(x: jnp.ndarray, factor: int, align_corners: bool = True) -> jnp.ndarray:
    """[B, H, W, C] -> [B, fH, fW, C], torch F.interpolate(bilinear) parity."""
    b, h, w, c = x.shape
    return resize_linear(x, (h * factor, w * factor), (1, 2), align_corners)


def upsample2d_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return resize_nearest(x, (h * factor, w * factor), (1, 2))


def downsample2d_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, H, W, C] nearest downsample by integer factor (torch
    F.interpolate(scale_factor=1/f, mode='nearest') picks src floor(dst*f))."""
    b, h, w, c = x.shape
    return resize_nearest(x, (h // factor, w // factor), (1, 2))


def upsample3d_trilinear(x: jnp.ndarray, factor: int, align_corners: bool = True) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, fD, fH, fW, C], torch trilinear parity
    (ref stereodpnet/modules.py:327 cost upsampling)."""
    b, d, h, w, c = x.shape
    return resize_linear(x, (d * factor, h * factor, w * factor), (1, 2, 3), align_corners)
