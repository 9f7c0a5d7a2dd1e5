"""Bilinear grid sampling (torch F.grid_sample semantics, channels-last).

Needed by the folded multi-view photometric loss's batch-wise crop alignment
and inverse warping (ref src/loss/depth/folded.py:183-206,301-312). One
vectorized gather — XLA fuses the four corner reads.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample(
    img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Sample `img` [B, H, W, C] at normalized coords `grid` [B, Ho, Wo, 2]
    (grid[..., 0] = x in [-1, 1], grid[..., 1] = y), bilinear, zero padding.

    Matches torch grid_sample(mode='bilinear', padding_mode='zeros'):
    align_corners=True maps -1/1 to pixel centers 0/N-1; False maps them to
    the image edges (pixel coords -0.5 / N-0.5).
    """
    b, h, w, c = img.shape
    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        xs = (x + 1.0) * 0.5 * (w - 1)
        ys = (y + 1.0) * 0.5 * (h - 1)
    else:
        xs = ((x + 1.0) * w - 1.0) * 0.5
        ys = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def corner(yi, xi, wgt):
        ok = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        lin = yi_c * w + xi_c  # [B, Ho, Wo]
        flat = img.reshape(b, h * w, c)
        g = jnp.take_along_axis(
            flat, lin.reshape(b, -1, 1), axis=1
        ).reshape(lin.shape + (c,))
        return g * (wgt * ok.astype(img.dtype))[..., None]

    out = (
        corner(y0, x0, (1 - fy) * (1 - fx))
        + corner(y0, x0 + 1, (1 - fy) * fx)
        + corner(y0 + 1, x0, fy * (1 - fx))
        + corner(y0 + 1, x0 + 1, fy * fx)
    )
    return out
