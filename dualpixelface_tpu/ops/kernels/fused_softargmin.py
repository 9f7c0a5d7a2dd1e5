"""Fused trilinear-upsample + soft-argmin Pallas kernel.

The disparity regression stage (ref stereodpnet/modules.py:327-362)
trilinearly upsamples the aggregated cost volume x4 in (D, H, W) and takes a
softmax-expectation over the disparity axis. Done naively this materializes
TWO full-resolution volumes ([B, 4D, 4H, 4W] logits + probabilities — 64x the
coarse volume) in HBM just to produce an [B, 4H, 4W] disparity map.

This kernel reads the COARSE volume once and writes the disparity map
directly. The align-corners trilinear interpolation is separable, so inside
VMEM each output row-tile is three small matmuls against precomputed 1-D
interpolation operators (MXU work), then a softmax-expectation over the bin
axis (VPU) — nothing full-resolution ever touches HBM.

    out[b, y, x] = sum_d' softmax_d'( sum_{d,yy,xx} Wd[d',d] Wy[y,yy] Wx[x,xx]
                                      cost[b,d,yy,xx] ) * disp_values[d']

Grid: (B, H/tile). The coarse volume for one batch item ([D, h, w]) is a few
hundred KB — it sits in VMEM whole while the grid walks output row-tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualpixelface_tpu.ops.resize import _linear_matrix


def _kernel(cost_ref, wd_ref, wy_ref, wx_ref, dvals_ref, out_ref):
    """Mosaic-friendly formulation: only 2-D matmuls (lane dim stays W) and
    broadcast multiply-adds over the small coarse depth axis — no reshapes
    that merge dims into the lane axis."""
    d = cost_ref.shape[1]
    dp = wd_ref.shape[0]  # upsampled bin count
    t = wy_ref.shape[0]  # row tile
    wo = wx_ref.shape[1]  # full output width (wx is pre-transposed [w, W])

    wy = wy_ref[...]  # [T, h]
    wxT = wx_ref[...]  # [w, W]

    logits = jnp.zeros((dp, t, wo), jnp.float32)
    for di in range(d):  # D is small (8) and static
        t1 = jax.lax.dot_general(  # x-interp: [h, w] @ [w, W]
            cost_ref[0, di], wxT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t2 = jax.lax.dot_general(  # y-interp: [T, h] @ [h, W]
            wy, t1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # d-interp: accumulate wd[:, di] (x) t2 -> [D', T, W]
        logits = logits + wd_ref[:, di][:, None, None] * t2[None]

    # softmax-expectation over the bin axis
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=0)
    num = jnp.sum(e * dvals_ref[:, 0][:, None, None], axis=0)
    out_ref[0] = num / denom


@functools.partial(jax.jit, static_argnames=("factor", "row_tile"))
def fused_softargmin(
    cost: jnp.ndarray,
    disp_values,
    factor: int = 4,
    row_tile: int = 32,
) -> jnp.ndarray:
    """cost [B, D, h, w] -> disparity [B, factor*h, factor*w].

    Numerically equivalent to upsample3d_trilinear(align_corners=True)
    followed by soft_argmin (ops/cost_volume.py) — tested against that path.
    """
    b, d, h, w = cost.shape
    dp, hp, wp = d * factor, h * factor, w * factor
    n_tiles = hp // row_tile
    assert hp % row_tile == 0, f"output height {hp} not divisible by {row_tile}"

    wd = jnp.asarray(_linear_matrix(dp, d, True))
    wy = jnp.asarray(_linear_matrix(hp, h, True))
    wxT = jnp.asarray(_linear_matrix(wp, w, True)).T  # [w, W], lane dim = W
    dvals = jnp.asarray(disp_values, jnp.float32).reshape(dp, 1)

    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d, h, w), lambda bi, ti: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, d), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, h), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, 1), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, wp), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
    )

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (d * h * w * wp + d * wp * h * hp + d * dp * hp * wp),
            bytes_accessed=b * (d * h * w + hp * wp) * 4,
            transcendentals=b * dp * hp * wp,
        ),
    )(cost.astype(jnp.float32), wd, wy, wxT, dvals)
    return out.astype(cost.dtype)
