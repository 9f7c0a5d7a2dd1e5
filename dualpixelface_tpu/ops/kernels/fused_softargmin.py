"""Fused trilinear-upsample + soft-argmin Pallas kernel (fwd + custom VJP).

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

The D-axis operator Wd (and disp_values) are host-side numpy constants, so
the d-interpolation is emitted SPARSELY: each upsampled bin touches at most
two coarse planes — 2 scalar multiply-adds per bin instead of a dense
[D', T, W] broadcast per coarse plane.

Backward (custom_vjp, `_bwd_kernel`): with p = softmax(logits) and
out = sum p*dv, the cotangent into the logits is

    glogits[d', y, x] = g[y, x] * p[d', y, x] * (dv[d'] - out[y, x])

and grad_cost = U^T glogits for the same separable operator U — i.e. the
transposed 1-D matmuls, accumulated over row-tiles into the coarse volume.
The full-res probability volume again never leaves VMEM, so training gets
the same x64 HBM saving as serving (round-2 trained with the unfused XLA
regression precisely because this kernel had no VJP).

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


def _interp_tile(cost_ref, wy, wxT, d):
    """Per-coarse-plane (x then y) interpolation: d x [T, W] f32."""
    t2s = []
    for di in range(d):
        t1 = jax.lax.dot_general(  # x-interp: [h, w] @ [w, W]
            cost_ref[0, di], wxT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t2s.append(
            jax.lax.dot_general(  # y-interp: [T, h] @ [h, W]
                wy, t1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return t2s


def _d_interp(t2s, wd_np):
    """Sparse d-interp: logits [D', T, W] from <=2 scalar-weighted planes."""
    dp, d = wd_np.shape
    rows = []
    for dpi in range(dp):
        acc = None
        for di in range(d):
            c = float(wd_np[dpi, di])
            if c != 0.0:
                term = c * t2s[di] if c != 1.0 else t2s[di]
                acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def _softmax_stats(logits, dvals_np):
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=0)
    # scalar-weighted expectation (pallas_call forbids captured jnp
    # constants; python-float weights embed directly)
    num = None
    for dpi in range(len(dvals_np)):
        term = float(dvals_np[dpi]) * e[dpi]
        num = term if num is None else num + term
    return e, denom, num / denom


def _kernel(wd_np, dvals_np, cost_ref, wy_ref, wx_ref, out_ref):
    """Mosaic-friendly formulation: only 2-D matmuls (lane dim stays W) and
    scalar-weighted adds over the small coarse depth axis — no reshapes
    that merge dims into the lane axis."""
    d = cost_ref.shape[1]
    t2s = _interp_tile(cost_ref, wy_ref[...], wx_ref[...], d)
    logits = _d_interp(t2s, wd_np)
    _, _, out = _softmax_stats(logits, dvals_np)
    out_ref[0] = out


def _bwd_kernel(wd_np, dvals_np, cost_ref, wy_ref, wx_ref, g_ref, dcost_ref):
    """Recompute the tile's logits, form glogits, transpose-interpolate back
    into the coarse grad volume (accumulated across row-tiles)."""
    d = cost_ref.shape[1]
    dp = wd_np.shape[0]
    wy = wy_ref[...]   # [T, h]
    wxT = wx_ref[...]  # [w, W]

    t2s = _interp_tile(cost_ref, wy, wxT, d)
    logits = _d_interp(t2s, wd_np)
    e, denom, out = _softmax_stats(logits, dvals_np)

    ginv = g_ref[0] / denom  # [T, W]
    gls = []
    for dpi in range(dp):
        dv = float(dvals_np[dpi])
        gls.append(ginv * e[dpi] * (dv - out))

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dcost_ref[0] = jnp.zeros(dcost_ref.shape[1:], dcost_ref.dtype)

    for di in range(d):
        gd = None
        for dpi in range(dp):
            c = float(wd_np[dpi, di])
            if c != 0.0:
                term = c * gls[dpi] if c != 1.0 else gls[dpi]
                gd = term if gd is None else gd + term
        a = jax.lax.dot_general(  # y-transpose: [T, h]^T @ [T, W] -> [h, W]
            wy, gd,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b = jax.lax.dot_general(  # x-transpose: [h, W] @ [w, W]^T -> [h, w]
            a, wxT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dcost_ref[0, di] = dcost_ref[0, di] + b


def _operators(d, h, w, factor):
    dp, hp, wp = d * factor, h * factor, w * factor
    wd = _linear_matrix(dp, d, True)            # numpy [D', D]
    wy = jnp.asarray(_linear_matrix(hp, h, True))
    wxT = jnp.asarray(_linear_matrix(wp, w, True)).T  # [w, W], lane dim = W
    return wd, wy, wxT


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fsam(cost32, dvals_tuple, factor, row_tile):
    b, d, h, w = cost32.shape
    dp, hp, wp = d * factor, h * factor, w * factor
    n_tiles = hp // row_tile
    assert hp % row_tile == 0, f"output height {hp} not divisible by {row_tile}"
    wd, wy, wxT = _operators(d, h, w, factor)
    dvals_np = np.asarray(dvals_tuple, np.float32)

    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d, h, w), lambda bi, ti: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, h), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, wp), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
    )

    from dualpixelface_tpu.ops.target import tpu_lowering
    interpret = not tpu_lowering()
    return pl.pallas_call(
        functools.partial(_kernel, wd, dvals_np),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (d * h * w * wp + d * wp * h * hp + d * dp * hp * wp),
            bytes_accessed=b * (d * h * w + hp * wp) * 4,
            transcendentals=b * dp * hp * wp,
        ),
    )(cost32, wy, wxT)


def _fsam_fwd(cost32, dvals_tuple, factor, row_tile):
    return _fsam(cost32, dvals_tuple, factor, row_tile), cost32


def _fsam_bwd(dvals_tuple, factor, row_tile, cost32, g):
    b, d, h, w = cost32.shape
    dp, hp, wp = d * factor, h * factor, w * factor
    n_tiles = hp // row_tile
    wd, wy, wxT = _operators(d, h, w, factor)
    dvals_np = np.asarray(dvals_tuple, np.float32)

    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d, h, w), lambda bi, ti: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, h), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, wp), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        ],
        # accumulated across the inner (row-tile) grid axis
        out_specs=pl.BlockSpec(
            (1, d, h, w), lambda bi, ti: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    from dualpixelface_tpu.ops.target import tpu_lowering
    interpret = not tpu_lowering()
    dcost = pl.pallas_call(
        functools.partial(_bwd_kernel, wd, dvals_np),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (d * h * w * wp + d * wp * h * hp + d * dp * hp * wp),
            bytes_accessed=b * (2 * d * h * w + 2 * hp * wp) * 4,
            transcendentals=b * dp * hp * wp,
        ),
    )(cost32, wy, wxT, g.astype(jnp.float32))
    return (dcost,)


_fsam.defvjp(_fsam_fwd, _fsam_bwd)


def fused_softargmin(
    cost: jnp.ndarray,
    disp_values,
    factor: int = 4,
    row_tile: int = 32,
) -> jnp.ndarray:
    """cost [B, D, h, w] -> disparity [B, factor*h, factor*w].

    Numerically equivalent to upsample3d_trilinear(align_corners=True)
    followed by soft_argmin (ops/cost_volume.py) — tested against that path,
    forward AND grad (disp_values is a constant bin grid — a host-side numpy
    array, embedded statically; not differentiable).
    """
    dvals_tuple = tuple(float(v) for v in np.asarray(disp_values, np.float32))
    # (no jit wrapper: callers jit the enclosing program; disp_values must
    # stay concrete so the d-operator can be emitted sparsely)
    out = _fsam(cost.astype(jnp.float32), dvals_tuple, factor, row_tile)
    return out.astype(cost.dtype)
