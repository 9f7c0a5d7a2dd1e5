"""[ATTIC - documented negative result, not dispatched by the package]

conv3d_dslice v2: the kw-lane-folded fused Pallas 3x3x3 conv with an
optional in-kernel affine(+relu) epilogue. Interpret-verified and ran on
chip, but LOST every full-chain on-chip A/B to the XLA 'out'/'taps' folds
at the hourglass sites (docs/PERFORMANCE.md round 4: the custom call breaks
XLA's BN/relu fusion and the surrounding relayouts dominate even with the
in-kernel epilogue). Demoted from dualpixelface_tpu/ops/kernels in round 5;
the v1 kernel STAYS in the package - it wins and is dispatched by default
at the deform offset-head site (ops/deform_conv3d.py, 3*Co = 243 channel
groups: 2.49 vs 3.64 ms/conv). Tests load this file by path
(tests/test_blocks.py::_attic_dslice).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualpixelface_tpu.ops.kernels.conv3d_dslice import conv3d_dslice_reference


def _kernel_v2(db, hb, wo, c3, co, cdt, has_ab, relu,
               x_ref, w_ref, ab_ref, out_ref, acc_ref):
    """x_ref:   [1, db+2, hb+2, wo, 3c]  kw-folded pre-padded block (cdt)
    w_ref:   [3, 3c, 3co]             per-kh weights (cdt), rows (kw, c)
    ab_ref:  [2, co] f32              fused affine epilogue (a, b) — the
                                      EVAL-mode BatchNorm folded to a*y+b,
                                      applied in the f32 accumulator; relu
                                      optionally follows (XLA cannot fuse
                                      elementwise ops into a custom call,
                                      so without this every conv pays a
                                      separate BN/relu HBM pass)
    out_ref: [1, db, hb, wo, co]
    acc_ref: [db, hb * wo, co] f32
    """
    acc_ref[...] = jnp.zeros_like(acc_ref)
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    for di in range(db + 2):
        y = jnp.zeros((hb * wo, 3 * co), jnp.float32)
        for kh in range(3):
            piece = x_ref[0, di, kh : kh + hb, :, :].reshape(hb * wo, c3)
            y = y + jax.lax.dot_general(
                piece, w_ref[kh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        for kd in range(3):
            do = di - kd
            if 0 <= do < db:
                acc_ref[do] = acc_ref[do] + y[:, kd * co : (kd + 1) * co]
    out = acc_ref[...]
    if has_ab:
        out = out * ab_ref[0:1, :].reshape(1, 1, co) + ab_ref[1:2, :].reshape(1, 1, co)
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(db, hb, wo, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "db", "hb", "relu"))
def _conv3d_call_v2(x, wmat, ab=None, relu=False, db=4, hb=8, interpret=False):
    """x [B, D, H, W, C] -> [B, D, H, W, Co]; wmat [3, 3, 3, C, Co].
    Stride 1 / pad 1 only (the hourglass stride-1 sites). ab: optional
    [2, Co] f32 per-channel affine epilogue, relu applied after."""
    b, d, h, w, c = x.shape
    co = wmat.shape[-1]
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    has_ab = ab is not None
    if ab is None:
        ab = jnp.zeros((2, co), jnp.float32)

    db = min(db, d)
    dp = -(-d // db) * db
    hp = -(-h // hb) * hb
    # pad: 1 halo voxel + block-rounding remainders (D/H), 1 on W for the
    # kw fold below
    xp = jnp.pad(
        x,
        ((0, 0), (1, 1 + dp - d), (1, 1 + hp - h), (1, 1), (0, 0)),
    ).astype(cdt)
    # kw -> lanes: [B, Dp+2, Hp+2, W, 3c], lane order (kw, c); XLA lowers the
    # three shifted copies as contiguous-minor-dim concats (memcpy speed)
    xkw = jnp.concatenate([xp[:, :, :, kw : kw + w, :] for kw in range(3)], axis=-1)

    # weights [3kd, 3kh, 3kw, C, Co] -> [kh, (kw, c), (kd, co)]
    w2 = wmat.transpose(1, 2, 3, 0, 4).reshape(3, 3 * c, 3 * co).astype(cdt)

    grid = (b, dp // db, hp // hb)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, db, hb, w, 3 * c, co, cdt, has_ab, relu),
        out_shape=jax.ShapeDtypeStruct((b, dp, hp, w, co), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(db + 2),
                    pl.Element(hb + 2),
                    pl.Element(w),
                    pl.Element(3 * c),
                ),
                lambda bi, di, hi: (bi, di * db, hi * hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * c, 3 * co), lambda bi, di, hi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, co), lambda bi, di, hi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, db, hb, w, co),
            lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((db, hb * w, co), jnp.float32)],
        interpret=interpret,
    )(xkw, w2, ab)
    return out[:, :d, :h]


def _v2_twin(x, wmat, ab, relu):
    """XLA math of conv3d_dslice_v2 incl. the fused epilogue."""
    y = conv3d_dslice_reference(x, wmat, 1)
    if ab is not None:
        y = (y.astype(jnp.float32) * ab[0] + ab[1]).astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_dslice_v2(x, wmat, ab=None, relu=False):
    """kw-lane-folded fused Pallas 3x3x3/s1/p1 conv with optional per-channel
    affine (+relu) epilogue; gradients via the XLA twin (identical math)."""
    from dualpixelface_tpu.ops.target import tpu_lowering

    if not tpu_lowering():
        return _v2_twin(x, wmat, ab, relu)
    return _conv3d_call_v2(x, wmat, ab, relu=relu)


def _fwd_v2(x, wmat, ab, relu):
    return conv3d_dslice_v2(x, wmat, ab, relu), (x, wmat, ab)


def _bwd_v2(relu, res, g):
    x, wmat, ab = res
    if ab is None:
        _, vjp = jax.vjp(lambda x_, w_: _v2_twin(x_, w_, None, relu), x, wmat)
        return (*vjp(g), None)
    _, vjp = jax.vjp(lambda x_, w_, ab_: _v2_twin(x_, w_, ab_, relu), x, wmat, ab)
    return vjp(g)


conv3d_dslice_v2.defvjp(_fwd_v2, _bwd_v2)
