"""Fused Pallas 3x3x3 convolution for the cost-volume aggregation path.

Why this exists (tools/aot_analyze.py, 768x576 HLO): the aggregation
tower's 22 ConvBN3D calls run as kd-folded 2-D convs (`_DSliceConv3D`), and
XLA layout assignment ping-pongs every conv's [B*D, H, W, 3*Co] output
through H-minor relayout copies to feed the D-shifted group-adds — ~72 ms
of compiler-estimated copy/add overhead against ~28 ms of actual conv
fusions. Every alternative XLA formulation loses (tools/aot_micro.py:
in/out2/kdsum/batch-group all 1.4-2.6x worse). This kernel does the whole
conv in one VMEM pass instead:

  * im2col built IN VMEM per input plane: 9 static (kh, kw) slices of the
    row block, lane-concatenated to [hb*Wo, 9C] — never materialized in HBM
    (reference CUDA materializes columns, deform_im2col_cuda.cuh:27-72);
  * ONE MXU dot per input plane: [hb*Wo, 9C] x [9C, 3*Co] — K-util 75-90%,
    N = 3*Co (the same MXU-shaped N the 2-D formulation had);
  * the kd "D-slice adds" become VMEM f32 accumulations into the output
    block: out[do] += y_di[:, kd-group], do = di - kd + 1 — no HBM
    round-trip, no layout copies, no group-slice relayout.

Scope: kernel 3x3x3, stride 1, padding 1, NDHWC, C and Co unrestricted
(lane-padded). Strided (2,2,2) convs keep the XLA path. Gradients flow
through the XLA `_DSliceConv3D` twin via custom_vjp (identical math), so
training is unchanged; this kernel is the serving/forward path.

Cites: /root/reference/src/module/asm/basics.py convbn_3d (what ConvBN3D
implements); /root/reference/src/model/stereodpnet/modules.py:203-337 (the
hourglass consumer).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(db, hb, wo, c, co, cdt, stride, x_ref, w_ref, out_ref, acc_ref):
    """x_ref:   [1, nD, nH, Wp, c]  pre-padded input block (cdt), where
               stride 1: nD = db+2,    nH = hb+2,    Wp = wo+2
               stride 2: nD = 2*db+1,  nH = 2*hb+2,  Wp = 2*wo+2
    w_ref:   [9*c, 3*co]           (kh, kw, c) x (kd, co) weights (cdt)
    out_ref: [1, db, hb, wo, co]   output block (cdt)
    acc_ref: [db, hb * wo, co]     f32 scratch accumulator

    Stride 2 reads each (kh, kw) tap via offset slice + parity extraction
    (reshape-split + take): Mosaic's strided loads are 32-bit-only, but the
    split form lowers for bf16.
    """
    acc_ref[...] = jnp.zeros_like(acc_ref)
    n_di = db + 2 if stride == 1 else 2 * db + 1

    for di in range(n_di):
        # im2col for this input plane: 9 static slices, lanes = (kh, kw, c)
        def piece(kh, kw):
            if stride == 1:
                return x_ref[0, di, kh : kh + hb, kw : kw + wo, :]
            p = x_ref[0, di, kh : kh + 2 * hb, :, :]       # [2hb, Wp, c]
            p = p.reshape(hb, 2, p.shape[1], c)[:, 0]      # H parity
            p = p[:, kw : kw + 2 * wo, :]
            return p.reshape(hb, wo, 2, c)[:, :, 0]        # W parity

        cols = jnp.concatenate(
            [
                piece(kh, kw).reshape(hb * wo, c)
                for kh in range(3)
                for kw in range(3)
            ],
            axis=1,
        )  # [hb*wo, 9c]

        y = jax.lax.dot_general(
            cols,
            w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if cdt == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )  # [hb*wo, 3co] f32

        # out[do] += y[:, kd group], do*stride + kd = di (pre-padded D: the
        # -1 offset is absorbed by the pad plane at di = 0)
        for kd in range(3):
            if (di - kd) % stride:
                continue
            do = (di - kd) // stride
            if 0 <= do < db:
                acc_ref[do] = acc_ref[do] + y[:, kd * co : (kd + 1) * co]

    out_ref[0] = acc_ref[...].reshape(db, hb, wo, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "db", "hb", "stride"))
def _conv3d_call(x, wmat, db=4, hb=8, stride=1, interpret=False):
    """x [B, D, H, W, C] -> [B, Do, Ho, Wo, Co]; wmat [3, 3, 3, C, Co].
    stride 1 or 2 (uniform over D/H/W, pad 1 — the repo's two call shapes)."""
    assert stride in (1, 2), stride
    b, d, h, w, c = x.shape
    co = wmat.shape[-1]
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    do_t = (d - 1) // stride + 1
    ho_t = (h - 1) // stride + 1
    wo = (w - 1) // stride + 1
    db = min(db, do_t)
    dp = -(-do_t // db) * db
    hp = -(-ho_t // hb) * hb
    # input windows per block (pre-padded coords, +1 halo):
    #   stride 1: planes [i*db, i*db + db+2), rows [j*hb, j*hb + hb+2)
    #   stride 2: planes [i*2db, i*2db + 2db+1), rows [j*2hb, j*2hb + 2hb+2)
    nD = db + 2 if stride == 1 else 2 * db + 1
    nH = hb + 2 if stride == 1 else 2 * hb + 2
    need_d = (dp - 1) * stride + 3  # max padded-D index any block touches
    need_h = (hp - 1) * stride + 3 if stride == 1 else hp // hb * 2 * hb + 2
    need_h = max(need_h, (hp - 1) * stride + 3)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, max(1, need_d - (d + 1))),
            (1, max(1, need_h - (h + 1))),
            (1, 1 if stride == 1 else 1 + (2 * wo + 2 - (w + 2))),
            (0, 0),
        ),
    ).astype(cdt)

    # weights: [3kd, 3kh, 3kw, C, Co] -> [(kh, kw, c), (kd, co)]
    w2 = wmat.transpose(1, 2, 3, 0, 4).reshape(9 * c, 3 * co).astype(cdt)

    grid = (b, dp // db, hp // hb)
    wp = xp.shape[3]
    out = pl.pallas_call(
        functools.partial(_kernel, db, hb, wo, c, co, cdt, stride),
        out_shape=jax.ShapeDtypeStruct((b, dp, hp, wo, co), cdt),
        grid=grid,
        in_specs=[
            # halo'd D/H windows: Element dims take ELEMENT offsets from the
            # index map, so consecutive blocks overlap by the halo without
            # materializing a stacked slab in HBM
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(nD),
                    pl.Element(nH),
                    pl.Element(wp),
                    pl.Element(c),
                ),
                lambda bi, di, hi: (bi, di * db * stride, hi * hb * stride, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9 * c, 3 * co), lambda bi, di, hi: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, db, hb, wo, co),
            lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((db, hb * wo, co), jnp.float32)],
        interpret=interpret,
    )(xp, w2)
    return out[:, :do_t, :ho_t]


# ---------------------------------------------------------------------------
# v2: kw taps pre-folded into lanes (XLA-side shifted-copy concat, memcpy
# speed) so the kernel never builds im2col in VMEM. The v1 kernel's in-VMEM
# 9-slice lane-concat is a measured VPU-copy floor (~5.2 ms at the hourglass
# 32->32 shape vs ~0.4 ms of MXU work); here each input plane is 3 clean
# dots [hb*wo, 3c] x [3c, 3co] (one per kh tap, f32-accumulated), with the
# kd D-slice accumulation unchanged.
# ---------------------------------------------------------------------------


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


def conv3d_dslice_reference(x, wmat, stride=1):
    """XLA twin (the `_DSliceConv3D` out-fold math)."""
    b, d, h, w, c = x.shape
    co = wmat.shape[-1]
    do = (d + 2 - 3) // stride + 1
    k2 = wmat.transpose(1, 2, 3, 0, 4).reshape(3, 3, c, 3 * co)
    y = jax.lax.conv_general_dilated(
        x.reshape(b * d, h, w, c),
        k2.astype(x.dtype),
        (stride, stride),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, d, ho, wo, 3, co)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    out = yp[:, 0 : (do - 1) * stride + 1 : stride, :, :, 0]
    for kd in (1, 2):
        out = out + yp[:, kd : kd + (do - 1) * stride + 1 : stride, :, :, kd]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_dslice_pallas(x, wmat, stride=1):
    """Fused Pallas 3x3x3/p1 conv (stride 1 or 2); gradients via the XLA
    twin."""
    from dualpixelface_tpu.ops.target import tpu_lowering

    if not tpu_lowering():
        return conv3d_dslice_reference(x, wmat, stride)
    return _conv3d_call(x, wmat, stride=stride)


def _fwd(x, wmat, stride):
    return conv3d_dslice_pallas(x, wmat, stride), (x, wmat)


def _bwd(stride, res, g):
    x, wmat = res
    _, vjp = jax.vjp(lambda x_, w_: conv3d_dslice_reference(x_, w_, stride), x, wmat)
    return vjp(g)


conv3d_dslice_pallas.defvjp(_fwd, _bwd)
