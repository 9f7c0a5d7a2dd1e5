"""Fused Pallas 3x3x3 convolution (the 'pallas' dslice fold).

Dispatch status (round-5 adjudication of the on-chip A/Bs): this v1 kernel
WINS and is dispatched BY DEFAULT at exactly one production site — the
deform offset heads (ops/deform_conv3d.py DeformConvPack3D: 3*Co = 243
output channel groups make the XLA 'out' fold relayout-heavy; 2.49 vs
3.64 ms/conv, tools/bench_dslice_fold.py). At every hourglass/classifier
aggregation site it LOSES to the XLA 'out'/'taps' folds (the in-VMEM
9-slice im2col lane-concat is a VPU-copy floor at 32->32 channel widths),
so _DSliceConv3D does not offer it as a fold there. The v2 variant
(kw-lane-folded, in-kernel BN/relu epilogue) lost every full-chain A/B and
lives in tools/attic/conv3d_dslice_v2.py.

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
