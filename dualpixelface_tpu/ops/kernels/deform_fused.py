"""Fused Pallas deformable-3D-conv kernel: one-hot-matmul sampling + in-kernel
contraction — the whole deform conv in a single pass over VMEM.

Reference anchor: the dcn3d CUDA im2col + GEMM
(`/root/reference/src/module/dcn3d/src/cuda/deform_im2col_cuda.cuh:193-265`,
`deform_conv_cuda.cu:93-125`).

Evolution (docs/PERFORMANCE.md, round 2):
  v1 emitted im2col columns to HBM (gather via `dynamic_gather`), XLA did the
     GEMM: dominated by table prep (21 ms) + ~16 GB column traffic per conv.
  v2 fused the GEMM in-kernel: traffic gone, but the trilinear hat-sum
     arithmetic made it VPU-bound (~65 ms/conv at the 768x576 ANM shape).
  v3 (this file) replaces the gather entirely: trilinear sampling of the
     window IS a sparse linear map, and its weights are a separable outer
     product of three 1-D hats,  S[(dp,dh,w), lane] = ad*ah*aw  with
     hat(t) = max(0, 1-|t|). One MXU dot per row h contracts the whole
     (plane, delta-h, w) candidate window — sampling, trilinear interpolation
     and D-boundary zeroing in one matmul; the VPU only builds the hats.
     No `dynamic_gather` (and none of its dtype/lane restrictions): the
     table is bf16 on the production path.

Layout:
  * positions are clamped to +-AP (=3) voxels around the output voxel along
    H and W (full extent along D) — the documented TPU-native windowed
    semantic; gradients flow via the XLA twin with the identical clamp.
  * sampling table per (b, w-block, h): lanes = cand = (d_pad planes x
    8 delta-h x 16-wide w window at stride 8) = 512, sublanes = channels.
  * (tap, d_out) pairs are TAP-MAJOR (p = tap*4 + dout) so output lanes
    (p, wo) put each tap in a contiguous 32-lane group: per-tap MXU dots
    (contracting channels over sublanes) accumulate 4 h rows into full
    128-voxel groups. Columns never leave VMEM; no in-kernel transpose.
  * grid = (B, nWB, H/HB): hundreds of blocks, hiding per-step overhead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AP = 3          # aperture: sampling clamped to +-AP voxels around the output
DH_ROWS = 8     # delta-h values per window: [-AP, AP+1]
WWIN = 16       # w window lanes per block: [wb*8 - (AP+1), wb*8 + 12)
WBLK = 8        # output columns per w-block
KTAPS = 27      # 3x3x3 taps
TAP_PAD = 28    # padded so (tap, dout) pairs = 28*4 = 112 lanes x 8 wo = 896
D_PAD = 4       # kernel supports D <= 4 (ANM uses D = 4)
CAND = D_PAD * DH_ROWS * WWIN  # 512 sampling candidates per (h, w-block)
NPL = TAP_PAD * D_PAD * WBLK   # 896 output pair-lanes per h row
HGRP = 4        # h rows whose voxels share one 128-lane dot group
EPS = 1.0 / 1024.0


def clamp_positions(pos, out_coord):
    """Shared aperture clamp (the XLA twin applies the same)."""
    return jnp.clip(pos, out_coord - AP, out_coord + AP + 1 - EPS)


def _hat(iota, pos):
    """[n, NPL] trilinear hat weights: max(0, 1 - |iota - pos|)."""
    return jnp.maximum(1.0 - jnp.abs(iota - pos), 0.0)


def _kernel(hb, cpad, cout, cdt, xw_ref, pos_ref, w_ref, out_ref, sb_ref):
    """xw_ref: [1, 1, 1, D_PAD, hb+7, WWIN, cpad]  w-windowed slab (cdt)
    pos_ref:  [1, 1, hb, 3, NPL]            (pd, ph_rel, pw_rel) f32
    w_ref:    [TAP_PAD, cpad, cout]         weights (cdt)
    out_ref:  [1, 1, hb//HGRP, 128, cout]   f32 voxel rows (h4, dout, wo)
    sb_ref:   [TAP_PAD, cpad, 128]          cdt scratch (per 4-row group)

    The sampling "table" [(dp, dh, w) = CAND rows, cpad] for each h is just
    32 static row-slices of the slab — no transposed table is materialized
    anywhere (v3's XLA-side table prep was ~25 ms of shuffle copies per
    forward): the dot contracts the CAND dim over the ROWS of both operands,
    so the MXU absorbs the transpose.

    cdt is the compute dtype: bf16 when the input was bf16 (production), f32
    when it was f32 (keeps the kernel comparable to the XLA twin in tests).
    """
    # Mosaic iota is integer-only
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    wo_l = (jax.lax.broadcasted_iota(jnp.int32, (1, NPL), 1) % WBLK).astype(
        jnp.float32
    )
    i_d = fiota((D_PAD, 1, 1, NPL), 0)
    i_h = fiota((1, DH_ROWS, 1, NPL), 1)
    i_w = fiota((1, 1, WWIN, NPL), 2)

    # fp32 path (oracle tests): force 3-pass matmuls — the TPU default dot
    # precision is one bf16 pass (~3e-3 rel), production bf16 keeps DEFAULT
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    for hg in range(hb // HGRP):
        for hs in range(HGRP):
            h = hg * HGRP + hs
            pd = pos_ref[0, 0, h, 0:1, :]
            ph = pos_ref[0, 0, h, 1:2, :] + AP          # in [0, 7)
            pw = pos_ref[0, 0, h, 2:3, :] + (AP + 1) + wo_l  # in [0, 16)

            # separable trilinear weights over the candidate window:
            # S3[(dp, dh, w), lane] = hat_d * hat_h * hat_w — the dot below
            # contracts them against the slab rows: gather + trilinear +
            # boundary zeroing in one MXU pass. Hats subtract in f32
            # (positions span [0,16): bf16 ulp there is 1/16) and multiply
            # in cdt.
            ad = _hat(i_d, pd).astype(cdt)    # [D_PAD, 1, 1, NPL]
            ah = _hat(i_h, ph).astype(cdt)    # [1, DH_ROWS, 1, NPL]
            aw = _hat(i_w, pw).astype(cdt)    # [1, 1, WWIN, NPL]
            s3 = (ad * (ah * aw)).reshape(CAND, NPL)

            # CAND rows of row h: slab rows (dp, h+dh, :) — static slices
            tsrc = jnp.concatenate(
                [
                    xw_ref[0, 0, 0, dp, h + dh]
                    for dp in range(D_PAD)
                    for dh in range(DH_ROWS)
                ],
                axis=0,
            )  # [CAND, cpad]

            cols = jax.lax.dot_general(
                tsrc,
                s3,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [cpad, NPL] — all taps/douts/wos of row h at once

            cb = cols.astype(cdt)
            # lane p*8+wo, p = tap*4 + dout: tap tau = lanes [32*tau, 32*tau+32)
            for tau in range(TAP_PAD):
                sb_ref[tau, :, hs * 32 : (hs + 1) * 32] = cb[
                    :, tau * 32 : (tau + 1) * 32
                ]

        # ONE dot over the flattened (tap, ch) axis — 27 separate K=cpad dots
        # are MXU-latency-bound; the scratch is already contiguous as
        # [TAP_PAD*cpad, 128] and the weights are packed to match
        out_ref[0, 0, hg] = jax.lax.dot_general(
            sb_ref[:, :, :].reshape(TAP_PAD * cpad, 128),
            w_ref[:, :, :].reshape(TAP_PAD * cpad, cout),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [128 voxels = (h4, dout, wo), cout]


def _prep_slab(x, cpad, dtype, hb):
    """x [B, D<=4, H, W, C] -> slab [B, nWB, nHB, D_PAD, hb+7, WWIN, cpad].

    Pure padding + slicing (w windows are a 2x duplication of contiguous
    8-blocks, h blocks carry a 7-row halo) with one MAJOR-dims-only
    transpose — the minor (WWIN, cpad) dims never move, so every copy runs
    at memcpy speed. v3 materialized a fully transposed [.., cpad, CAND]
    table instead: ~25 ms of shuffle copies per forward at the ANM shape.
    """
    b, d, h, w, c = x.shape
    hp = -(-h // hb) * hb
    nwb = -(-w // WBLK)
    nhb = hp // hb
    x = jnp.pad(
        x,
        (
            (0, 0),
            (0, D_PAD - d),
            (AP, hp - h + AP + 1),
            (AP + 1, nwb * WBLK - w + WWIN - WBLK - (AP + 1)),
            (0, cpad - c),
        ),
    ).astype(dtype)
    # w windows: nwb blocks of WBLK with WWIN-wide views = adjacent 8-blocks
    bw = x.reshape(b, D_PAD, hp + DH_ROWS - 1, nwb + 1, WBLK, cpad)
    xw = jnp.concatenate([bw[:, :, :, :-1], bw[:, :, :, 1:]], axis=4)
    # [B, D_PAD, Hp+7, nWB, WWIN, cpad]; h blocks with the 7-row halo
    xw = jnp.stack(
        [xw[:, :, i * hb : i * hb + hb + DH_ROWS - 1] for i in range(nhb)], axis=2
    )  # [B, D_PAD, nHB, hb+7, nWB, WWIN, cpad]
    return xw.transpose(0, 4, 2, 1, 3, 5, 6)


def _prep_positions(offset, d, hp):
    """offset [B, D, H, W, 3K] -> pos [B, nWB, Hp, 3, NPL].

    TAP-MAJOR pairs p = tap*D_PAD + dout; lanes = p*WBLK + wo%WBLK:
      pd     = d_out + kd - 1 + off_d           (absolute, unclamped)
      ph_rel = kh - 1 + off_h   clamped to [-AP, AP + 1 - EPS]
      pw_rel = kw - 1 + off_w   clamped likewise
    """
    b, do, ho, wo, _ = offset.shape
    kz, ky, kx = np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij")
    kd = jnp.asarray(kz.ravel(), jnp.float32) - 1.0  # [27]
    kh = jnp.asarray(ky.ravel(), jnp.float32) - 1.0
    kw = jnp.asarray(kx.ravel(), jnp.float32) - 1.0

    off = offset.reshape(b, do, ho, wo, KTAPS, 3).astype(jnp.float32)
    douts = jnp.arange(do, dtype=jnp.float32)

    pd = (douts[:, None] + kd[None, :])[None, :, None, None, :] + off[..., 0]
    ph = jnp.clip(kh[None, None, None, None, :] + off[..., 1], -AP, AP + 1 - EPS)
    pw = jnp.clip(kw[None, None, None, None, :] + off[..., 2], -AP, AP + 1 - EPS)

    pos = jnp.stack([pd, ph, pw], axis=-1)  # [B, Do, Ho, Wo, K, 3]
    # tap-major pairs [B, Ho, Wo, K, Do, 3] padded to [.., TAP_PAD, D_PAD, 3]
    pos = pos.transpose(0, 2, 3, 4, 1, 5)
    pos = jnp.pad(
        pos,
        ((0, 0), (0, hp - ho), (0, 0), (0, TAP_PAD - KTAPS), (0, D_PAD - do), (0, 0)),
    )
    nwb = -(-wo // WBLK)
    pos = jnp.pad(pos, ((0, 0), (0, 0), (0, nwb * WBLK - wo), (0, 0), (0, 0), (0, 0)))
    # [B, Hp, nWB, WBLK, 112p, 3] -> [B, nWB, Hp, 3, 112, WBLK]
    pos = pos.reshape(b, hp, nwb, WBLK, TAP_PAD * D_PAD, 3)
    pos = pos.transpose(0, 2, 1, 5, 4, 3)
    return pos.reshape(b, nwb, hp, 3, NPL)


@functools.partial(jax.jit, static_argnames=("interpret", "hb"))
def _fused_call(x, offset, wmat, hb, interpret=False):
    b, d, h, w, c = x.shape
    cpad = wmat.shape[1]
    cout = wmat.shape[2]
    cdt = wmat.dtype
    xw = _prep_slab(x, cpad, cdt, hb)
    nwb, nhb = xw.shape[1], xw.shape[2]
    hp = nhb * hb
    pos = _prep_positions(offset, d, hp)
    grid = (b, nwb, nhb)

    kernel = functools.partial(_kernel, hb, cpad, cout, cdt)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, D_PAD, hb + DH_ROWS - 1, WWIN, cpad),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hb, 3, NPL),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TAP_PAD, cpad, cout),
                lambda bi, wi, hi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb // HGRP, 128, cout),
            lambda bi, wi, hi: (bi, wi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nwb, hp // HGRP, 128, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TAP_PAD, cpad, 128), cdt)],
        interpret=interpret,
    )(xw, pos, wmat)

    # [B, nWB, Hp/4, (h4, dout, wo), cout] -> [B, D, H, W, cout]
    out = out.reshape(b, nwb, hp // HGRP, HGRP, D_PAD, WBLK, cout)
    out = out.transpose(0, 4, 2, 3, 1, 5, 6)  # [B, D_PAD, Hp/4, 4, nWB, 8, cout]
    out = out.reshape(b, D_PAD, hp, nwb * WBLK, cout)
    return out[:, :d, :h, :w]


def pack_weight_fused(weight, cpad, dtype):
    """[3,3,3,Cin,Cout] -> [TAP_PAD, cpad, Cout] tap-major zero-padded."""
    kd, kh, kw, c, cout = weight.shape
    wk = weight.reshape(KTAPS, c, cout)
    wk = jnp.pad(wk, ((0, TAP_PAD - KTAPS), (0, cpad - c), (0, 0)))
    return wk.astype(dtype)


def deform_conv3d_fused(x, offset, weight, bias=None, interpret=None):
    """Windowed deformable 3-D conv (stride 1, pad 1, 3x3x3), forward only;
    callers wrap with custom_vjp (ops/deform_conv3d.py).

    Compute follows the input dtype: bf16 inputs (production) use bf16 MXU
    dots (f32 accumulate); f32 inputs keep the kernel comparable to the XLA
    aperture twin for the oracle tests.

    :param x:      [B, D<=4, H, W, C]
    :param offset: [B, D, H, W, 81]
    :param weight: [3, 3, 3, C, Cout]
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d, h, w, c = x.shape
    assert d <= D_PAD, f"kernel supports D<={D_PAD}; got {d}"
    assert offset.shape == (b, d, h, w, 3 * KTAPS), offset.shape
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    cq = 16 if cdt == jnp.bfloat16 else 8  # sublane tile quantum
    cpad = -(-c // cq) * cq
    wmat = pack_weight_fused(weight, cpad, cdt)
    hp = -(-h // (2 * HGRP)) * (2 * HGRP)
    hb = 16 if hp % 16 == 0 else 2 * HGRP
    out = _fused_call(x, offset, wmat, hb=hb, interpret=interpret)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
