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
import os

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
NPL = TAP_PAD * D_PAD * WBLK   # 896 output pair-lanes per h row
HGRP = 4        # h rows whose voxels share one 128-lane dot group
EPS = 1.0 / 1024.0


def _tsrc_rows(xw_ref, h):
    """The (dh, w) candidate rows for output row h: DH_ROWS consecutive slab
    rows flattened to [DH_ROWS*WWIN, D_PAD*cpad].

    DPFACE_DEFORM_TSRC=concat keeps the original 8-slice lane-concat for
    on-chip A/B; the default contiguous slice + leading-dim merge is
    layout-free when WWIN (16) matches the bf16 sublane tile."""
    import os

    m = xw_ref.shape[-1]
    if os.environ.get("DPFACE_DEFORM_TSRC", "slice") == "concat":
        return jnp.concatenate(
            [xw_ref[0, 0, 0, h + dh] for dh in range(DH_ROWS)], axis=0
        )
    return xw_ref[0, 0, 0, h : h + DH_ROWS].reshape(DH_ROWS * WWIN, m)


def clamp_positions(pos, out_coord):
    """Shared aperture clamp (the XLA twin applies the same)."""
    return jnp.clip(pos, out_coord - AP, out_coord + AP + 1 - EPS)


def _hat(iota, pos):
    """[n, NPL] trilinear hat weights: max(0, 1 - |iota - pos|)."""
    return jnp.maximum(1.0 - jnp.abs(iota - pos), 0.0)


def _probe_mode():
    """TIMING-ONLY diagnostics (tools/bench_deform_kernel.py --probe):
    'noscratch' skips the 28-slice scratch rearrangement, 'nohat' replaces
    the trilinear hat build with a constant, 'nodreduce' skips the D-plane
    reduction. Each produces WRONG numerics by construction — they exist to
    attribute the kernel's ms to its VPU components on chip. Never set in
    production; read at trace time."""
    import os

    return os.environ.get("DPFACE_DEFORM_PROBE", "")


def _kernel(hb, cpad, cout, cdt, xw_ref, pos_ref, w_ref, out_ref, sb_ref):
    """xw_ref: [1, 1, 1, hb+7, WWIN, D_PAD*cpad]  w-windowed slab (cdt)
    pos_ref:  [1, 1, hb, 3, NPL]            (pd, ph_rel, pw_rel) f32
    w_ref:    [TAP_PAD, cpad, cout]         weights (cdt)
    out_ref:  [1, 1, hb//HGRP, 128, cout]   cdt voxel rows (h4, dout, wo)
    sb_ref:   [TAP_PAD, cpad, 128]          cdt scratch (per 4-row group)

    The sampling "table" [(dh, w) = 128 rows, D_PAD*cpad] for each h is just
    8 static row-slices of the slab — no transposed table is materialized
    anywhere (v3's XLA-side table prep was ~25 ms of shuffle copies per
    forward): the dot contracts the (dh, w) dim over the ROWS of both
    operands, so the MXU absorbs the transpose.

    v5 (round 3): the D planes ride the slab's LANE dim — the sampling dot's
    M dim grows cpad -> D_PAD*cpad (48 -> 192 at the ANM shape, 37% -> 75%
    MXU row utilization at identical MACs, K = dh*w = exactly 128) and the
    separable D-hat is applied afterwards as a cheap lane-local reduction
    (D_PAD*cpad*NPL VPU madds) instead of inflating the candidate space 4x.

    cdt is the compute dtype: bf16 when the input was bf16 (production), f32
    when it was f32 (keeps the kernel comparable to the XLA twin in tests).
    """
    # Mosaic iota is integer-only
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    wo_l = (jax.lax.broadcasted_iota(jnp.int32, (1, NPL), 1) % WBLK).astype(
        jnp.float32
    )
    i_d = fiota((D_PAD, 1, NPL), 0)
    i_h = fiota((1, DH_ROWS, 1, NPL), 1)
    i_w = fiota((1, 1, WWIN, NPL), 2)

    probe = _probe_mode()

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

            # separable trilinear weights over the (dh, w) window:
            # S2[(dh, w), lane] = hat_h * hat_w — the dot below contracts
            # them against the slab rows: gather + H/W interpolation +
            # boundary zeroing in one MXU pass; the D hat follows on the
            # VPU. Hats subtract in f32 (positions span [0,16): bf16 ulp
            # there is 1/16) and multiply in cdt.
            ad = _hat(i_d, pd)                # [D_PAD, 1, NPL] f32
            if probe == "nohat":
                s2 = jnp.full((DH_ROWS * WWIN, NPL), 0.5, cdt)
            else:
                ah = _hat(i_h, ph).astype(cdt)    # [1, DH_ROWS, 1, NPL]
                aw = _hat(i_w, pw).astype(cdt)    # [1, 1, WWIN, NPL]
                s2 = (ah * aw).reshape(DH_ROWS * WWIN, NPL)

            # (dh, w) rows of row h: slab rows (h+dh, :) — static slices
            tsrc = _tsrc_rows(xw_ref, h)  # [DH_ROWS*WWIN, D_PAD*cpad]

            cols4 = jax.lax.dot_general(
                tsrc,
                s2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(D_PAD, cpad, NPL)  # per-plane partial columns, f32

            # D hat: lane-local contraction over the 4 planes
            if probe == "nodreduce":
                cols = cols4[0]
            else:
                cols = jnp.sum(cols4 * ad, axis=0)  # [cpad, NPL] f32

            cb = cols.astype(cdt)
            if probe == "noscratch":
                sb_ref[0, :, :] = cb[:, :128]
            else:
                # lane p*8+wo, p = tap*4 + dout: tap tau = lanes
                # [32*tau, 32*tau+32)
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
        ).astype(cdt)  # [128 voxels = (h4, dout, wo), cout]; f32 accumulate,
        # emit compute dtype: the caller casts to x.dtype right after the
        # unpack anyway, and a cdt output halves the unpack-transpose copy
        # traffic (2 x 113 MB f32 per ANM conv at 768x576, aot_analyze)


def _kernel_v6(hb, cpad, cout, cdt, xw_ref, pos_ref, w_ref, out_ref, sb_ref):
    """v6 (round 5): per-TAP sampling dots over the 4-row candidate union.

    xw_ref: [1, 1, 1, hb+7, WWIN, D_PAD*cpad]   w-windowed slab (cdt)
    pos_ref: [1, 1, hb//HGRP, 3, TAP_PAD, 128]  (pd, ph_rel, pw_rel) f32,
             lanes = (hs, dout, wo) — the OUTPUT voxel order
    w_ref:   [TAP_PAD, cpad, cout]
    out_ref: [1, 1, hb//HGRP, 128, cout]
    sb_ref:  [TAP_PAD, cpad, 128] scratch (cdt)

    v5 processed one output row per step with pair-lanes (tap, dout, wo),
    then spent 28 lane-group moves per row rearranging the columns into the
    [TAP_PAD*cpad, 128] layout the output dot wants — measured at ~6 of the
    kernel's ~14 ms/conv (DPFACE_DEFORM_PROBE=noscratch, 8.07 ms with the
    moves deleted). Here each tap's dot contracts the whole 4-row candidate
    union ((HGRP+DH_ROWS-1) x WWIN = 176 rows) against hats laid out
    directly in the output voxel order, so each result IS sb[tap] — zero
    rearrangement. Costs ~33% more sampling MACs (the 4-row union is wider
    than one row's window); the probe says the trade is strongly net-positive.

    ON-CHIP RESULT (round 5, same-session A/B): v6 LOSES — 20.75 vs v5's
    14.06 ms/conv at the ANM 768x576 shape. 27 narrow per-tap dots per
    group are MXU-latency-bound; the wide-union extra MACs compound it.
    Kept behind DPFACE_DEFORM_KV as a documented negative result (the
    noscratch probe's 8.07 ms floor is real, but reaching it needs few,
    WIDE dots whose results land scratch-aligned — not more small dots).
    """
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    nl = HGRP * D_PAD * WBLK  # 128 output voxel lanes per group
    crow = HGRP + DH_ROWS - 1  # candidate rows per group window
    hs_l = (jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1) // (D_PAD * WBLK)).astype(
        jnp.float32
    )
    wo_l = (jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1) % WBLK).astype(jnp.float32)
    i_d = fiota((D_PAD, 1, nl), 0)
    i_r = fiota((1, crow, 1, nl), 1)
    i_w = fiota((1, 1, WWIN, nl), 2)

    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    @pl.when(pl.program_id(2) == 0)
    def _zero_pad_taps():
        # the TAP_PAD-KTAPS pad taps never get written below
        for tau in range(KTAPS, TAP_PAD):
            sb_ref[tau, :, :] = jnp.zeros((cpad, 128), cdt)

    for hg in range(hb // HGRP):
        tsrc4 = xw_ref[0, 0, 0, hg * HGRP : hg * HGRP + crow].reshape(
            crow * WWIN, xw_ref.shape[-1]
        )
        for tau in range(KTAPS):
            pd = pos_ref[0, 0, hg, 0, tau][None, :]               # [1, nl]
            # candidate row r (window-local) holds source row base+r;
            # output row hs samples ph_rel + AP around itself
            ph = pos_ref[0, 0, hg, 1, tau][None, :] + AP + hs_l
            pw = pos_ref[0, 0, hg, 2, tau][None, :] + (AP + 1) + wo_l

            ah = _hat(i_r, ph).astype(cdt)   # [1, crow, 1, nl]
            aw = _hat(i_w, pw).astype(cdt)   # [1, 1, WWIN, nl]
            s2 = (ah * aw).reshape(crow * WWIN, nl)

            cols4 = jax.lax.dot_general(
                tsrc4, s2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(D_PAD, cpad, nl)
            ad = _hat(i_d, pd)               # [D_PAD, 1, nl] f32
            sb_ref[tau, :, :] = jnp.sum(cols4 * ad, axis=0).astype(cdt)

        out_ref[0, 0, hg] = jax.lax.dot_general(
            sb_ref[:, :, :].reshape(TAP_PAD * cpad, 128),
            w_ref[:, :, :].reshape(TAP_PAD * cpad, cout),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(cdt)


TGRP = 7   # v7: taps per union dot (TAP_PAD = 4 groups of 7)


def _kernel_v7(hb, cpad, cout, cdt, xw_ref, pos_ref, w_ref, out_ref, sb_ref):
    """v7 (round 5): TGRP-tap union dots with lanes (tap_member, hs, dout, wo).

    xw_ref:  [1, 1, 1, hb+7, WWIN, D_PAD*cpad]       w-windowed slab (cdt)
    pos_ref: [1, 1, hb//HGRP, 3, TAP_PAD//TGRP, TGRP*128]  f32
    w_ref:   [TAP_PAD, cpad, cout]
    out_ref: [1, 1, hb//HGRP, 128, cout]
    sb_ref:  [TAP_PAD, cpad, 128] scratch (cdt)

    The middle ground between v5 and v6: like v6, hats are laid out in the
    OUTPUT voxel order over the 4-row candidate union (crow x WWIN = 176
    rows, +37.5% sampling MACs vs v5's per-row window), so each tap's
    [cpad, 128] result block lands scratch-ready; unlike v6 (27 narrow
    N=128 dots per group — latency-bound, lost 20.75 vs 14.06), each dot
    carries TGRP=7 taps on 896 lanes — v5's dot width at 1/4 the count.
    Scratch rearrangement: 28 full-width aligned [cpad, 128] copies per
    group vs v5's 112 masked quarter-width lane-group moves (measured at
    ~6 of v5's ~14 ms/conv: DPFACE_DEFORM_PROBE=noscratch, 8.07 ms).

    ON-CHIP RESULT (round 5, same-session A/B vs v5's 14.14): v7 LOSES —
    21.09 ms/conv at the ANM 768x576 shape, within noise of v6's 20.75.
    Conclusion across v6+v7: output-voxel-order hats over the 11-row
    candidate union are the real cost, not the dot count — the hat
    evaluation (VPU elementwise over crow x WWIN x 896 lanes per tap
    group, 7x wider than v5's per-row window) plus the +37.5% union MACs
    eat the ~6 ms of moves they delete. Reaching the 8.07 ms noscratch
    floor needs a formulation that keeps v5's narrow per-row hat windows
    AND lands results scratch-aligned; none found in rounds 4-5. v5 stays
    the default; v6/v7 kept behind DPFACE_DEFORM_KV as documented negative
    results (both remain EXACT — pinned by test_deform_fused.py).
    """
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    ng = TAP_PAD // TGRP
    nl = TGRP * HGRP * D_PAD * WBLK  # 896 lanes: (tap_member, hs, dout, wo)
    crow = HGRP + DH_ROWS - 1        # 11 candidate rows per group union
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1)
    hs_l = ((lane % 128) // (D_PAD * WBLK)).astype(jnp.float32)
    wo_l = (lane % WBLK).astype(jnp.float32)
    i_d = fiota((D_PAD, 1, nl), 0)
    i_r = fiota((1, crow, 1, nl), 1)
    i_w = fiota((1, 1, WWIN, nl), 2)

    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    for hg in range(hb // HGRP):
        tsrc4 = xw_ref[0, 0, 0, hg * HGRP : hg * HGRP + crow].reshape(
            crow * WWIN, xw_ref.shape[-1]
        )
        for g in range(ng):
            pd = pos_ref[0, 0, hg, 0, g][None, :]                 # [1, nl]
            ph = pos_ref[0, 0, hg, 1, g][None, :] + AP + hs_l
            pw = pos_ref[0, 0, hg, 2, g][None, :] + (AP + 1) + wo_l

            ah = _hat(i_r, ph).astype(cdt)   # [1, crow, 1, nl]
            aw = _hat(i_w, pw).astype(cdt)   # [1, 1, WWIN, nl]
            s2 = (ah * aw).reshape(crow * WWIN, nl)

            cols4 = jax.lax.dot_general(
                tsrc4, s2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(D_PAD, cpad, nl)
            ad = _hat(i_d, pd)               # [D_PAD, 1, nl] f32
            cb = jnp.sum(cols4 * ad, axis=0).astype(cdt)  # [cpad, nl]
            for t in range(TGRP):
                sb_ref[g * TGRP + t, :, :] = cb[:, t * 128 : (t + 1) * 128]

        out_ref[0, 0, hg] = jax.lax.dot_general(
            sb_ref[:, :, :].reshape(TAP_PAD * cpad, 128),
            w_ref[:, :, :].reshape(TAP_PAD * cpad, cout),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(cdt)


def _prep_positions_v7(offset, d, hp):
    """v6's output-voxel-order positions regrouped for TGRP-tap dots:
    [B, nWB, Hp//HGRP, 3, TAP_PAD//TGRP, TGRP*128], lane = tap_member*128
    + hs*32 + dout*8 + wo."""
    pos = _prep_positions_v6(offset, d, hp)
    b, nwb, nhg = pos.shape[:3]
    return pos.reshape(b, nwb, nhg, 3, TAP_PAD // TGRP, TGRP * 128)


def _prep_positions_v6(offset, d, hp):
    """offset [B, D, H, W, 3K] -> pos [B, nWB, Hp//HGRP, 3, TAP_PAD, 128]
    with lanes in the OUTPUT voxel order (hs, dout, wo) — the v6 kernel's
    per-tap layout. Same arithmetic/clamps as _prep_positions."""
    b, do, ho, wo, _ = offset.shape
    kz, ky, kx = np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij")
    kd = jnp.asarray(kz.ravel(), jnp.float32) - 1.0
    kh = jnp.asarray(ky.ravel(), jnp.float32) - 1.0
    kw = jnp.asarray(kx.ravel(), jnp.float32) - 1.0

    off = offset.reshape(b, do, ho, wo, KTAPS, 3).astype(jnp.float32)
    douts = jnp.arange(do, dtype=jnp.float32)

    pd = (douts[:, None] + kd[None, :])[None, :, None, None, :] + off[..., 0]
    ph = jnp.clip(kh[None, None, None, None, :] + off[..., 1], -AP, AP + 1 - EPS)
    pw = jnp.clip(kw[None, None, None, None, :] + off[..., 2], -AP, AP + 1 - EPS)

    pos = jnp.stack([pd, ph, pw], axis=-1)  # [B, Do, Ho, Wo, K, 3]
    nwb = -(-wo // WBLK)
    pos = jnp.pad(
        pos,
        ((0, 0), (0, D_PAD - do), (0, hp - ho), (0, nwb * WBLK - wo),
         (0, TAP_PAD - KTAPS), (0, 0)),
    )
    pos = pos.reshape(b, D_PAD, hp // HGRP, HGRP, nwb, WBLK, TAP_PAD, 3)
    # -> [B, nWB, Hp/HGRP, 3, TAP_PAD, (hs, dout, wo)]
    pos = pos.transpose(0, 4, 2, 7, 6, 3, 1, 5)
    return pos.reshape(b, nwb, hp // HGRP, 3, TAP_PAD, HGRP * D_PAD * WBLK)


def _prep_slab(x, cpad, dtype, hb):
    """x [B, D<=4, H, W, C] -> slab [B, nWB, nHB, hb+7, WWIN, D_PAD*cpad].

    Pure padding + slicing (w windows are a 2x duplication of contiguous
    8-blocks, h blocks carry a 7-row halo) around ONE lane-folding
    relayout (D moves next to C so the planes ride the lane dim — what buys
    the kernel its M = D_PAD*cpad dot, see _kernel). v3 materialized a fully
    transposed [.., cpad, CAND] table instead: ~25 ms of shuffle copies per
    forward at the ANM shape.
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
    # fold the D planes into lanes: [B, Hp+7, Wp, D_PAD*cpad]
    x = x.transpose(0, 2, 3, 1, 4).reshape(
        b, hp + DH_ROWS - 1, x.shape[3], D_PAD * cpad
    )
    # w windows: nwb blocks of WBLK with WWIN-wide views = adjacent 8-blocks
    bw = x.reshape(b, hp + DH_ROWS - 1, nwb + 1, WBLK, D_PAD * cpad)
    xw = jnp.concatenate([bw[:, :, :-1], bw[:, :, 1:]], axis=3)
    # [B, Hp+7, nWB, WWIN, D_PAD*cpad]; h blocks with the 7-row halo
    xw = jnp.stack(
        [xw[:, i * hb : i * hb + hb + DH_ROWS - 1] for i in range(nhb)], axis=1
    )  # [B, nHB, hb+7, nWB, WWIN, D_PAD*cpad]
    return xw.transpose(0, 3, 1, 2, 4, 5)


def _prep_positions_late(offset, d, hp):
    """Bit-identical output to `_prep_positions`, but the tap/dout base
    arithmetic and the aperture clamp run AFTER the (D, W, tap) -> lane
    shuffle, in the kernel's target layout. The stacked variant materializes
    ~3 x 0.6 ms of f32 copies per ANM conv at 768x576 (a layout flip of the
    arithmetic'd stack, the staged shuffle, and a tiling copy — profiler,
    docs/PERFORMANCE.md round 5); shuffling the RAW offsets first lets XLA
    fuse the elementwise base-add + clip into the shuffle's last stage.
    Base integers (douts + kd) are exact in f32, so values match the
    stacked order bit-for-bit and the oracle/vjp tests cover both."""
    b, do, ho, wo, _ = offset.shape
    nwb = -(-wo // WBLK)
    off = offset.reshape(b, do, ho, wo, KTAPS, 3).astype(jnp.float32)
    off = jnp.pad(
        off,
        ((0, 0), (0, D_PAD - do), (0, hp - ho), (0, nwb * WBLK - wo),
         (0, TAP_PAD - KTAPS), (0, 0)),
    )
    off = off.reshape(b, D_PAD, hp, nwb, WBLK, TAP_PAD, 3)
    off = off.transpose(0, 3, 2, 6, 5, 1, 4)  # [B,nWB,Hp,3,TAP,D_PAD,WBLK]

    kz, ky, kx = np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij")
    base = np.zeros((3, TAP_PAD, D_PAD, 1), np.float32)
    base[0, :KTAPS] = (kz.ravel() - 1.0)[:, None, None] + np.arange(
        D_PAD, dtype=np.float32
    )[None, :, None]
    base[1, :KTAPS] = (ky.ravel() - 1.0)[:, None, None]
    base[2, :KTAPS] = (kx.ravel() - 1.0)[:, None, None]
    big = np.float32(3.0e38)  # pd is unclamped; ph/pw clamp to the aperture
    lo = np.array([-big, -AP, -AP], np.float32).reshape(3, 1, 1, 1)
    hi = np.array([big, AP + 1 - EPS, AP + 1 - EPS], np.float32).reshape(3, 1, 1, 1)
    pos = jnp.clip(off + jnp.asarray(base), jnp.asarray(lo), jnp.asarray(hi))
    return pos.reshape(b, nwb, hp, 3, NPL)


def _prep_positions(offset, d, hp):
    """offset [B, D, H, W, 3K] -> pos [B, nWB, Hp, 3, NPL].

    TAP-MAJOR pairs p = tap*D_PAD + dout; lanes = p*WBLK + wo%WBLK:
      pd     = d_out + kd - 1 + off_d           (absolute, unclamped)
      ph_rel = kh - 1 + off_h   clamped to [-AP, AP + 1 - EPS]
      pw_rel = kw - 1 + off_w   clamped likewise

    DPFACE_DEFORM_POSPREP (trace-time): 'late' (DEFAULT) computes the same
    tensor via `_prep_positions_late` (shuffle first, arithmetic after —
    fewer copies; on-chip 46.84 vs 45.84 pairs/s full-model, round 5);
    'stack' keeps this arithmetic-first order (the round-4 baseline).
    """
    if os.environ.get("DPFACE_DEFORM_POSPREP", "late") == "late":
        return _prep_positions_late(offset, d, hp)
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
    # pad every axis in the compact layout (arithmetic above fuses into the
    # offset head's epilogue), then ONE relayout into the kernel's
    # tap-major lane order — round 2 did two minor-dim transposes here,
    # ~300 MB of extra copy traffic per conv at the 768x576 ANM shape
    nwb = -(-wo // WBLK)
    pos = jnp.pad(
        pos,
        ((0, 0), (0, D_PAD - do), (0, hp - ho), (0, nwb * WBLK - wo),
         (0, TAP_PAD - KTAPS), (0, 0)),
    )
    pos = pos.reshape(b, D_PAD, hp, nwb, WBLK, TAP_PAD, 3)
    pos = pos.transpose(0, 3, 2, 6, 5, 1, 4)  # [B, nWB, Hp, 3, TAP_PAD, D_PAD, WBLK]
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
    grid = (b, nwb, nhb)

    # trace-time kernel-version knob (on-chip A/B; v6 = per-tap dots in the
    # output voxel order, killing the v5 scratch-rearrangement floor)
    kv = os.environ.get("DPFACE_DEFORM_KV", "v5")
    if kv == "v7":
        pos = _prep_positions_v7(offset, d, hp)
        kernel = functools.partial(_kernel_v7, hb, cpad, cout, cdt)
        pos_spec = pl.BlockSpec(
            (1, 1, hb // HGRP, 3, TAP_PAD // TGRP, TGRP * 128),
            lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif kv == "v6":
        pos = _prep_positions_v6(offset, d, hp)
        kernel = functools.partial(_kernel_v6, hb, cpad, cout, cdt)
        pos_spec = pl.BlockSpec(
            (1, 1, hb // HGRP, 3, TAP_PAD, HGRP * D_PAD * WBLK),
            lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        assert kv == "v5", kv
        pos = _prep_positions(offset, d, hp)
        kernel = functools.partial(_kernel, hb, cpad, cout, cdt)
        pos_spec = pl.BlockSpec(
            (1, 1, hb, 3, NPL),
            lambda bi, wi, hi: (bi, wi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, hb + DH_ROWS - 1, WWIN, D_PAD * cpad),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pos_spec,
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
        out_shape=jax.ShapeDtypeStruct((b, nwb, hp // HGRP, 128, cout), cdt),
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
        from dualpixelface_tpu.ops.target import tpu_lowering
        interpret = not tpu_lowering()
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


# ---------------------------------------------------------------------------
# Fused backward: the same one-hot-matmul structure run in reverse.
#
# Forward (per row h):  S3 = ad*ah*aw;  cols = tsrc^T S3;  out = SB^T W.
# Backward:
#   gSB   = W g^T                      (one dot per 4-row group)
#   gslab = sum_h S3 gcols^T           (accumulated into the slab layout)
#   gS3   = tsrc gcols                 -> chain through the three hats to
#                                         (g_pd, g_ph, g_pw) per pair-lane
#   gW    = sum_blocks SB g            (grid-accumulated, constant block)
# The XLA-side reversals of the slab/position preps are jax.vjp of the
# forward preps themselves, so they are exactly consistent (including the
# clamp's gradient); the reference's three backward CUDA kernels
# (deform_conv_cuda.cu:221-280) are all covered by this one pass.
# ---------------------------------------------------------------------------


def _hat_grad(iota, pos):
    """d/dpos of hat(iota - pos), with the tie convention of floor-based
    trilinear interpolation (the XLA twin): +1 on t in (0, 1], -1 on
    t in (-1, 0]. sign(0)=0 would zero ALL offset gradients at the
    zero-offset initialization, where every position is an exact integer."""
    t = iota - pos
    return jnp.where(
        (t > 0.0) & (t <= 1.0), 1.0,
        jnp.where((t > -1.0) & (t <= 0.0), -1.0, 0.0),
    )


def _bwd_kernel(hb, cpad, cout, cdt,
                xw_ref, pos_ref, w_ref, g_ref,
                gslab_ref, gpos_ref, gw_ref, sb_ref, gsl_ref):
    """Inputs mirror the forward kernel; g_ref is the cotangent in the
    forward's output layout [1, 1, hb//HGRP, 128, cout] (cdt).
    Outputs: gslab (cdt, slab layout, per block — accumulated in the f32
    gsl_ref scratch, cast once at block end; the XLA-side slab vjp consumes
    cdt anyway, and the f32 output pushed the b4 768x576 train step 55 MB
    past HBM), gpos (f32, [hb, 3, NPL]), gw (f32, [TAP_PAD, cpad, cout],
    accumulated across the whole grid via a constant index map)."""

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    wo_l = (jax.lax.broadcasted_iota(jnp.int32, (1, NPL), 1) % WBLK).astype(
        jnp.float32
    )
    i_d = fiota((D_PAD, 1, NPL), 0)
    i_h = fiota((1, DH_ROWS, 1, NPL), 1)
    i_w = fiota((1, 1, WWIN, NPL), 2)

    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    step = (
        pl.program_id(0) * pl.num_programs(1) * pl.num_programs(2)
        + pl.program_id(1) * pl.num_programs(2)
        + pl.program_id(2)
    )

    @pl.when(step == 0)
    def _init_gw():
        gw_ref[:, :, :] = jnp.zeros(gw_ref.shape, gw_ref.dtype)

    gsl_ref[:, :, :] = jnp.zeros(gsl_ref.shape, gsl_ref.dtype)
    w_flat = w_ref[:, :, :].reshape(TAP_PAD * cpad, cout)
    gw_acc = jnp.zeros((TAP_PAD * cpad, cout), jnp.float32)

    for hg in range(hb // HGRP):
        g_hg = g_ref[0, 0, 0, hg]  # [128, cout] cdt
        gsb = jax.lax.dot_general(
            w_flat, g_hg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(TAP_PAD, cpad, 128).astype(cdt)  # [K, voxel-lanes]

        for hs in range(HGRP):
            h = hg * HGRP + hs
            pd = pos_ref[0, 0, h, 0:1, :]
            ph = pos_ref[0, 0, h, 1:2, :] + AP
            pw = pos_ref[0, 0, h, 2:3, :] + (AP + 1) + wo_l

            ad_f = _hat(i_d, pd)                # [D_PAD, 1, NPL] f32
            ah_f = _hat(i_h, ph)
            aw_f = _hat(i_w, pw)
            ah, aw = ah_f.astype(cdt), aw_f.astype(cdt)
            s2 = (ah * aw).reshape(DH_ROWS * WWIN, NPL)

            tsrc = _tsrc_rows(xw_ref, h)  # [DH_ROWS*WWIN, D_PAD*cpad] cdt

            # forward cols (recomputed) -> SB for gW; per-plane partials
            # feed g_ad below (v5: D rides the lane dim, see _kernel)
            cols4 = jax.lax.dot_general(
                tsrc, s2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(D_PAD, cpad, NPL)  # f32
            cols = jnp.sum(cols4 * ad_f, axis=0).astype(cdt)  # [cpad, NPL]
            for tau in range(TAP_PAD):
                sb_ref[tau, :, hs * 32 : (hs + 1) * 32] = cols[
                    :, tau * 32 : (tau + 1) * 32
                ]

            # gcols of row h from gsb's voxel lanes (hs, dout, wo)
            gcols = jnp.concatenate(
                [gsb[tau, :, hs * 32 : (hs + 1) * 32] for tau in range(TAP_PAD)],
                axis=1,
            )  # [cpad, NPL]

            # adg[(dp, c), l] = ad * gcols — the lane-folded cotangent both
            # slab- and position-gradient dots consume
            adg = (ad_f.astype(cdt) * gcols[None]).reshape(D_PAD * cpad, NPL)

            # gslab: accumulate S2 adg^T into the slab rows of this h
            gt = jax.lax.dot_general(
                s2, adg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(DH_ROWS, WWIN, D_PAD * cpad)  # f32
            for dh in range(DH_ROWS):
                gsl_ref[h + dh] = gsl_ref[h + dh] + gt[dh]

            # position gradients through the separable hats:
            #   g_ad = <cols4, gcols>_c ; T = tsrc adg^T ; g_ah = <aw, T>_w ;
            #   g_aw = <ah, T>_dh
            g_ad = jnp.sum(cols4 * gcols[None].astype(jnp.float32), axis=1)
            t_hw = jax.lax.dot_general(
                tsrc, adg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(1, DH_ROWS, WWIN, NPL)  # f32
            g_ah = jnp.sum(t_hw * aw_f, axis=(0, 2))            # [DH_ROWS, NPL]
            g_aw = jnp.sum(t_hw * ah_f, axis=(0, 1))            # [WWIN, NPL]

            g_pd = jnp.sum(g_ad * _hat_grad(i_d[:, 0], pd), axis=0)
            g_ph = jnp.sum(g_ah * _hat_grad(i_h[0, :, 0], ph), axis=0)
            g_pw = jnp.sum(g_aw * _hat_grad(i_w[0, 0, :], pw), axis=0)
            gpos_ref[0, 0, h, 0, :] = g_pd
            gpos_ref[0, 0, h, 1, :] = g_ph
            gpos_ref[0, 0, h, 2, :] = g_pw

        gw_acc = gw_acc + jax.lax.dot_general(
            sb_ref[:, :, :].reshape(TAP_PAD * cpad, 128), g_hg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    gw_ref[:, :, :] = gw_ref[:, :, :] + gw_acc.reshape(TAP_PAD, cpad, cout)
    gslab_ref[0, 0, 0] = gsl_ref[:, :, :].astype(cdt)


def _bwd_kernel_v7(hb, cpad, cout, cdt,
                   xw_ref, pos_ref, w_ref, g_ref,
                   gslab_ref, gpos_ref, gw_ref, sb_ref, gsl_ref):
    """v7 backward: the forward's TGRP-tap union-dot structure run in
    reverse. Per (group, tap-group) instead of per (row, tap): the gsb
    reads and sb writes are full-width aligned [cpad, 128] moves (28+28
    per 4-row group vs v5's 112+112 masked quarter-width), and the gslab
    accumulation is ONE 11-row slice-add per tap-group (vs 8 row-adds per
    row). Sampling-side dots pay the same +37.5% union MACs as the v7
    forward. Layouts: pos/gpos in _prep_positions_v7's
    [.., 3, NG, TGRP*128] output-voxel order."""

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    ng = TAP_PAD // TGRP
    nl = TGRP * HGRP * D_PAD * WBLK
    crow = HGRP + DH_ROWS - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1)
    hs_l = ((lane % 128) // (D_PAD * WBLK)).astype(jnp.float32)
    wo_l = (lane % WBLK).astype(jnp.float32)
    i_d = fiota((D_PAD, 1, nl), 0)
    i_r = fiota((1, crow, 1, nl), 1)
    i_w = fiota((1, 1, WWIN, nl), 2)

    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    step = (
        pl.program_id(0) * pl.num_programs(1) * pl.num_programs(2)
        + pl.program_id(1) * pl.num_programs(2)
        + pl.program_id(2)
    )

    @pl.when(step == 0)
    def _init_gw():
        gw_ref[:, :, :] = jnp.zeros(gw_ref.shape, gw_ref.dtype)

    gsl_ref[:, :, :] = jnp.zeros(gsl_ref.shape, gsl_ref.dtype)
    w_flat = w_ref[:, :, :].reshape(TAP_PAD * cpad, cout)
    gw_acc = jnp.zeros((TAP_PAD * cpad, cout), jnp.float32)
    m = xw_ref.shape[-1]  # D_PAD * cpad

    for hg in range(hb // HGRP):
        g_hg = g_ref[0, 0, 0, hg]  # [128, cout] cdt
        gsb = jax.lax.dot_general(
            w_flat, g_hg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(TAP_PAD, cpad, 128).astype(cdt)

        tsrc4 = xw_ref[0, 0, 0, hg * HGRP : hg * HGRP + crow].reshape(
            crow * WWIN, m
        )

        for gi in range(ng):
            pd = pos_ref[0, 0, hg, 0, gi][None, :]
            ph = pos_ref[0, 0, hg, 1, gi][None, :] + AP + hs_l
            pw = pos_ref[0, 0, hg, 2, gi][None, :] + (AP + 1) + wo_l

            ad_f = _hat(i_d, pd)                 # [D_PAD, 1, nl] f32
            ah_f = _hat(i_r, ph)                 # [1, crow, 1, nl]
            aw_f = _hat(i_w, pw)                 # [1, 1, WWIN, nl]
            s2 = (ah_f.astype(cdt) * aw_f.astype(cdt)).reshape(crow * WWIN, nl)

            cols4 = jax.lax.dot_general(
                tsrc4, s2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(D_PAD, cpad, nl)
            cols = jnp.sum(cols4 * ad_f, axis=0).astype(cdt)
            for t in range(TGRP):
                sb_ref[gi * TGRP + t, :, :] = cols[:, t * 128 : (t + 1) * 128]

            gcb = jnp.concatenate(
                [gsb[gi * TGRP + t] for t in range(TGRP)], axis=1
            )  # [cpad, nl] cdt — aligned full-width reads

            adg = (ad_f.astype(cdt) * gcb[None]).reshape(D_PAD * cpad, nl)

            gt = jax.lax.dot_general(
                s2, adg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(crow, WWIN, m)  # f32
            rows = slice(hg * HGRP, hg * HGRP + crow)
            gsl_ref[rows] = gsl_ref[rows] + gt

            g_ad = jnp.sum(cols4 * gcb[None].astype(jnp.float32), axis=1)
            t_hw = jax.lax.dot_general(
                tsrc4, adg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(1, crow, WWIN, nl)
            g_ah = jnp.sum(t_hw * aw_f, axis=(0, 2))    # [crow, nl]
            g_aw = jnp.sum(t_hw * ah_f, axis=(0, 1))    # [WWIN, nl]

            g_pd = jnp.sum(g_ad * _hat_grad(i_d[:, 0], pd), axis=0)
            g_ph = jnp.sum(g_ah * _hat_grad(i_r[0, :, 0], ph), axis=0)
            g_pw = jnp.sum(g_aw * _hat_grad(i_w[0, 0, :], pw), axis=0)
            gpos_ref[0, 0, hg, 0, gi, :] = g_pd
            gpos_ref[0, 0, hg, 1, gi, :] = g_ph
            gpos_ref[0, 0, hg, 2, gi, :] = g_pw

        gw_acc = gw_acc + jax.lax.dot_general(
            sb_ref[:, :, :].reshape(TAP_PAD * cpad, 128), g_hg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    gw_ref[:, :, :] = gw_ref[:, :, :] + gw_acc.reshape(TAP_PAD, cpad, cout)
    gslab_ref[0, 0, 0] = gsl_ref[:, :, :].astype(cdt)


@functools.partial(jax.jit, static_argnames=("interpret", "hb"))
def _fused_bwd_call(x, offset, wmat, g, hb, interpret=False):
    b, d, h, w, c = x.shape
    cpad = wmat.shape[1]
    cout = wmat.shape[2]
    cdt = wmat.dtype

    slab_fn = lambda x_: _prep_slab(x_, cpad, cdt, hb)
    xw, slab_vjp = jax.vjp(slab_fn, x)
    nwb, nhb = xw.shape[1], xw.shape[2]
    hp = nhb * hb
    # v7 = TGRP-tap union-dot kernel (forward docstring); the prep vjp
    # chain follows the kernel version so gpos layouts stay consistent
    kv = os.environ.get("DPFACE_DEFORM_KV", "v5")
    if kv == "v7":
        pos_fn = lambda o_: _prep_positions_v7(offset=o_, d=d, hp=hp)
        pos_block_tail = (hb // HGRP, 3, TAP_PAD // TGRP, TGRP * 128)
        bwd = _bwd_kernel_v7
    else:
        pos_fn = lambda o_: _prep_positions(o_, d, hp)
        pos_block_tail = (hb, 3, NPL)
        bwd = _bwd_kernel
    pos, pos_vjp = jax.vjp(pos_fn, offset)

    # cotangent into the kernel's output layout (inverse of the forward's
    # final reshape/transpose; the (0,4,..) permutation is self-inverse)
    gp = jnp.pad(
        g.astype(cdt),
        ((0, 0), (0, D_PAD - d), (0, hp - h), (0, nwb * WBLK - w), (0, 0)),
    )
    gp = gp.reshape(b, D_PAD, hp // HGRP, HGRP, nwb, WBLK, cout)
    gp = gp.transpose(0, 4, 2, 3, 1, 5, 6).reshape(b, nwb, hp // HGRP, 128, cout)
    gp = gp.reshape(b, nwb, nhb, hb // HGRP, 128, cout)

    if kv == "v7":
        pos_spec = pl.BlockSpec(
            (1, 1) + pos_block_tail,
            lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        pos_spec = pl.BlockSpec(
            (1, 1) + pos_block_tail,
            lambda bi, wi, hi: (bi, wi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
    kernel = functools.partial(bwd, hb, cpad, cout, cdt)
    gslab, gpos, gw = pl.pallas_call(
        kernel,
        grid=(b, nwb, nhb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, hb + DH_ROWS - 1, WWIN, D_PAD * cpad),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pos_spec,
            pl.BlockSpec(
                (TAP_PAD, cpad, cout),
                lambda bi, wi, hi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, hb // HGRP, 128, cout),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, hb + DH_ROWS - 1, WWIN, D_PAD * cpad),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pos_spec,
            pl.BlockSpec(
                (TAP_PAD, cpad, cout),
                lambda bi, wi, hi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xw.shape, cdt),
            jax.ShapeDtypeStruct(pos.shape, jnp.float32),
            jax.ShapeDtypeStruct((TAP_PAD, cpad, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TAP_PAD, cpad, 128), cdt),
            pltpu.VMEM((hb + DH_ROWS - 1, WWIN, D_PAD * cpad), jnp.float32),
        ],
        interpret=interpret,
    )(xw, pos, wmat, gp)

    (grad_x,) = slab_vjp(gslab)
    (grad_offset,) = pos_vjp(gpos.astype(pos.dtype))
    grad_w = gw[:KTAPS, :c].reshape(3, 3, 3, c, cout)
    return grad_x.astype(x.dtype), grad_offset.astype(offset.dtype), grad_w


def deform_conv3d_fused_bwd(x, offset, weight, bias, g, interpret=None):
    """Gradients of `deform_conv3d_fused` w.r.t. (x, offset, weight, bias).

    Matches the XLA aperture twin's vjp (the windowed clamp's zero-gradient
    region and the trilinear hat kinks use the same conventions; verified by
    tests/test_deform_gather_pallas.py's custom-vjp suite).
    """
    if interpret is None:
        from dualpixelface_tpu.ops.target import tpu_lowering
        interpret = not tpu_lowering()
    b, d, h, w, c = x.shape
    cout = weight.shape[-1]
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    cq = 16 if cdt == jnp.bfloat16 else 8
    cpad = -(-c // cq) * cq
    wmat = pack_weight_fused(weight, cpad, cdt)
    hp = -(-h // (2 * HGRP)) * (2 * HGRP)
    hb = 16 if hp % 16 == 0 else 2 * HGRP
    gx, goff, gw = _fused_bwd_call(x, offset, wmat, g, hb=hb, interpret=interpret)
    gb = None if bias is None else jnp.sum(g, axis=(0, 1, 2, 3)).astype(bias.dtype)
    return gx, goff, gw.astype(weight.dtype), gb
