"""StereoDPNet building blocks: DPBlock FPN feature extractor + ASM cost volume.

Parity target: ref `src/model/stereodpnet/modules.py:21-200` —
  * DPBlock: dual conv + 3-way dilated (1/3/5) parallel convs + PReLU skips +
    strided dilated conv4 + depthwise-separable conv5 + 1x1 strided skip
  * feature_extraction: stride-2 stem, 3 DPBlock stages (1/4, 1/8, 1/16), a
    torchvision-style FPN fused back to 1/4, concat of all 3 scales, lastconv
  * CostVolume: per-plane ASM (3-mode sub-pixel shift + shared
    MaskingAttention in both directions), concat [ref | tar]

TPU-first: channels-last; the D-plane loop is fully vectorized
(ops.asm.subpixel_shift_planes computes all planes/modes at once and
MaskingAttention folds D into the batch — vs the reference's python loop with
per-plane FFTs, modules.py:185-194).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.ops.asm import MaskingAttention, subpixel_shift_planes
from dualpixelface_tpu.ops.s2d import S2DConv, s2d_concat, s2d_pack
from dualpixelface_tpu.ops.blocks import ConvBN, DepthwiseSeparableConv, PReLU, he_normal_out
from dualpixelface_tpu.ops.cost_volume import costrange as make_costrange
from dualpixelface_tpu.ops.resize import resize_nearest, upsample2d_bilinear


def _exact_attn_layout(opt):
    """Exact-attention layout: config `attention_layout`, overridable at
    trace time by DPFACE_EXACT_ATTN (on-chip A/B knob, bench battery).

    DEFAULT 'mpack' (round 5): exact math with the M shift modes packed on
    the lane dim — block-diagonal head convs at M*C lanes keep the mode
    axis out of the conv batch, deleting the batch-minor relayout copies
    XLA inserts around the batch-folded 'stacked' layout. Same-session
    train A/B at b2 768x576: stacked 9.844 / mpack 10.23 pairs/s (+3.9%).
    Equivalence (outputs + train-mode BN stats) pinned by test_asm.py."""
    layout = os.environ.get(
        "DPFACE_EXACT_ATTN", opt.get("attention_layout", "mpack")
    )
    if layout not in ("stacked", "flat", "mpack"):
        raise ValueError(
            f"attention_layout {layout!r} not in ('stacked', 'flat', 'mpack')"
        )
    return layout


class DPBlock(nn.Module):
    """(ref modules.py:21-52)

    s2d=True takes a space-to-depth packed input (ops/s2d.py: exact, same
    params/BN stats, ~2-8x the MXU utilization at the tower's 32-channel
    shapes). ratio_s == 2: the strided conv4/conv_skip emit the dense
    coarse grid, so the block's OUTPUT is the ordinary fine half-res tensor
    and no unpack op exists anywhere. ratio_s == 1 (the interblocks): every
    conv is stride-1, so the block maps packed -> packed (conv5's depthwise
    and the 1x1 skip run as parity-structured coarse convs)."""

    features: int
    ratio_s: int
    ratio_t: int
    reluw: float = 0.05
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        sd = self.s2d
        c = self.features
        out1 = PReLU(self.reluw)(ConvBN(c, 3, 1, 1, 1, s2d=sd, name="conv1")(x, train))
        out2 = PReLU(self.reluw)(ConvBN(c, 3, 1, 1, 1, s2d=sd, name="conv2")(out1, train))
        branches = [
            ConvBN(c, 3, 1, dilation=2 * i + 1, s2d=sd, name=f"conv_dilate{i}")(out2, train)
            for i in range(3)
        ]
        out2 = s2d_concat(branches) if sd else jnp.concatenate(branches, axis=-1)
        out2 = ConvBN(c, 3, 1, 1, 1, s2d=sd, name="conv3")(out2, train)
        out = PReLU(self.reluw)(out2 + out1)

        out = PReLU(self.reluw)(
            ConvBN(self.ratio_t * c, 3, self.ratio_s, dilation=2, s2d=sd,
                   name="conv4")(out, train)
        )
        out = DepthwiseSeparableConv(
            self.ratio_t * c, 3, 1, s2d=sd and self.ratio_s == 1, name="conv5"
        )(out, train)

        if sd and self.ratio_s == 1:  # packed 1x1: parity-diagonal coarse conv
            skip = S2DConv(
                self.ratio_t * c, 1, use_bias=True,
                kernel_init=he_normal_out, name="conv_skip",
            )(x)
        else:
            # fine 1x1/stride-2 == 1x1/stride-1 on the packed (0,0)-parity slice
            skip = nn.Conv(
                self.ratio_t * c, (1, 1),
                strides=(1, 1) if sd else (self.ratio_s, self.ratio_s),
                kernel_init=he_normal_out, name="conv_skip",
            )(x[..., :c] if sd else x)
        return out + skip


class FPN(nn.Module):
    """Feature pyramid fusion (torchvision FeaturePyramidNetwork semantics:
    1x1 laterals, nearest top-down adds, 3x3 output convs; ref modules.py:83-85)."""

    features: int

    @nn.compact
    def __call__(self, levels):
        laterals = [
            nn.Conv(self.features, (1, 1), kernel_init=he_normal_out, name=f"lateral{i}")(x)
            for i, x in enumerate(levels)
        ]
        fused = [None] * len(laterals)
        fused[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = resize_nearest(
                fused[i + 1], (laterals[i].shape[1], laterals[i].shape[2]), (1, 2)
            )
            fused[i] = laterals[i] + up
        return [
            nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=he_normal_out, name=f"output{i}")(x)
            for i, x in enumerate(fused)
        ]


class FeatureExtraction(nn.Module):
    """(ref modules.py:56-134) -> [B, H/4, W/4, C]"""

    option: object

    @nn.compact
    def __call__(self, x, train: bool = False):
        opt = self.option.model
        c = opt.inplanes
        stack = opt.block_stack

        # stem: half resolution
        y = nn.relu(ConvBN(c, 3, 2, 1, 1, name="firstconv0")(x, train))
        # tower_s2d: run the pyramid's stride-1 convs (the tower's dominant
        # cost: C=32 at 384x288 runs at ~6% MFU, its s2d form at ~50-80%,
        # tools/bench_conv_probe.py --part s2d) space-to-depth packed —
        # exact (same params + BN stats, ops/s2d.py). Each strided block
        # tail emits the next dense grid natively, so the only extra ops
        # are the three packs (1/2, 1/4, 1/8 — cheap relayouts).
        # mode: 'half'/'1'/'true' = stem + block1 only (the 1/2-res region,
        # the dominant cost); 'full' = also pack the 1/4 and 1/8 regions
        # (interblocks + block2/3). On-chip A/B (docs/PERFORMANCE.md round 4)
        # picks the serving default.
        sd_mode = os.environ.get(
            "DPFACE_TOWER_S2D", str(opt.get("tower_s2d", False))
        ).lower()
        sd_cfg = sd_mode in ("1", "true", "half", "full")
        # the packed regions' dims must divide down evenly; factor-96 inputs
        # (preprocess rounding) always satisfy this
        sd = sd_cfg and y.shape[1] % 8 == 0 and y.shape[2] % 8 == 0
        sd_full = sd and sd_mode == "full"
        if sd:
            y = s2d_pack(y)
        y = nn.relu(ConvBN(c, 3, 1, 1, 1, s2d=sd, name="firstconv1")(y, train))
        initial = nn.relu(ConvBN(c, 3, 1, 1, 1, s2d=sd, name="firstconv2")(y, train))

        out1 = DPBlock(c, 2, 1, s2d=sd, name="block1")(initial, train)  # 1/4, C
        out2 = s2d_pack(out1) if sd_full else out1
        for i in range(stack):
            out2 = DPBlock(c, 1, 1, s2d=sd_full, name=f"interblock1_{i}")(out2, train)
        out2 = DPBlock(c, 2, 2, s2d=sd_full, name="block2")(out2, train)  # 1/8, 2C
        out3 = s2d_pack(out2) if sd_full else out2
        for i in range(stack):
            out3 = DPBlock(2 * c, 1, 1, s2d=sd_full, name=f"interblock2_{i}")(out3, train)
        out3 = DPBlock(2 * c, 2, 2, s2d=sd_full, name="block3")(out3, train)  # 1/16, 4C

        high, mid, low = FPN(c, name="fpn")([out1, out2, out3])

        stage0 = high
        stage1 = upsample2d_bilinear(mid, 2)
        stage2 = upsample2d_bilinear(low, 4)
        feat = jnp.concatenate([stage0, stage1, stage2], axis=-1)

        feat = nn.relu(ConvBN(2 * c, 3, 1, 1, 1, name="lastconv0")(feat, train))
        feat = nn.relu(ConvBN(c, 3, 1, 1, 1, name="lastconv1")(feat, train))
        return feat


class ASMCostVolume(nn.Module):
    """Sub-pixel shifted concat cost volume with shared masking attention
    (ref modules.py:137-200). [B,H,W,C] x2 -> [B, D, H, W, 2C]."""

    option: object
    mindisp: float
    maxdisp: float

    @nn.compact
    def __call__(self, ref_feat, tar_feat, train: bool = False):
        opt = self.option.model
        disps = tuple(make_costrange(self.mindisp, self.maxdisp, opt.level).tolist())
        modes = dict(nearest=opt.nearest, bilinear=opt.bilinear, phase=opt.phase,
                     compat_nearest=bool(opt.get("compat_nearest", False)))
        if opt.get("compat_frozen_shift_grid", False):
            # Reference bug reproduction (needed for checkpoint parity): the
            # reference caches its sampling grid per DIRECTION on first call
            # and never rebuilds it for later disparities (ref asm.py:28-31),
            # so every cost-volume plane is shifted by costrange[0]. Our
            # default is the per-plane shift the paper describes.
            disps = (disps[0],) * len(disps)

        attention = MaskingAttention(
            features=opt.inplanes, act=opt.asm_activation,
            feature_fetch=opt.feature_fetch,
            # exact packed execution of the mask-head convs (ops/asm.py
            # head_s2d) — the train step's dominant cost-volume cost
            head_s2d=os.environ.get(
                "DPFACE_ASM_HEAD_S2D", str(opt.get("asm_head_s2d", False))
            ).lower() in ("1", "true"),
            name="attention",
        )
        if opt.get("fast_attention", False):
            # hoisted mask head: the conv chain runs once per feature map and
            # the shifts are applied to its output (shift seam + norm-stat
            # deviation documented at MaskingAttention) — D*M x fewer conv
            # FLOPs, the dominant ASM cost at full resolution.
            # layout 'list' keeps the M mode planes unstacked so the
            # [B, D, M, H, W, C] volume (+ its relayout copies) never
            # materializes; numerically identical (tests/test_asm.py).
            layout = os.environ.get(
                "DPFACE_ATTN_LAYOUT", opt.get("fast_attention_layout", "list")
            )
            mode_list = layout == "list"
            sf = lambda dir_: (
                lambda t: subpixel_shift_planes(
                    t, disps, dir_,
                    layout="list" if mode_list else "stacked", **modes,
                )
            )
            vol_ref = attention(
                ref_feat, train, shift_fn=sf("forward"), mode_list=mode_list
            )
            vol_tar = attention(
                tar_feat, train, shift_fn=sf("backward"), mode_list=mode_list
            )
        # exact-path layout selector; DPFACE_EXACT_ATTN overrides at TRACE
        # time (same contract as the other DPFACE_* knobs: captured at first
        # jit, later env changes have no effect)
        elif _exact_attn_layout(opt) == "mpack":
            # exact math with the M shift modes PACKED on the lane dim:
            # block-diagonal head convs at M*C lanes, mode-axis ops as
            # lane-group expressions (ops/asm.py mpack branch) — removes the
            # batch-minor conv relayouts of the batch-folded exact layouts
            # (equivalence tested in test_asm.py)
            m = int(opt.nearest) + int(opt.bilinear) + int(opt.phase)
            fwd = subpixel_shift_planes(ref_feat, disps, "forward", layout="mpack", **modes)
            bwd = subpixel_shift_planes(tar_feat, disps, "backward", layout="mpack", **modes)
            vol_ref = attention(fwd, train, mpack=m)  # [B, D, H, W, C]
            vol_tar = attention(bwd, train, mpack=m)
        elif _exact_attn_layout(opt) == "flat":
            # exact math in the mode-MAJOR layout: every mode-axis op works
            # on major dims, avoiding the [B,D,M,..] fold relayout copies
            # (tools/aot_analyze.py; equivalence tested in test_asm.py)
            fwd = subpixel_shift_planes(ref_feat, disps, "forward", layout="flat", **modes)
            bwd = subpixel_shift_planes(tar_feat, disps, "backward", layout="flat", **modes)
            vol_ref = attention(fwd, train, flat=True)  # [B, D, H, W, C]
            vol_tar = attention(bwd, train, flat=True)
        else:
            fwd = subpixel_shift_planes(ref_feat, disps, "forward", **modes)
            bwd = subpixel_shift_planes(tar_feat, disps, "backward", **modes)
            vol_ref = attention(fwd, train)  # [B, D, H, W, C]
            vol_tar = attention(bwd, train)
        return jnp.concatenate([vol_ref, vol_tar], axis=-1)
