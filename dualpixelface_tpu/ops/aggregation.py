"""PSMNet hourglass 3-D cost aggregation (shared by PSMNet & StereoDPNet).

Parity target: ref `src/model/stereodpnet/modules.py:203-337` (identical copy
in psmnet/modules.py): dres0/dres1 pre-filters, three stacked hourglasses
with pre/post skip wiring, three classifier heads with cascaded additions,
trilinear x4 upsampling of the cost logits (align_corners=True).

This is the FLOPs-dominant stage (SURVEY.md §3.5 #1); channels-last NDHWC
3-D convs map straight onto the TPU MXU and XLA fuses the BN+ReLU chains.

Resident D-packed execution (`dpack_mode`): the 32-channel convs here read
32 of 128 MXU lanes (~11% MFU measured); packing groups of 4 D-planes onto
the lane dim (ops/s2d.dpack) runs the same math at ~50% MFU. 'dres' packs
the dres0/dres1 pre-filter chain (one pack/unpack around 4 convs + the
residual); 'full' keeps the layout RESIDENT across the hourglasses too —
packed stride-2 encoders (_DPackConv3DS2), packed transposed-conv decoders
back to full scale (_DPackTConv3D), packed skip wiring and residuals, and
packed classifier heads, with the 1/4-scale bottom of each hourglass
(16x fewer voxels, D=2 — below the pack factor) running fine. All variants
are exact: same param tree, outputs, and train-mode BN statistics (the
packed BN pools the identical reduction set; tests/test_s2d.py)."""
from __future__ import annotations

from flax import linen as nn

from dualpixelface_tpu.ops.blocks import ConvBN3D, TConvBN3D, _DSliceConv3D
from dualpixelface_tpu.ops.resize import upsample3d_trilinear


class PSMNetHourglass(nn.Module):
    """Encoder-decoder over (D, H, W) with skip fusion (ref modules.py:204-260).

    relu lives inside ConvBN3D where the activation directly follows the
    conv+BN (identical math). `dfold` forwards per-site fold selection.
    dpack=True takes/returns RESIDENT D-packed tensors (x, presqu, postsqu,
    and the returned (out, pre, post) are all [B, G, .., 4C]); the 1/4-scale
    bottom (conv3/conv4/conv5) runs fine — its D=2 is below the pack factor
    and its voxel count is 16x smaller than the full-scale sites."""

    features: int
    dfold: str = "out"
    dpack: bool = False

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = False):
        c = self.features
        df = self.dfold
        if self.dpack:
            from dualpixelface_tpu.ops.s2d import dpack, dunpack

            out = ConvBN3D(c * 2, 3, 2, 1, relu=True, dpack=True, name="conv1")(x, train)
            pre = ConvBN3D(c * 2, 3, 1, 1, dpack=True, name="conv2")(out, train)
            pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

            out = ConvBN3D(c * 2, 3, 2, 1, relu=True, dfold=df, name="conv3")(
                dunpack(pre), train
            )  # fine 1/4 scale, D=2
            out = ConvBN3D(c * 2, 3, 1, 1, relu=True, dfold=df, name="conv4")(out, train)

            up1 = dpack(TConvBN3D(c * 2, name="conv5")(out, train))  # back to 1/2
            post = nn.relu(up1 + presqu) if presqu is not None else nn.relu(up1 + pre)

            out = TConvBN3D(c, dpack=True, name="conv6")(post, train)  # back to 1/1
            return out, pre, post
        out = ConvBN3D(c * 2, 3, 2, 1, relu=True, dfold=df, name="conv1")(x, train)  # 1/2
        pre = ConvBN3D(c * 2, 3, 1, 1, dfold=df, name="conv2")(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = ConvBN3D(c * 2, 3, 2, 1, relu=True, dfold=df, name="conv3")(pre, train)  # 1/4
        out = ConvBN3D(c * 2, 3, 1, 1, relu=True, dfold=df, name="conv4")(out, train)

        up1 = TConvBN3D(c * 2, name="conv5")(out, train)  # back to 1/2
        post = nn.relu(up1 + presqu) if presqu is not None else nn.relu(up1 + pre)

        out = TConvBN3D(c, name="conv6")(post, train)  # back to 1/1
        return out, pre, post


class PSMNetHGAggregation(nn.Module):
    """22 3-D convs: pre-filters + 3 hourglasses + 3 classifiers
    (ref modules.py:264-337). Input [B, D, H, W, 2C]; returns
    (cost logits list [B, 4D, 4H, 4W] — 3 scales in train, 1 in eval —
    and the pre-classifier feature volumes).

    upsample=False returns the COARSE classifier logits instead, for models
    that fuse the x4 trilinear upsample into the regression (the Pallas
    fused_softargmin kernel path)."""

    features: int
    upsample: bool = True
    dfold: str = "out"  # _DSliceConv3D fold for every stride-1 site
    # Resident D-packed execution: 'off', 'dres' (pre-filter chain only),
    # or 'full' (hourglasses + classifier heads too — module docstring).
    # Env DPFACE_AGG_DPACK overrides at trace time ('1'/'true' mean 'dres'
    # for round-4 battery compatibility). Falls back automatically when D
    # doesn't support the pack factor (dres needs D%4==0, full D%8==0).
    dpack_mode: str = "off"

    @nn.compact
    def __call__(self, cost, train: bool = False):
        import os

        c = self.features
        df = self.dfold
        raw = (os.environ.get("DPFACE_AGG_DPACK", "") or self.dpack_mode).lower()
        mode = {
            "": "off", "0": "off", "false": "off", "1": "dres", "true": "dres",
        }.get(raw, raw)
        if mode not in ("off", "dres", "full"):
            raise ValueError(
                f"agg dpack mode must be off/dres/full (or a bool), got {raw!r}"
            )
        d = cost.shape[1]
        if mode != "off" and (d % 4 != 0 or d < 4):
            mode = "off"
        if mode == "full" and d % 8 != 0:
            mode = "dres"

        if mode != "off":
            from dualpixelface_tpu.ops.s2d import dpack, dunpack

            q = dpack(cost)
            q0 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres0_0")(q, train)
            q0 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres0_1")(q0, train)
            q1 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres1_0")(q0, train)
            q1 = ConvBN3D(c, 3, 1, 1, dpack=True, name="dres1_1")(q1, train)
            cost0 = q1 + q0
            if mode == "dres":
                cost0 = dunpack(cost0)
        else:
            cost0 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres0_0")(cost, train)
            cost0 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres0_1")(cost0, train)
            dres1 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres1_0")(cost0, train)
            dres1 = ConvBN3D(c, 3, 1, 1, dfold=df, name="dres1_1")(dres1, train)
            cost0 = dres1 + cost0

        packed = mode == "full"
        hg = lambda name: PSMNetHourglass(c, dfold=df, dpack=packed, name=name)
        out1, pre1, post1 = hg("dres2")(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = hg("dres3")(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, pre3, post3 = hg("dres4")(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classify(x, name):
            y = ConvBN3D(
                c, 3, 1, 1, relu=True, dfold=df, dpack=packed, name=f"{name}_0"
            )(x, train)
            if packed:
                from dualpixelface_tpu.ops.s2d import dunpack

                y = dunpack(y)
            # same param tree as nn.Conv(1, (3,3,3)); dfold='taps' swaps the
            # matmul's M and N so the single output channel never starves
            # the MXU's output lanes (~0.6% MFU on any conv formulation)
            return _DSliceConv3D(1, dfold="taps", name=f"{name}_1")(y)

        cost1 = classify(out1, "classif1")
        cost2 = classify(out2, "classif2") + cost1
        cost3 = classify(out3, "classif3") + cost2

        if packed:
            from dualpixelface_tpu.ops.s2d import dunpack

            # the ANM consumes cost_feats[0] fine; unused entries DCE away
            out1, out2, out3 = dunpack(out1), dunpack(out2), dunpack(out3)

        if self.upsample:
            up = lambda cc: upsample3d_trilinear(cc, 4)[..., 0]  # [B, 4D, 4H, 4W]
        else:
            up = lambda cc: cc[..., 0]  # coarse [B, D, H/4, W/4]
        if train:
            return [up(cost3), up(cost2), up(cost1)], [out3, out2, out1]
        return [up(cost3)], [out3]
