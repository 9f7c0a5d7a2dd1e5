"""PSMNet hourglass 3-D cost aggregation (shared by PSMNet & StereoDPNet).

Parity target: ref `src/model/stereodpnet/modules.py:203-337` (identical copy
in psmnet/modules.py): dres0/dres1 pre-filters, three stacked hourglasses
with pre/post skip wiring, three classifier heads with cascaded additions,
trilinear x4 upsampling of the cost logits (align_corners=True).

This is the FLOPs-dominant stage (SURVEY.md §3.5 #1); channels-last NDHWC
3-D convs map straight onto the TPU MXU and XLA fuses the BN+ReLU chains.
"""
from __future__ import annotations

from flax import linen as nn

from dualpixelface_tpu.ops.blocks import ConvBN3D, TConvBN3D, _DSliceConv3D
from dualpixelface_tpu.ops.resize import upsample3d_trilinear


class PSMNetHourglass(nn.Module):
    """Encoder-decoder over (D, H, W) with skip fusion (ref modules.py:204-260).

    relu lives inside ConvBN3D where the activation directly follows the
    conv+BN (identical math; on the serving pallas2 fold the whole chain is
    one kernel). `dfold` forwards per-site fold selection."""

    features: int
    dfold: str = "out"

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = False):
        c = self.features
        df = self.dfold
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
    # dres_dpack=True: run the dres0/dres1 pre-filter chain (4 stride-1
    # convs + residual) in the RESIDENT D-packed layout (ops/s2d.dpack —
    # ONE pack + ONE unpack around the whole chain; per-conv cpack won its
    # microbench but lost full-model to pack/unpack churn,
    # docs/PERFORMANCE.md round 4). Exact: same params, outputs, BN stats.
    dres_dpack: bool = False

    @nn.compact
    def __call__(self, cost, train: bool = False):
        import os

        c = self.features
        df = self.dfold
        dpk = os.environ.get(
            "DPFACE_AGG_DPACK", str(self.dres_dpack)
        ).lower() in ("1", "true")
        dpk = dpk and cost.shape[1] % 4 == 0 and cost.shape[1] >= 4
        if dpk:
            from dualpixelface_tpu.ops.s2d import dpack, dunpack

            q = dpack(cost)
            q0 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres0_0")(q, train)
            q0 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres0_1")(q0, train)
            q1 = ConvBN3D(c, 3, 1, 1, relu=True, dpack=True, name="dres1_0")(q0, train)
            q1 = ConvBN3D(c, 3, 1, 1, dpack=True, name="dres1_1")(q1, train)
            cost0 = dunpack(q1 + q0)
        else:
            cost0 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres0_0")(cost, train)
            cost0 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres0_1")(cost0, train)
            dres1 = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name="dres1_0")(cost0, train)
            dres1 = ConvBN3D(c, 3, 1, 1, dfold=df, name="dres1_1")(dres1, train)
            cost0 = dres1 + cost0

        out1, pre1, post1 = PSMNetHourglass(c, dfold=df, name="dres2")(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = PSMNetHourglass(c, dfold=df, name="dres3")(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, pre3, post3 = PSMNetHourglass(c, dfold=df, name="dres4")(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classify(x, name):
            y = ConvBN3D(c, 3, 1, 1, relu=True, dfold=df, name=f"{name}_0")(x, train)
            # same param tree as nn.Conv(1, (3,3,3)); dfold='taps' swaps the
            # matmul's M and N so the single output channel never starves
            # the MXU's output lanes (~0.6% MFU on any conv formulation)
            return _DSliceConv3D(1, dfold="taps", name=f"{name}_1")(y)

        cost1 = classify(out1, "classif1")
        cost2 = classify(out2, "classif2") + cost1
        cost3 = classify(out3, "classif3") + cost2

        if self.upsample:
            up = lambda cc: upsample3d_trilinear(cc, 4)[..., 0]  # [B, 4D, 4H, 4W]
        else:
            up = lambda cc: cc[..., 0]  # coarse [B, D, H/4, W/4]
        if train:
            return [up(cost3), up(cost2), up(cost1)], [out3, out2, out1]
        return [up(cost3)], [out3]
