#!/usr/bin/env python
"""Convert a reference DualPixelFace StereoDPNet checkpoint to Flax params.

Maps the PyTorch-Lightning checkpoint's state_dict (the reference
`src/model/stereodpnet/` module tree: feature_extraction DPBlock-FPN,
ASM masking attention, PSMNet 3-hourglass aggregation, ANM with
DeformConvPack_dv2) onto dualpixelface_tpu's STEREODPNET parameter tree.

Usage:
  python tools/convert_stereodpnet_checkpoint.py ckpt.ckpt out_dir/

Verification: tests/test_stereodpnet_converter.py rebuilds the reference
modules (with import shims for the absent torchvision/DCN extensions),
converts their randomly-initialized state_dict, and checks every torch key is
consumed, every Flax leaf is assigned with matching shape, and — for the
torch-forwardable submodules — that outputs agree after transfer.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import re

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def t2f_conv(w):
    w = _np(w)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


def t2f_tconv(w):
    w = _np(w)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


class _Tree:
    """Accumulates (path, value) into nested dicts with consumption checks."""

    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}

    @staticmethod
    def _set(root, path, value):
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def p(self, path, value):
        self._set(self.params, path, value)

    def s(self, path, value):
        self._set(self.stats, path, value)


def _convbn(tree, sd, tname, fname, consumed):
    tree.p(f"{fname}/Conv_0/kernel", t2f_conv(sd[f"{tname}.0.weight"]))
    tree.p(f"{fname}/BatchNorm_0/scale", _np(sd[f"{tname}.1.weight"]))
    tree.p(f"{fname}/BatchNorm_0/bias", _np(sd[f"{tname}.1.bias"]))
    tree.s(f"{fname}/BatchNorm_0/mean", _np(sd[f"{tname}.1.running_mean"]))
    tree.s(f"{fname}/BatchNorm_0/var", _np(sd[f"{tname}.1.running_var"]))
    consumed.update(
        {f"{tname}.0.weight", f"{tname}.1.weight", f"{tname}.1.bias",
         f"{tname}.1.running_mean", f"{tname}.1.running_var"}
    )


def _tconvbn(tree, sd, tname, fname, consumed):
    tree.p(f"{fname}/ConvTranspose_0/kernel", t2f_tconv(sd[f"{tname}.0.weight"]))
    tree.p(f"{fname}/BatchNorm_0/scale", _np(sd[f"{tname}.1.weight"]))
    tree.p(f"{fname}/BatchNorm_0/bias", _np(sd[f"{tname}.1.bias"]))
    tree.s(f"{fname}/BatchNorm_0/mean", _np(sd[f"{tname}.1.running_mean"]))
    tree.s(f"{fname}/BatchNorm_0/var", _np(sd[f"{tname}.1.running_var"]))
    consumed.update(
        {f"{tname}.0.weight", f"{tname}.1.weight", f"{tname}.1.bias",
         f"{tname}.1.running_mean", f"{tname}.1.running_var"}
    )


def _prelu(tree, sd, tname, fname, consumed):
    tree.p(f"{fname}/alpha", _np(sd[tname]).reshape(()))
    consumed.add(tname)


def _dpblock(tree, sd, tname, fname, consumed):
    """ref stereodpnet/modules.py DPBlock -> models/stereodpnet/modules.DPBlock.

    Flax PReLU creation order inside DPBlock.__call__:
      PReLU_0 (after conv1), PReLU_1 (after conv2), PReLU_2 (residual add,
      torch's shared self.prelu), PReLU_3 (after conv4).
    """
    _convbn(tree, sd, f"{tname}.conv1.0", f"{fname}/conv1", consumed)
    _prelu(tree, sd, f"{tname}.conv1.1.weight", f"{fname}/PReLU_0", consumed)
    _convbn(tree, sd, f"{tname}.conv2.0", f"{fname}/conv2", consumed)
    _prelu(tree, sd, f"{tname}.conv2.1.weight", f"{fname}/PReLU_1", consumed)
    for i in range(3):
        _convbn(tree, sd, f"{tname}.conv_dilate.{i}", f"{fname}/conv_dilate{i}", consumed)
    _convbn(tree, sd, f"{tname}.conv3", f"{fname}/conv3", consumed)
    _prelu(tree, sd, f"{tname}.prelu.weight", f"{fname}/PReLU_2", consumed)
    _convbn(tree, sd, f"{tname}.conv4.0", f"{fname}/conv4", consumed)
    _prelu(tree, sd, f"{tname}.conv4.1.weight", f"{fname}/PReLU_3", consumed)
    # conv5 depthwise-separable: depthwise/pointwise/bn/prelu
    tree.p(f"{fname}/conv5/Conv_0/kernel", t2f_conv(sd[f"{tname}.conv5.depthwise.weight"]))
    tree.p(f"{fname}/conv5/Conv_1/kernel", t2f_conv(sd[f"{tname}.conv5.pointwise.weight"]))
    tree.p(f"{fname}/conv5/BatchNorm_0/scale", _np(sd[f"{tname}.conv5.bn.weight"]))
    tree.p(f"{fname}/conv5/BatchNorm_0/bias", _np(sd[f"{tname}.conv5.bn.bias"]))
    tree.s(f"{fname}/conv5/BatchNorm_0/mean", _np(sd[f"{tname}.conv5.bn.running_mean"]))
    tree.s(f"{fname}/conv5/BatchNorm_0/var", _np(sd[f"{tname}.conv5.bn.running_var"]))
    _prelu(tree, sd, f"{tname}.conv5.prelu.weight", f"{fname}/conv5/PReLU_0", consumed)
    consumed.update(
        {f"{tname}.conv5.depthwise.weight", f"{tname}.conv5.pointwise.weight",
         f"{tname}.conv5.bn.weight", f"{tname}.conv5.bn.bias",
         f"{tname}.conv5.bn.running_mean", f"{tname}.conv5.bn.running_var"}
    )
    tree.p(f"{fname}/conv_skip/kernel", t2f_conv(sd[f"{tname}.conv_skip.weight"]))
    tree.p(f"{fname}/conv_skip/bias", _np(sd[f"{tname}.conv_skip.bias"]))
    consumed.update({f"{tname}.conv_skip.weight", f"{tname}.conv_skip.bias"})


def _hourglass(tree, sd, tname, fname, consumed):
    for cname in ("conv1", "conv3", "conv4"):
        _convbn(tree, sd, f"{tname}.{cname}.0", f"{fname}/{cname}", consumed)
    _convbn(tree, sd, f"{tname}.conv2", f"{fname}/conv2", consumed)
    for cname in ("conv5", "conv6"):
        _tconvbn(tree, sd, f"{tname}.{cname}", f"{fname}/{cname}", consumed)


def _deform_pack(tree, sd, tname, fname, consumed):
    tree.p(f"{fname}/weight", t2f_conv(sd[f"{tname}.weight"]))
    tree.p(f"{fname}/bias", _np(sd[f"{tname}.bias"]))
    tree.p(f"{fname}/conv_offset/kernel", t2f_conv(sd[f"{tname}.conv_offset.weight"]))
    tree.p(f"{fname}/conv_offset/bias", _np(sd[f"{tname}.conv_offset.bias"]))
    consumed.update(
        {f"{tname}.weight", f"{tname}.bias",
         f"{tname}.conv_offset.weight", f"{tname}.conv_offset.bias"}
    )


def convert_stereodpnet_state_dict(sd: dict, block_stack: int = 1):
    """Reference state_dict -> (params, batch_stats) for STEREODPNET.

    Returns (params, batch_stats, leftover_keys); leftover contains only
    non-parameter buffers (costrange/grid/num_batches_tracked) by design.
    """
    tree = _Tree()
    consumed: set[str] = set()
    FE, fe = "feature_extraction", "feature_extraction"

    for i, idx in enumerate((0, 2, 4)):
        _convbn(tree, sd, f"{FE}.firstconv.{idx}", f"{fe}/firstconv{i}", consumed)

    _dpblock(tree, sd, f"{FE}.block1", f"{fe}/block1", consumed)
    for i in range(block_stack):
        _dpblock(tree, sd, f"{FE}.interblock1.{i}", f"{fe}/interblock1_{i}", consumed)
    _dpblock(tree, sd, f"{FE}.block2", f"{fe}/block2", consumed)
    for i in range(block_stack):
        _dpblock(tree, sd, f"{FE}.interblock2.{i}", f"{fe}/interblock2_{i}", consumed)
    _dpblock(tree, sd, f"{FE}.block3", f"{fe}/block3", consumed)

    # torchvision FPN: inner_blocks == laterals, layer_blocks == output convs
    for i in range(3):
        for tpart, fpart in ((f"inner_blocks.{i}", f"lateral{i}"), (f"layer_blocks.{i}", f"output{i}")):
            tree.p(f"{fe}/fpn/{fpart}/kernel", t2f_conv(sd[f"{FE}.fpn.{tpart}.weight"]))
            tree.p(f"{fe}/fpn/{fpart}/bias", _np(sd[f"{FE}.fpn.{tpart}.bias"]))
            consumed.update({f"{FE}.fpn.{tpart}.weight", f"{FE}.fpn.{tpart}.bias"})

    _convbn(tree, sd, f"{FE}.lastconv.0", f"{fe}/lastconv0", consumed)
    _convbn(tree, sd, f"{FE}.lastconv.2", f"{fe}/lastconv1", consumed)

    # ASM masking attention (cost_volume.attention_layer)
    AT, at = "cost_volume.attention_layer", "cost_volume/attention"
    tree.p(f"{at}/Conv_0/kernel", t2f_conv(sd[f"{AT}.mask_convs.0.weight"]))
    tree.p(f"{at}/BatchNorm_0/scale", _np(sd[f"{AT}.mask_convs.1.weight"]))
    tree.p(f"{at}/BatchNorm_0/bias", _np(sd[f"{AT}.mask_convs.1.bias"]))
    tree.s(f"{at}/BatchNorm_0/mean", _np(sd[f"{AT}.mask_convs.1.running_mean"]))
    tree.s(f"{at}/BatchNorm_0/var", _np(sd[f"{AT}.mask_convs.1.running_var"]))
    tree.p(f"{at}/Conv_1/kernel", t2f_conv(sd[f"{AT}.mask_convs.3.0.weight"]))
    tree.p(f"{at}/InstanceNorm_0/GroupNorm_0/scale", _np(sd[f"{AT}.normalize.weight"]))
    tree.p(f"{at}/InstanceNorm_0/GroupNorm_0/bias", _np(sd[f"{AT}.normalize.bias"]))
    consumed.update(
        {f"{AT}.mask_convs.0.weight", f"{AT}.mask_convs.1.weight", f"{AT}.mask_convs.1.bias",
         f"{AT}.mask_convs.1.running_mean", f"{AT}.mask_convs.1.running_var",
         f"{AT}.mask_convs.3.0.weight", f"{AT}.normalize.weight", f"{AT}.normalize.bias",
         # registered twice (attribute + inside the Sequential) — same tensors
         f"{AT}.mask_convs.3.1.weight", f"{AT}.mask_convs.3.1.bias"}
    )

    # aggregation (identical structure to psmnet's)
    AG, ag = "aggregation", "aggregation"
    _convbn(tree, sd, f"{AG}.dres0.0", f"{ag}/dres0_0", consumed)
    _convbn(tree, sd, f"{AG}.dres0.2", f"{ag}/dres0_1", consumed)
    _convbn(tree, sd, f"{AG}.dres1.0", f"{ag}/dres1_0", consumed)
    _convbn(tree, sd, f"{AG}.dres1.2", f"{ag}/dres1_1", consumed)
    for i in (2, 3, 4):
        _hourglass(tree, sd, f"{AG}.dres{i}", f"{ag}/dres{i}", consumed)
    for i in (1, 2, 3):
        _convbn(tree, sd, f"{AG}.classif{i}.0", f"{ag}/classif{i}_0", consumed)
        tree.p(f"{ag}/classif{i}_1/kernel", t2f_conv(sd[f"{AG}.classif{i}.2.weight"]))
        consumed.add(f"{AG}.classif{i}.2.weight")

    # ANM
    NE, ne = "normal_estimator", "normal_estimator"
    if f"{NE}.original_conv.0.0.weight" in sd:
        # use_deform=false fallback: Sequential(convbn_3d, ReLU, convbn_3d,
        # ReLU) (ref normal_module.py:53-56) -> orig_conv0/orig_conv1
        _convbn(tree, sd, f"{NE}.original_conv.0", f"{ne}/orig_conv0", consumed)
        _convbn(tree, sd, f"{NE}.original_conv.2", f"{ne}/orig_conv1", consumed)
    if f"{NE}.deform_conv1.weight" in sd:
        _deform_pack(tree, sd, f"{NE}.deform_conv1", f"{ne}/deform_conv1", consumed)
        _deform_pack(tree, sd, f"{NE}.deform_conv2", f"{ne}/deform_conv2", consumed)
        for i in (1, 2):
            tree.p(f"{ne}/act{i}/scale", _np(sd[f"{NE}.act{i}.0.weight"]))
            tree.p(f"{ne}/act{i}/bias", _np(sd[f"{NE}.act{i}.0.bias"]))
            tree.s(f"{ne}/act{i}/mean", _np(sd[f"{NE}.act{i}.0.running_mean"]))
            tree.s(f"{ne}/act{i}/var", _np(sd[f"{NE}.act{i}.0.running_var"]))
            consumed.update(
                {f"{NE}.act{i}.0.weight", f"{NE}.act{i}.0.bias",
                 f"{NE}.act{i}.0.running_mean", f"{NE}.act{i}.0.running_var"}
            )
    for i in range(6):
        tree.p(f"{ne}/n_convs{i}/kernel", t2f_conv(sd[f"{NE}.n_convs.{i}.0.weight"]))
        consumed.add(f"{NE}.n_convs.{i}.0.weight")

    leftover = sorted(
        k for k in sd
        if k not in consumed
        and not re.search(r"num_batches_tracked$|costrange$|\bgrid$|regression_layer", k)
    )
    return tree.params, tree.stats, leftover


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--block_stack", type=int, default=1)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    params, stats, leftover = convert_stereodpnet_state_dict(sd, args.block_stack)
    if leftover:
        print("WARNING: unconsumed keys:", leftover[:20])

    from pathlib import Path

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(args.out_dir).absolute(),
                   {"params": params, "batch_stats": stats}, force=True)
    print(f"saved converted StereoDPNet weights to {args.out_dir}")


if __name__ == "__main__":
    main()
