#!/usr/bin/env python
"""Export a TPU-trained StereoDPNet checkpoint to the reference torch format.

The inverse of tools/convert_stereodpnet_checkpoint.py: maps our Flax
(params, batch_stats) trees back onto the reference module tree's state_dict
keys (`src/model/stereodpnet/`), so a model trained in this framework can be
evaluated inside the reference harness — loaded via
`/root/reference/src/model/model_selector.py:17-26` with load_strict=true
(the saved dict carries the `state_dict` key and `model.`-style prefixes the
reference loader expects... it loads bare state_dicts of the LightningModule;
we emit the exact member names of STEREODPNET).

Usage:
  python tools/export_stereodpnet_checkpoint.py flax_ckpt_dir/ out.ckpt

Round-trip identity (torch -> flax -> torch) and strict-load compatibility
are tested in tests/test_stereodpnet_exporter.py.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def f2t_conv(w):
    """flax [*k, I, O] -> torch [O, I, *k]."""
    w = np.asarray(w)
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def f2t_tconv(w):
    """flax transpose_kernel [*k, O, I] -> torch ConvTranspose [I, O, *k]."""
    w = np.asarray(w)
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


class _Exporter:
    def __init__(self, params, stats):
        self.params = params
        self.stats = stats
        self.sd: dict = {}

    @staticmethod
    def _get(root, path):
        node = root
        for p in path.split("/"):
            node = node[p]
        return node

    def conv(self, fpath, tname, bias=False):
        self.sd[f"{tname}.weight"] = f2t_conv(self._get(self.params, f"{fpath}/kernel"))
        if bias:
            self.sd[f"{tname}.bias"] = np.asarray(self._get(self.params, f"{fpath}/bias"))

    def bn(self, fpath, tname):
        p = self._get(self.params, fpath)
        s = self._get(self.stats, fpath)
        self.sd[f"{tname}.weight"] = np.asarray(p["scale"])
        self.sd[f"{tname}.bias"] = np.asarray(p["bias"])
        self.sd[f"{tname}.running_mean"] = np.asarray(s["mean"])
        self.sd[f"{tname}.running_var"] = np.asarray(s["var"])
        self.sd[f"{tname}.num_batches_tracked"] = np.asarray(0, np.int64)

    def convbn(self, fpath, tname):
        self.conv(f"{fpath}/Conv_0", f"{tname}.0")
        self.bn(f"{fpath}/BatchNorm_0", f"{tname}.1")

    def tconvbn(self, fpath, tname):
        self.sd[f"{tname}.0.weight"] = f2t_tconv(
            self._get(self.params, f"{fpath}/ConvTranspose_0/kernel")
        )
        self.bn(f"{fpath}/BatchNorm_0", f"{tname}.1")

    def prelu(self, fpath, tname):
        self.sd[tname] = np.asarray(self._get(self.params, f"{fpath}/alpha")).reshape(1)

    def dpblock(self, fpath, tname):
        self.convbn(f"{fpath}/conv1", f"{tname}.conv1.0")
        self.prelu(f"{fpath}/PReLU_0", f"{tname}.conv1.1.weight")
        self.convbn(f"{fpath}/conv2", f"{tname}.conv2.0")
        self.prelu(f"{fpath}/PReLU_1", f"{tname}.conv2.1.weight")
        for i in range(3):
            self.convbn(f"{fpath}/conv_dilate{i}", f"{tname}.conv_dilate.{i}")
        self.convbn(f"{fpath}/conv3", f"{tname}.conv3")
        self.prelu(f"{fpath}/PReLU_2", f"{tname}.prelu.weight")
        self.convbn(f"{fpath}/conv4", f"{tname}.conv4.0")
        self.prelu(f"{fpath}/PReLU_3", f"{tname}.conv4.1.weight")
        self.conv(f"{fpath}/conv5/Conv_0", f"{tname}.conv5.depthwise")
        self.conv(f"{fpath}/conv5/Conv_1", f"{tname}.conv5.pointwise")
        self.bn(f"{fpath}/conv5/BatchNorm_0", f"{tname}.conv5.bn")
        self.prelu(f"{fpath}/conv5/PReLU_0", f"{tname}.conv5.prelu.weight")
        self.conv(f"{fpath}/conv_skip", f"{tname}.conv_skip", bias=True)

    def hourglass(self, fpath, tname):
        for cname in ("conv1", "conv3", "conv4"):
            self.convbn(f"{fpath}/{cname}", f"{tname}.{cname}.0")
        self.convbn(f"{fpath}/conv2", f"{tname}.conv2")
        for cname in ("conv5", "conv6"):
            self.tconvbn(f"{fpath}/{cname}", f"{tname}.{cname}")

    def deform_pack(self, fpath, tname):
        self.sd[f"{tname}.weight"] = f2t_conv(self._get(self.params, f"{fpath}/weight"))
        self.sd[f"{tname}.bias"] = np.asarray(self._get(self.params, f"{fpath}/bias"))
        self.conv(f"{fpath}/conv_offset", f"{tname}.conv_offset", bias=True)


def export_stereodpnet_state_dict(params, stats, block_stack: int = 1):
    """(params, batch_stats) -> reference STEREODPNET state_dict (numpy)."""
    ex = _Exporter(params, stats)
    fe, FE = "feature_extraction", "feature_extraction"

    for i, idx in enumerate((0, 2, 4)):
        ex.convbn(f"{fe}/firstconv{i}", f"{FE}.firstconv.{idx}")
    ex.dpblock(f"{fe}/block1", f"{FE}.block1")
    for i in range(block_stack):
        ex.dpblock(f"{fe}/interblock1_{i}", f"{FE}.interblock1.{i}")
    ex.dpblock(f"{fe}/block2", f"{FE}.block2")
    for i in range(block_stack):
        ex.dpblock(f"{fe}/interblock2_{i}", f"{FE}.interblock2.{i}")
    ex.dpblock(f"{fe}/block3", f"{FE}.block3")

    for i in range(3):
        for fpart, tpart in ((f"lateral{i}", f"inner_blocks.{i}"), (f"output{i}", f"layer_blocks.{i}")):
            ex.conv(f"{fe}/fpn/{fpart}", f"{FE}.fpn.{tpart}", bias=True)

    ex.convbn(f"{fe}/lastconv0", f"{FE}.lastconv.0")
    ex.convbn(f"{fe}/lastconv1", f"{FE}.lastconv.2")

    at, AT = "cost_volume/attention", "cost_volume.attention_layer"
    ex.conv(f"{at}/Conv_0", f"{AT}.mask_convs.0")
    ex.bn(f"{at}/BatchNorm_0", f"{AT}.mask_convs.1")
    ex.conv(f"{at}/Conv_1", f"{AT}.mask_convs.3.0")
    p = ex._get(ex.params, f"{at}/InstanceNorm_0/GroupNorm_0")
    # the reference registers the InstanceNorm twice (attribute + Sequential)
    for tname in (f"{AT}.normalize", f"{AT}.mask_convs.3.1"):
        ex.sd[f"{tname}.weight"] = np.asarray(p["scale"])
        ex.sd[f"{tname}.bias"] = np.asarray(p["bias"])

    ag, AG = "aggregation", "aggregation"
    ex.convbn(f"{ag}/dres0_0", f"{AG}.dres0.0")
    ex.convbn(f"{ag}/dres0_1", f"{AG}.dres0.2")
    ex.convbn(f"{ag}/dres1_0", f"{AG}.dres1.0")
    ex.convbn(f"{ag}/dres1_1", f"{AG}.dres1.2")
    for i in (2, 3, 4):
        ex.hourglass(f"{ag}/dres{i}", f"{AG}.dres{i}")
    for i in (1, 2, 3):
        ex.convbn(f"{ag}/classif{i}_0", f"{AG}.classif{i}.0")
        ex.conv(f"{ag}/classif{i}_1", f"{AG}.classif{i}.2")

    ne, NE = "normal_estimator", "normal_estimator"
    nep = params.get("normal_estimator", {})
    if "deform_conv1" in nep:
        for i in (1, 2):
            ex.deform_pack(f"{ne}/deform_conv{i}", f"{NE}.deform_conv{i}")
            ex.bn(f"{ne}/act{i}", f"{NE}.act{i}.0")
    if "orig_conv0" in nep:
        ex.convbn(f"{ne}/orig_conv0", f"{NE}.original_conv.0")
        ex.convbn(f"{ne}/orig_conv1", f"{NE}.original_conv.2")
    if nep:
        for i in range(6):
            ex.conv(f"{ne}/n_convs{i}", f"{NE}.n_convs.{i}.0")
    return ex.sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("flax_ckpt", help="Orbax checkpoint dir ({params, batch_stats})")
    ap.add_argument("out_ckpt", help="output .ckpt path (torch.save format)")
    ap.add_argument("--block_stack", type=int, default=1)
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(Path(args.flax_ckpt).absolute())
    # trainer checkpoints store {params, batch_stats, opt_state, step}
    params = tree["params"]
    stats = tree.get("batch_stats", {})
    sd = export_stereodpnet_state_dict(params, stats, args.block_stack)

    import torch

    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"state_dict": sd_t}, args.out_ckpt)
    print(f"exported {len(sd_t)} tensors to {args.out_ckpt}")


if __name__ == "__main__":
    main()
