#!/usr/bin/env python
"""Convert torchvision ResNet/ResNeXt/DenseNet weights to the BTS encoder tree.

The reference BTS wraps *pretrained* torchvision backbones
(ref src/model/bts/modules.py:268-311); no JAX twin of those weights exists
in this environment (zero egress), so this converter imports a torch
state_dict — downloaded elsewhere — into dualpixelface_tpu's
`models.bts.encoder.ResNetEncoder` tree (which dispatches densenet names to
`DenseNetEncoder`) and saves it with Orbax.

Usage:
  python tools/convert_bts_encoder.py resnet50.pth out_ckpt/ --encoder resnet50_bts
  python tools/convert_bts_encoder.py densenet121.pth out_ckpt/ --encoder densenet121_bts

The mapping functions `convert_resnet_state_dict` / `convert_densenet_state_dict`
are unit-tested against torchvision-named models with random weights
(tests/test_bts_converter.py) — output parity validates both the mapping and
the Flax re-implementation.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import re

import numpy as np


def _k(t):  # torch tensor -> numpy
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, name):
    # torch OIHW -> flax HWIO
    return np.transpose(_k(sd[f"{name}.weight"]), (2, 3, 1, 0))


def _bn(sd, name):
    return (
        {"scale": _k(sd[f"{name}.weight"]), "bias": _k(sd[f"{name}.bias"])},
        {"mean": _k(sd[f"{name}.running_mean"]), "var": _k(sd[f"{name}.running_var"])},
    )


def convert_resnet_state_dict(sd: dict, blocks=(3, 4, 6, 3)):
    """torchvision resnet/resnext state_dict -> (params, batch_stats) trees
    matching models.bts.encoder.ResNetEncoder."""
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _conv(sd, "conv1")}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    for li, nblocks in enumerate(blocks):
        for bi in range(nblocks):
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            sub_p: dict = {}
            sub_s: dict = {}
            for ci in (1, 2, 3):
                sub_p[f"conv{ci}"] = {"kernel": _conv(sd, f"{t}.conv{ci}")}
                bp, bs = _bn(sd, f"{t}.bn{ci}")
                sub_p[f"bn{ci}"], sub_s[f"bn{ci}"] = bp, bs
            if f"{t}.downsample.0.weight" in sd:
                sub_p["down_conv"] = {"kernel": _conv(sd, f"{t}.downsample.0")}
                bp, bs = _bn(sd, f"{t}.downsample.1")
                sub_p["down_bn"], sub_s["down_bn"] = bp, bs
            params[f] = sub_p
            stats[f] = sub_s
    return params, stats


def convert_densenet_state_dict(sd: dict, blocks=(6, 12, 24, 16)):
    """torchvision densenet121/161 state_dict -> (params, batch_stats) trees
    matching models.bts.encoder.ResNetEncoder (which nests the DenseNet tree
    under a 'densenet' submodule). Handles both the modern torchvision key
    naming and the legacy 'norm.1'/'conv.2' style (the same normalization
    torchvision applies when loading its own pretrained URLs)."""
    # strip the 'features.' prefix and the classifier head; normalize legacy keys
    legacy = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|running_mean|running_var))$"
    )
    clean = {}
    for key, v in sd.items():
        if key.startswith("features."):
            key = key[len("features."):]
        elif key.startswith("classifier"):
            continue
        m = legacy.match(key)
        if m:
            key = m.group(1) + m.group(2)
        clean[key] = v
    sd = clean

    params: dict = {"conv0": {"kernel": _conv(sd, "conv0")}}
    stats: dict = {}
    params["norm0"], stats["norm0"] = _bn(sd, "norm0")

    for bi, nlayers in enumerate(blocks):
        for li in range(nlayers):
            t = f"denseblock{bi + 1}.denselayer{li + 1}"
            f = f"denseblock{bi + 1}_layer{li + 1}"
            sub_p: dict = {}
            sub_s: dict = {}
            for ni in (1, 2):
                sub_p[f"norm{ni}"], sub_s[f"norm{ni}"] = _bn(sd, f"{t}.norm{ni}")
                sub_p[f"conv{ni}"] = {"kernel": _conv(sd, f"{t}.conv{ni}")}
            params[f], stats[f] = sub_p, sub_s
        if bi < len(blocks) - 1:
            t = f"transition{bi + 1}"
            params[f"{t}_norm"], stats[f"{t}_norm"] = _bn(sd, f"{t}.norm")
            params[f"{t}_conv"] = {"kernel": _conv(sd, f"{t}.conv")}
    params["norm5"], stats["norm5"] = _bn(sd, "norm5")
    return {"densenet": params}, {"densenet": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--encoder", default="resnet50_bts")
    args = ap.parse_args()

    import torch

    from dualpixelface_tpu.models.bts.encoder import DENSENET_SPECS, RESNET_SPECS

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if args.encoder in DENSENET_SPECS:
        params, stats = convert_densenet_state_dict(sd, DENSENET_SPECS[args.encoder]["blocks"])
    else:
        params, stats = convert_resnet_state_dict(sd, RESNET_SPECS[args.encoder]["blocks"])

    import orbax.checkpoint as ocp
    from pathlib import Path

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            Path(args.out_dir).absolute(),
            {"params": params, "batch_stats": stats},
            force=True,
        )
    print(f"saved converted {args.encoder} weights to {args.out_dir}")


if __name__ == "__main__":
    main()
