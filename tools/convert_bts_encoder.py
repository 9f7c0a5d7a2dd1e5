#!/usr/bin/env python
"""Convert torchvision ResNet/ResNeXt weights to the BTS encoder param tree.

The reference BTS wraps *pretrained* torchvision backbones
(ref src/model/bts/modules.py:268-311); no JAX twin of those weights exists
in this environment (zero egress), so this converter imports a torch
state_dict — downloaded elsewhere — into dualpixelface_tpu's
`models.bts.encoder.ResNetEncoder` tree and saves it with Orbax.

Usage:
  python tools/convert_bts_encoder.py resnet50.pth out_ckpt/ --encoder resnet50_bts

The mapping function `convert_resnet_state_dict` is unit-tested against
torchvision with random weights (tests/test_bts_converter.py) — output parity
validates both the mapping and the Flax re-implementation.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--encoder", default="resnet50_bts")
    args = ap.parse_args()

    import torch

    from dualpixelface_tpu.models.bts.encoder import RESNET_SPECS

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
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
