#!/usr/bin/env python
"""Convert the face-parsing BiSeNet torch checkpoint (`79999_iter.pth`) to
the Flax `models.face_seg.model.BiSeNet` param tree, saved with Orbax.

The reference loads this checkpoint in
`src/module/face_seg/evaluate.py:70-80`; its module tree is
`src/module/face_seg/model.py` BiSeNet = ContextPath(cp){Resnet18, arm16,
arm32, conv_head16/32, conv_avg} + ffm + conv_out{,16,32} — the spatial path
is deleted (model.py:235 "here self.sp is deleted").

Usage:
  python tools/convert_face_seg_weights.py 79999_iter.pth out_ckpt/

The mapping is unit-tested against the reference torch model with RANDOM
weights (tests/test_face_seg_converter.py) — forward parity validates both
the mapping and the Flax re-implementation.
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
    out = {"kernel": np.transpose(_k(sd[f"{name}.weight"]), (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = _k(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    return (
        {"scale": _k(sd[f"{name}.weight"]), "bias": _k(sd[f"{name}.bias"])},
        {"mean": _k(sd[f"{name}.running_mean"]), "var": _k(sd[f"{name}.running_var"])},
    )


def _convbnrelu(sd, name):
    """torch ConvBNReLU {conv, bn} -> flax ConvBNReLU {Conv_0, BatchNorm_0}."""
    p: dict = {"Conv_0": _conv(sd, f"{name}.conv")}
    bp, bs = _bn(sd, f"{name}.bn")
    p["BatchNorm_0"] = bp
    return p, {"BatchNorm_0": bs}


def _arm(sd, name):
    """AttentionRefinementModule {conv, conv_atten, bn_atten} ->
    flax AttentionRefinement {ConvBNReLU_0, Conv_0, BatchNorm_0}."""
    cp, cs = _convbnrelu(sd, f"{name}.conv")
    p = {"ConvBNReLU_0": cp, "Conv_0": _conv(sd, f"{name}.conv_atten")}
    bp, bs = _bn(sd, f"{name}.bn_atten")
    p["BatchNorm_0"] = bp
    return p, {"ConvBNReLU_0": cs, "BatchNorm_0": bs}


def _bisenet_output(sd, name):
    """BiSeNetOutput {conv(ConvBNReLU), conv_out} ->
    flax BiSeNetOutput {ConvBNReLU_0, Conv_0}."""
    cp, cs = _convbnrelu(sd, f"{name}.conv")
    return (
        {"ConvBNReLU_0": cp, "Conv_0": _conv(sd, f"{name}.conv_out")},
        {"ConvBNReLU_0": cs},
    )


def _resnet18(sd, prefix="cp.resnet"):
    """ref Resnet18 (face_seg/resnet.py:58-80) -> flax ResNet18: stem
    Conv_0/BatchNorm_0 + ResNet18Block_{0..7} (2 blocks per layer1..4)."""
    p: dict = {"Conv_0": _conv(sd, f"{prefix}.conv1")}
    s: dict = {}
    bp, bs = _bn(sd, f"{prefix}.bn1")
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs

    for li in range(4):
        for bi in range(2):
            t = f"{prefix}.layer{li + 1}.{bi}"
            f = f"ResNet18Block_{li * 2 + bi}"
            bp1, bs1 = _bn(sd, f"{t}.bn1")
            bp2, bs2 = _bn(sd, f"{t}.bn2")
            blk_p = {
                "Conv_0": _conv(sd, f"{t}.conv1"),
                "BatchNorm_0": bp1,
                "Conv_1": _conv(sd, f"{t}.conv2"),
                "BatchNorm_1": bp2,
            }
            blk_s = {"BatchNorm_0": bs1, "BatchNorm_1": bs2}
            if f"{t}.downsample.0.weight" in sd:
                blk_p["Conv_2"] = _conv(sd, f"{t}.downsample.0")
                bpd, bsd = _bn(sd, f"{t}.downsample.1")
                blk_p["BatchNorm_2"], blk_s["BatchNorm_2"] = bpd, bsd
            p[f], s[f] = blk_p, blk_s
    return p, s


def _ffm(sd, name="ffm"):
    """FeatureFusionModule {convblk, conv1, conv2} ->
    flax FeatureFusion {ConvBNReLU_0, Conv_0, Conv_1}."""
    cp, cs = _convbnrelu(sd, f"{name}.convblk")
    p = {
        "ConvBNReLU_0": cp,
        "Conv_0": _conv(sd, f"{name}.conv1"),
        "Conv_1": _conv(sd, f"{name}.conv2"),
    }
    return p, {"ConvBNReLU_0": cs}


def convert_face_seg_state_dict(sd: dict):
    """face-parsing BiSeNet state_dict -> (params, batch_stats) trees
    matching models.face_seg.model.BiSeNet."""
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    params: dict = {}
    stats: dict = {}

    params["resnet"], stats["resnet"] = _resnet18(sd)
    for ours, theirs in [
        ("conv_avg", "cp.conv_avg"),
        ("conv_head16", "cp.conv_head16"),
        ("conv_head32", "cp.conv_head32"),
    ]:
        params[ours], stats[ours] = _convbnrelu(sd, theirs)
    for ours, theirs in [("arm16", "cp.arm16"), ("arm32", "cp.arm32")]:
        params[ours], stats[ours] = _arm(sd, theirs)
    params["ffm"], stats["ffm"] = _ffm(sd)
    for name in ("conv_out", "conv_out16", "conv_out32"):
        params[name], stats[name] = _bisenet_output(sd, name)
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help="path to 79999_iter.pth")
    ap.add_argument("out_dir")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = convert_face_seg_state_dict(sd)

    # structure-verify against a fresh init before saving
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.models.face_seg.model import BiSeNet

    model = BiSeNet(n_classes=int(params["conv_out"]["Conv_0"]["kernel"].shape[-1]))
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(
        lambda x: x.shape, {"params": params, "batch_stats": stats}
    )
    assert ref_shapes == got_shapes, "converted tree does not match model structure"

    import orbax.checkpoint as ocp
    from pathlib import Path

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            Path(args.out_dir).absolute(),
            {"params": params, "batch_stats": stats},
            force=True,
        )
    print(f"saved converted face_seg weights to {args.out_dir}")


if __name__ == "__main__":
    main()
