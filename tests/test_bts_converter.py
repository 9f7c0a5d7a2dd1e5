"""Validate the torch->flax ResNet/ResNeXt conversion (and thereby the Flax
BTS encoder's exact parity with the torchvision backbones the reference wraps,
ref src/model/bts/modules.py:268-311) using RANDOM torch weights.

torchvision is NOT importable in this environment, so the torch side is a
minimal in-test bottleneck ResNet whose module names reproduce torchvision's
state_dict naming exactly (conv1/bn1/layer{i}.{j}.conv{k}/downsample.*) — the
converter consumes a saved state_dict file, never torchvision itself.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_bts_encoder import (  # noqa: E402
    convert_densenet_state_dict,
    convert_resnet_state_dict,
)

from dualpixelface_tpu.models.bts.encoder import ResNetEncoder  # noqa: E402


class _Bottleneck(nn.Module):
    """torchvision.models.resnet.Bottleneck with identical child names."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """torchvision ResNet trunk (no fc head) with identical state_dict keys."""

    def __init__(self, blocks, groups=1, width_per_group=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for li, n in enumerate(blocks):
            stride = 1 if li == 0 else 2
            downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            layer = [_Bottleneck(inplanes, planes, stride, downsample, groups,
                                 width_per_group)]
            inplanes = planes * 4
            for _ in range(1, n):
                layer.append(
                    _Bottleneck(inplanes, planes, 1, None, groups, width_per_group)
                )
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))
            planes *= 2

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        relu_feat = y
        y = self.maxpool(y)
        l1 = self.layer1(y)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        return relu_feat, l1, l2, l3, l4


class _DenseLayer(nn.Module):
    """torchvision.models.densenet._DenseLayer with identical child names."""

    def __init__(self, in_ch, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, 4 * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(4 * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(self.relu1(self.norm1(x)))
        y = self.conv2(self.relu2(self.norm2(y)))
        return torch.cat([x, y], 1)


class _DenseNet(nn.Module):
    """torchvision DenseNet features trunk with identical state_dict keys
    (features.conv0/norm0/denseblock{b}.denselayer{l}.*/transition{t}.*/norm5),
    returning the 5 BTS skip taps (ref bts/modules.py:270-279)."""

    def __init__(self, growth=8, blocks=(2, 2, 2, 2), init=16):
        super().__init__()
        features = nn.Sequential()
        features.add_module("conv0", nn.Conv2d(3, init, 7, stride=2, padding=3, bias=False))
        features.add_module("norm0", nn.BatchNorm2d(init))
        ch = init
        for bi, n in enumerate(blocks):
            block = nn.Sequential()
            for li in range(n):
                block.add_module(f"denselayer{li + 1}", _DenseLayer(ch + li * growth, growth))
            features.add_module(f"denseblock{bi + 1}", block)
            ch += n * growth
            if bi < len(blocks) - 1:
                tr = nn.Sequential()
                tr.add_module("norm", nn.BatchNorm2d(ch))
                tr.add_module("relu", nn.ReLU(inplace=True))
                tr.add_module("conv", nn.Conv2d(ch, ch // 2, 1, bias=False))
                tr.add_module("pool", nn.AvgPool2d(2, stride=2))
                features.add_module(f"transition{bi + 1}", tr)
                ch //= 2
        features.add_module("norm5", nn.BatchNorm2d(ch))
        self.features = features

    def forward(self, x):
        f = self.features
        y = torch.relu(f.norm0(f.conv0(x)))
        relu0 = y
        y = torch.max_pool2d(y, 3, stride=2, padding=1)
        pool0 = y
        y = f.transition1(f.denseblock1(y))
        t1 = y
        y = f.transition2(f.denseblock2(y))
        t2 = y
        y = f.norm5(f.denseblock4(f.transition3(f.denseblock3(y))))
        return relu0, pool0, t1, t2, y


def test_densenet_forward_parity(monkeypatch):
    """convert_densenet_state_dict + the Flax DenseNetEncoder reproduce the
    torchvision-named DenseNet's skip taps exactly (scaled-down config — the
    mapping is size-agnostic; blocks/growth/init are parameters)."""
    torch.manual_seed(1)
    tmodel = _DenseNet()
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.25)

    params, stats = convert_densenet_state_dict(tmodel.state_dict(), (2, 2, 2, 2))

    import dualpixelface_tpu.models.bts.encoder as enc

    monkeypatch.setitem(
        enc.DENSENET_SPECS, "densenet121_bts", dict(growth=8, blocks=(2, 2, 2, 2), init=16)
    )
    fmodel = ResNetEncoder("densenet121_bts")
    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(np.float32)
    init_vars = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    init_keys = set(init_vars["params"]["densenet"].keys())
    conv_keys = set(params["densenet"].keys())
    assert init_keys == conv_keys, init_keys ^ conv_keys

    skips = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        refs = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)))

    for ours, ref in zip(skips[1:], refs):
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1), rtol=1e-3, atol=1e-3
        )


def test_densenet_legacy_key_normalization():
    """Legacy 'norm.1.weight'-style keys (pre-0.4 torchvision checkpoints)
    normalize to the modern naming before mapping."""
    torch.manual_seed(2)
    tmodel = _DenseNet()
    sd = tmodel.state_dict()
    legacy_sd = {}
    for k, v in sd.items():
        m = k
        for ni in ("norm1", "norm2", "conv1", "conv2"):
            if f".{ni}." in m and "denselayer" in m:
                m = m.replace(f".{ni}.", f".{ni[:-1]}.{ni[-1]}.")
        legacy_sd[m] = v
    a_params, a_stats = convert_densenet_state_dict(sd, (2, 2, 2, 2))
    b_params, b_stats = convert_densenet_state_dict(legacy_sd, (2, 2, 2, 2))
    jax.tree_util.tree_map(np.testing.assert_array_equal, a_params, b_params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, a_stats, b_stats)


@pytest.mark.parametrize("encoder,blocks,groups,wpg", [
    ("resnet50_bts", (3, 4, 6, 3), 1, 64),
    pytest.param("resnext50_bts", (3, 4, 6, 3), 32, 4, marks=pytest.mark.slow),
])
def test_resnet_forward_parity(encoder, blocks, groups, wpg):
    torch.manual_seed(0)
    tmodel = _ResNet(blocks, groups, wpg)
    tmodel.eval()
    with torch.no_grad():  # non-trivial running stats -> eval BN is real
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.25)

    params, stats = convert_resnet_state_dict(tmodel.state_dict(), blocks)

    fmodel = ResNetEncoder(encoder)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    init_vars = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # structural match check
    init_keys = set(init_vars["params"].keys())
    conv_keys = set(params.keys())
    assert init_keys == conv_keys, init_keys ^ conv_keys

    skips = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    with torch.no_grad():
        refs = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)))

    for ours, ref in zip(skips[1:], refs):
        np.testing.assert_allclose(
            np.asarray(ours),
            np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-3, atol=1e-3,
        )
