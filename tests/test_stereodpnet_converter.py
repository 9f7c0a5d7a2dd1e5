"""Verify the StereoDPNet checkpoint converter against the REAL reference
module tree (built with import shims for the absent torchvision FPN and the
compiled DCN extension): every state_dict key must be consumed, every Flax
leaf assigned with the right shape, and the torch-forwardable
feature-extraction path must agree after weight transfer.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout not mounted")
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _install_shims():
    """Fake torchvision FPN (torchvision 0.6 naming: inner_blocks /
    layer_blocks of plain Conv2d) and a fake DCN extension module."""
    import torch.nn as nn
    import torch.nn.functional as F

    class FeaturePyramidNetwork(nn.Module):
        def __init__(self, in_channels_list, out_channels, extra_blocks=None):
            super().__init__()
            self.inner_blocks = nn.ModuleList(
                [nn.Conv2d(c, out_channels, 1) for c in in_channels_list]
            )
            self.layer_blocks = nn.ModuleList(
                [nn.Conv2d(out_channels, out_channels, 3, padding=1) for _ in in_channels_list]
            )

        def forward(self, x):
            names = list(x.keys())
            feats = list(x.values())
            laterals = [m(f) for m, f in zip(self.inner_blocks, feats)]
            fused = [None] * len(laterals)
            fused[-1] = laterals[-1]
            for i in range(len(laterals) - 2, -1, -1):
                up = F.interpolate(fused[i + 1], size=laterals[i].shape[-2:], mode="nearest")
                fused[i] = laterals[i] + up
            outs = [m(f) for m, f in zip(self.layer_blocks, fused)]
            from collections import OrderedDict

            return OrderedDict(zip(names, outs))

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.FeaturePyramidNetwork = FeaturePyramidNetwork
    tv.ops = tv_ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)

    dcn = types.ModuleType("DCN")
    dcn.deform_conv_forward = None
    dcn.deform_conv_backward = None
    sys.modules.setdefault("DCN", dcn)

    for p in (str(REF), str(REF / "src/module/dcn3d")):
        if p not in sys.path:
            sys.path.insert(0, p)


class O:
    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, O(**v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def torch_model():
    _install_shims()
    import runpy

    import torch.nn as nn

    mods = runpy.run_path(str(REF / "src/model/stereodpnet/modules.py"))
    nmod = runpy.run_path(str(REF / "src/model/stereodpnet/normal_module.py"))

    opt = O(
        model=dict(
            input_channel=3, inplanes=32, block_stack=1, level=8,
            mindisp=-4, maxdisp=12, nearest=True, bilinear=True, phase=True,
            asm_activation="sigmoid", feature_fetch=False, predict_normal=True,
            use_sampling=True, use_deform=True, dsample_num=4,
        )
    )

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extraction = mods["feature_extraction"](opt)
            self.cost_volume = mods["CostVolume"](opt, -4, 12)
            self.aggregation = mods["PSMNetHGAggregation"](32)
            self.normal_estimator = nmod["ANM"](opt, -4, 12)

    m = Container()
    m.eval()
    return m, opt


@pytest.fixture(scope="module")
def flax_tree():
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.models import model_selector
    from tests.test_end_to_end import tiny_option
    from tests.test_stereodpnet import make_batch

    opt = tiny_option(model_name="stereodpnet")
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=1, h=32, w=32))
    return model, model.init(jax.random.PRNGKey(0), batch, train=False)


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_leaves(v, f"{prefix}/{k}"))
        return out
    return {prefix: np.asarray(tree)}


def test_full_conversion_structure(torch_model, flax_tree):
    from convert_stereodpnet_checkpoint import convert_stereodpnet_state_dict

    tmodel, _ = torch_model
    model, variables = flax_tree
    sd = tmodel.state_dict()

    params, stats, leftover = convert_stereodpnet_state_dict(sd, block_stack=1)
    assert leftover == [], f"unconsumed reference keys: {leftover[:10]}"

    ref_p = _leaves(variables["params"])
    got_p = _leaves(params)
    missing = sorted(set(ref_p) - set(got_p))
    extra = sorted(set(got_p) - set(ref_p))
    assert missing == [], f"flax leaves not filled: {missing[:10]}"
    assert extra == [], f"converted leaves with no flax home: {extra[:10]}"
    for k in ref_p:
        assert ref_p[k].shape == got_p[k].shape, (k, ref_p[k].shape, got_p[k].shape)

    ref_s = _leaves(variables["batch_stats"])
    got_s = _leaves(stats)
    assert sorted(ref_s) == sorted(got_s)


def test_feature_extraction_forward_parity(torch_model, flax_tree):
    """Full DPBlock-FPN extractor forward with transferred weights."""
    import jax.numpy as jnp

    from convert_stereodpnet_checkpoint import convert_stereodpnet_state_dict
    from dualpixelface_tpu.models.stereodpnet.modules import FeatureExtraction
    from tests.test_end_to_end import tiny_option

    tmodel, _ = torch_model
    params, stats, _ = convert_stereodpnet_state_dict(tmodel.state_dict(), block_stack=1)

    opt = tiny_option(model_name="stereodpnet")
    ffe = FeatureExtraction(opt)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    out_f = ffe.apply(
        {
            "params": params["feature_extraction"],
            "batch_stats": stats["feature_extraction"],
        },
        jnp.asarray(x), False,
    )
    with torch.no_grad():
        out_t = tmodel.feature_extraction(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(
        np.asarray(out_f), np.moveaxis(out_t.numpy(), 1, -1), rtol=5e-3, atol=5e-3
    )
