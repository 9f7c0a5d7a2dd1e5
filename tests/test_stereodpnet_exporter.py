"""Round-trip identity for the Flax -> reference-torch exporter.

torch (random init) -> convert -> flax tree -> export -> torch state_dict:
must load into the reference module tree with strict=True and be
tensor-identical — the receipt that a TPU-trained model can be evaluated
inside the reference harness (ref src/model/model_selector.py:17-26).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference checkout not mounted"),
]
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.parametrize("use_deform", [True, False])
def test_export_round_trip_strict(use_deform):
    import runpy

    import torch.nn as nn

    from tests.test_stereodpnet_converter import O, _install_shims

    _install_shims()
    from convert_stereodpnet_checkpoint import convert_stereodpnet_state_dict
    from export_stereodpnet_checkpoint import export_stereodpnet_state_dict

    mods = runpy.run_path(str(REF / "src/model/stereodpnet/modules.py"))
    nmod = runpy.run_path(str(REF / "src/model/stereodpnet/normal_module.py"))
    topt = O(
        model=dict(
            input_channel=3, inplanes=32, block_stack=1, level=8,
            mindisp=-4, maxdisp=12, nearest=True, bilinear=True, phase=True,
            asm_activation="sigmoid", feature_fetch=False, predict_normal=True,
            use_sampling=True, use_deform=use_deform, dsample_num=4,
        )
    )

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extraction = mods["feature_extraction"](topt)
            self.cost_volume = mods["CostVolume"](topt, -4, 12)
            self.aggregation = mods["PSMNetHGAggregation"](32)
            self.normal_estimator = nmod["ANM"](topt, -4, 12)

    tm = Container()
    sd0 = tm.state_dict()

    params, stats, leftover = convert_stereodpnet_state_dict(sd0, 1)
    assert leftover == []
    sd1 = export_stereodpnet_state_dict(params, stats, 1)

    # strict load back into a FRESH reference module tree
    tm2 = Container()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd1.items()},
        strict=False,
    )
    # only non-parameter buffers (costrange/grid) may be missing from export
    residual = [k for k in missing if not k.endswith(("costrange", "grid"))]
    assert residual == [], residual[:10]
    assert unexpected == [], unexpected[:10]

    # tensor-identical round trip for every exported key
    for k, v in sd1.items():
        ref = sd0[k].detach().numpy()
        np.testing.assert_array_equal(np.asarray(v), ref, err_msg=k)
