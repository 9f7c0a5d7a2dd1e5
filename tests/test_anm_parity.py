"""ANM forward parity vs the reference (use_deform=False fallback path —
the only configuration whose torch forward runs without the CUDA extension).

Covers: quarter-scale disparity resampling, sample_with_sort top-k plane
selection, grid_maker_3d world-coordinate volume, the convbn_3d fallback,
the shared dilated n_convs stack, mean-over-planes, sigmoid x4-upsample and
the [-1, 1] mapping — i.e. everything in the ANM except the deform conv
itself (which has its own oracle tests).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout not mounted")
torch = pytest.importorskip("torch")


class O:
    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, O(**v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def ref_anm():
    # shim the DCN extension import chain (unused when use_deform=False)
    dcn = types.ModuleType("DCN")
    sys.modules.setdefault("DCN", dcn)
    for p in (str(REF), str(REF / "src/module/dcn3d")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import runpy

    nmod = runpy.run_path(str(REF / "src/model/stereodpnet/normal_module.py"))
    opt = O(
        model=dict(
            inplanes=8, level=8, mindisp=-4, maxdisp=12,
            predict_normal=True, use_sampling=True, use_deform=False, dsample_num=4,
        )
    )
    tanm = nmod["ANM"](opt, -4, 12)
    tanm.eval()
    return tanm, opt


def test_anm_fallback_parity(ref_anm):
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.models.stereodpnet.normal_module import ANM
    from tests.test_weight_transfer_parity import bn_map, convbn_map, t2f_conv

    tanm, topt = ref_anm
    c = 8
    b, d, h, w = 1, 8, 8, 8  # quarter-res volume; full-res disp = 4x

    rng = np.random.default_rng(0)
    cost = rng.standard_normal((b, d, h, w, c)).astype(np.float32)
    disp = rng.uniform(-1.0, 2.5, (b, 4 * h, 4 * w)).astype(np.float32)
    K = np.tile(np.array([[[740.0, 0, 2 * w], [0, 740.0, 2 * h], [0, 0, 1]]], np.float32), (b, 1, 1))
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    batch_f = {"K": jnp.asarray(K), "abvalue": jnp.asarray(ab)}

    from tests.test_end_to_end import tiny_option

    fopt = tiny_option(model_name="stereodpnet")
    fopt.model.inplanes = c
    fopt.model.use_deform = False
    fanm = ANM(fopt, -4, 12)

    # weight transfer: original_conv (2x convbn_3d) + n_convs
    params: dict = {}
    stats: dict = {}
    p, s = convbn_map(tanm.original_conv[0])
    params["orig_conv0"], stats["orig_conv0"] = p, s
    p, s = convbn_map(tanm.original_conv[2])
    params["orig_conv1"], stats["orig_conv1"] = p, s
    for i in range(6):
        params[f"n_convs{i}"] = {"kernel": t2f_conv(tanm.n_convs[i][0].weight)}

    normals_f, _, _ = fanm.apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(cost)], [jnp.asarray(disp)], batch_f, False,
    )

    with torch.no_grad():
        cost_t = torch.from_numpy(np.transpose(cost, (0, 4, 1, 2, 3)))  # [B,C,D,H,W]
        disp_t = torch.from_numpy(disp)
        batch_t = {"K": torch.from_numpy(K), "abvalue": torch.from_numpy(ab)}
        normals_t, _, _ = tanm([cost_t], [disp_t], batch_t)

    ours = np.asarray(normals_f[0])  # [B, 4H, 4W, 3]
    ref = np.moveaxis(normals_t[0].numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_nnet_normal_module_parity():
    """NNet's NormalModule (world-coord volume + depth pooling + summed
    per-slice 2-D stacks) vs the reference torch forward."""
    import runpy

    import jax.numpy as jnp

    from dualpixelface_tpu.models.nnet.mainmodel import NNetNormalModule
    from tests.test_end_to_end import tiny_option
    from tests.test_weight_transfer_parity import convbn_map, t2f_conv

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    nmod = runpy.run_path(str(REF / "src/model/nnet/normal_module_.py"))

    c = 8
    topt = O(model=dict(inplanes=c, level=8, predict_normal=True))
    tnm = nmod["NormalModule"](topt, -4, 12)
    tnm.eval()

    b, d, h, w = 1, 8, 8, 8
    rng = np.random.default_rng(1)
    cost_in = rng.standard_normal((b, d, h, w, 2 * c)).astype(np.float32)
    K = np.tile(np.array([[[740.0, 0, 2 * w], [0, 740.0, 2 * h], [0, 0, 1]]], np.float32), (b, 1, 1))
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))

    fopt = tiny_option(model_name="nnet")
    fopt.model.inplanes = c
    fnm = NNetNormalModule(fopt, -4, 12)

    params: dict = {}
    stats: dict = {}
    p, s = convbn_map(tnm.wc0[0]); params["wc0_0"], stats["wc0_0"] = p, s
    p, s = convbn_map(tnm.wc0[2]); params["wc0_1"], stats["wc0_1"] = p, s
    for i, pool in enumerate((tnm.pool1, tnm.pool2, tnm.pool3)):
        p, s = convbn_map(pool[0]); params[f"pool{i + 1}"], stats[f"pool{i + 1}"] = p, s
    for i in range(7):
        params[f"n_convs{i}"] = {"kernel": t2f_conv(tnm.n_convs[i][0].weight)}

    out_f = fnm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(cost_in),
        {"K": jnp.asarray(K), "abvalue": jnp.asarray(ab)},
        False,
    )
    with torch.no_grad():
        cost_t = torch.from_numpy(np.transpose(cost_in, (0, 4, 1, 2, 3)))
        out_t = tnm(cost_t, {"K": torch.from_numpy(K), "abvalue": torch.from_numpy(ab)})[0]
    np.testing.assert_allclose(
        np.asarray(out_f), np.moveaxis(out_t.numpy(), 1, -1), rtol=5e-3, atol=5e-3
    )


def test_dpnet_decoder_parity():
    """DPNet Decoder (k4 s2 ConvTranspose + dwsep stack) vs reference —
    validates the VALID+trim transpose-conv padding equivalence."""
    import runpy

    import jax.numpy as jnp

    from dualpixelface_tpu.models.dpnet.mainmodel import Decoder

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    mods = runpy.run_path(str(REF / "src/model/dpnet/modules.py"))

    td = mods["Decoder"](32, 16, 2, 0, 1, 0, mode=None)  # dec_layer3 config
    td.eval()
    fd = Decoder(16, 2, 0, 1, 0)

    def torchblock_deconv(tb):
        from tests.test_weight_transfer_parity import bn_map

        p_bn, s_bn = bn_map(tb.bn)
        w = tb.conv.weight.detach().numpy()  # [I, O, kh, kw]
        return (
            {
                "ConvTranspose_0": {"kernel": np.transpose(w, (2, 3, 1, 0))},
                "BatchNorm_0": p_bn,
                "PReLU_0": {"alpha": tb.prelu.weight.detach().numpy().reshape(())},
            },
            {"BatchNorm_0": s_bn},
        )

    def dwsep_map(tdw):
        from tests.test_weight_transfer_parity import bn_map, t2f_conv

        p_bn, s_bn = bn_map(tdw.bn)
        return (
            {
                "Conv_0": {"kernel": t2f_conv(tdw.depthwise.weight)},
                "Conv_1": {"kernel": t2f_conv(tdw.pointwise.weight)},
                "BatchNorm_0": p_bn,
                "PReLU_0": {"alpha": tdw.prelu.weight.detach().numpy().reshape(())},
            },
            {"BatchNorm_0": s_bn},
        )

    params: dict = {}
    stats: dict = {}
    params["TorchBlock_0"], stats["TorchBlock_0"] = torchblock_deconv(td.conv1[0])
    for i in range(3):
        params[f"DWSep_{i}"], stats[f"DWSep_{i}"] = dwsep_map(td.conv1[1 + i])

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 10, 12, 32)).astype(np.float32)
    out_f = fd.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    with torch.no_grad():
        out_t = td(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(
        np.asarray(out_f), np.moveaxis(out_t.numpy(), 1, -1), rtol=1e-3, atol=1e-4
    )


def test_anm_leaky_slope_matches_reference():
    """The n_convs stack uses LeakyReLU(0.1) (ref normal_module.py:14-19)."""
    src = (REF / "src/model/stereodpnet/normal_module.py").read_text()
    assert "LeakyReLU(0.1" in src
