"""Architecture parity via weight transfer: copy the REFERENCE torch modules'
randomly-initialized weights into our Flax modules and compare forward
outputs on identical inputs (eval-mode BN). This pins layer wiring, padding,
activation order and normalization semantics — not just shapes.

Covers the blocks importable without torchvision/pytorch_lightning:
PSMNet hourglass + full aggregation (shared by StereoDPNet), the ASM
MaskingAttention, and the StereoNet feature extractor.
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

if REF.exists() and str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

import runpy  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2f_conv(w):  # torch [O, I, *k] -> flax [*k, I, O]
    w = w.detach().numpy()
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def t2f_tconv(w):  # torch ConvTranspose [I, O, *k] -> flax transpose_kernel [*k, O, I]
    w = w.detach().numpy()
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def bn_map(bn):
    return (
        {"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
        {"mean": bn.running_mean.detach().numpy(), "var": bn.running_var.detach().numpy()},
    )


def convbn_map(seq):
    """torch Sequential(conv, bn) -> (ConvBN* params, batch_stats)."""
    p_bn, s_bn = bn_map(seq[1])
    return (
        {"Conv_0": {"kernel": t2f_conv(seq[0].weight)}, "BatchNorm_0": p_bn},
        {"BatchNorm_0": s_bn},
    )


def nchw(x):  # [B, ..., C] -> torch channel-first
    return torch.from_numpy(np.moveaxis(x, -1, 1))


def nhwc(t):  # torch channel-first -> channels-last numpy
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.fixture(scope="module")
def ref_psmnet():
    return runpy.run_path(str(REF / "src/model/psmnet/modules.py"))


def hourglass_map(thg):
    params, stats = {}, {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        seq = getattr(thg, name)
        inner = seq[0] if name in ("conv1", "conv3", "conv4") else seq  # ReLU wrappers
        p, s = convbn_map(inner)
        params[name] = p
        stats[name] = s
    for name in ("conv5", "conv6"):
        seq = getattr(thg, name)
        p_bn, s_bn = bn_map(seq[1])
        params[name] = {"ConvTranspose_0": {"kernel": t2f_tconv(seq[0].weight)}, "BatchNorm_0": p_bn}
        stats[name] = {"BatchNorm_0": s_bn}
    return params, stats


def test_hourglass_parity(ref_psmnet):
    from dualpixelface_tpu.ops.aggregation import PSMNetHourglass

    c = 8
    thg = ref_psmnet["PSMNetHourglass"](c)
    thg.eval()
    params, stats = hourglass_map(thg)

    fhg = PSMNetHourglass(c)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 16, 16, c)).astype(np.float32)

    out_f, pre_f, post_f = fhg.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), None, None, False
    )
    with torch.no_grad():
        out_t, pre_t, post_t = thg(nchw(x), None, None)
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pre_f), nhwc(pre_t), rtol=1e-3, atol=1e-4)


def aggregation_map(tagg):
    params, stats = {}, {}

    def put(name, p, s):
        params[name] = p
        stats[name] = s

    put("dres0_0", *convbn_map(tagg.dres0[0]))
    put("dres0_1", *convbn_map(tagg.dres0[2]))
    put("dres1_0", *convbn_map(tagg.dres1[0]))
    put("dres1_1", *convbn_map(tagg.dres1[2]))
    for i, name in ((2, "dres2"), (3, "dres3"), (4, "dres4")):
        p, s = hourglass_map(getattr(tagg, f"dres{i}"))
        put(name, p, s)
    for i in (1, 2, 3):
        seq = getattr(tagg, f"classif{i}")
        put(f"classif{i}_0", *convbn_map(seq[0]))
        params[f"classif{i}_1"] = {"kernel": t2f_conv(seq[2].weight)}
    return params, stats


def test_aggregation_parity(ref_psmnet):
    """Full 22-conv aggregation — identical to StereoDPNet's (the reference
    files are copies of each other)."""
    from dualpixelface_tpu.ops.aggregation import PSMNetHGAggregation

    c = 8

    class O:  # minimal option for the torch constructor
        pass

    opt = O(); opt.model = O(); opt.model.inplanes = c; opt.model.cost_volume = "psmnet"
    tagg = ref_psmnet["PSMNetHGAggregation"](opt)
    tagg.eval()
    params, stats = aggregation_map(tagg)

    fagg = PSMNetHGAggregation(c)
    rng = np.random.default_rng(1)
    cost = rng.standard_normal((1, 8, 16, 16, 2 * c)).astype(np.float32)

    logits_f, feats_f = fagg.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(cost), False
    )
    with torch.no_grad():
        # torch layout [B, 2C, D, H, W]
        cost_t = torch.from_numpy(np.moveaxis(cost, -1, 1))
        logits_t, feats_t = tagg(cost_t)
    np.testing.assert_allclose(
        np.asarray(logits_f[0]), logits_t[0].detach().numpy(), rtol=5e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(feats_f[0]),
        np.moveaxis(feats_t[0].detach().numpy(), 1, -1),
        rtol=1e-3, atol=1e-4,
    )


def test_masking_attention_parity():
    from dualpixelface_tpu.ops.asm import MaskingAttention

    asm = runpy.run_path(str(REF / "src/module/asm/asm.py"))
    c = 8
    tma = asm["MaskingAttention"](c, act="sigmoid", feature_fetch=False)
    tma.eval()

    p_bn, s_bn = bn_map(tma.mask_convs[1])
    inorm = tma.normalize
    params = {
        "Conv_0": {"kernel": t2f_conv(tma.mask_convs[0].weight)},
        "BatchNorm_0": p_bn,
        "Conv_1": {"kernel": t2f_conv(tma.mask_convs[3][0].weight)},
        "InstanceNorm_0": {
            "GroupNorm_0": {
                "scale": inorm.weight.detach().numpy(),
                "bias": inorm.bias.detach().numpy(),
            }
        },
    }
    stats = {"BatchNorm_0": s_bn}

    fma = MaskingAttention(features=c, act="sigmoid", feature_fetch=False)
    rng = np.random.default_rng(2)
    # ours [B, D, M, H, W, C]; torch per-plane [B, C, M, H, W]
    x = rng.standard_normal((1, 4, 3, 8, 8, c)).astype(np.float32)

    out_f = fma.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    outs_t = []
    with torch.no_grad():
        for d in range(4):
            xt = torch.from_numpy(np.transpose(x[:, d], (0, 4, 1, 2, 3)))  # [B,C,M,H,W]
            outs_t.append(tma(xt).numpy())  # [B, C, H, W]
    ref_out = np.moveaxis(np.stack(outs_t, 1), 2, -1)  # [B, D, H, W, C]
    np.testing.assert_allclose(np.asarray(out_f), ref_out, rtol=1e-3, atol=1e-4)


def test_psmnet_spp_feature_extraction_parity(ref_psmnet):
    from dualpixelface_tpu.models.psmnet.mainmodel import SPPFeatureExtraction

    c = 8

    class O:
        pass

    opt = O(); opt.model = O(); opt.model.inplanes = c
    tfe = ref_psmnet["feature_extraction"](opt)
    tfe.eval()

    ffe = SPPFeatureExtraction(opt)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    init_vars = ffe.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    # map by module creation order: flax auto-names follow call order inside
    # SPPFeatureExtraction.__call__ which mirrors the torch forward
    params = jax.tree_util.tree_map(lambda v: v, init_vars["params"])
    stats = jax.tree_util.tree_map(lambda v: v, init_vars.get("batch_stats", {}))

    def set_convbn(flax_name, tseq):
        p, s = convbn_map(tseq)
        params[flax_name] = p
        stats[flax_name] = s

    # stem
    set_convbn("ConvBN_0", tfe.firstconv[0])
    set_convbn("ConvBN_1", tfe.firstconv[2])
    set_convbn("ConvBN_2", tfe.firstconv[4])

    # residual layers: BasicBlock_i in call order layer1(3) layer2(4) layer3(3) layer4(3)
    tblocks = list(tfe.layer1) + list(tfe.layer2) + list(tfe.layer3) + list(tfe.layer4)
    for i, tb in enumerate(tblocks):
        name = f"BasicBlock_{i}"
        sub_p = dict(params[name])
        sub_s = dict(stats[name])
        p, s = convbn_map(tb.conv1[0])
        sub_p["ConvBN_0"], sub_s["ConvBN_0"] = p, s
        p, s = convbn_map(tb.conv2)
        sub_p["ConvBN_1"], sub_s["ConvBN_1"] = p, s
        if tb.downsample is not None:
            sub_p["Conv_0"] = {"kernel": t2f_conv(tb.downsample[0].weight)}
            bp, bs = bn_map(tb.downsample[1])
            sub_p["BatchNorm_0"], sub_s["BatchNorm_0"] = bp, bs
        params[name] = sub_p
        stats[name] = sub_s

    # SPP branches (ConvBN_3..6 in pool order 2C, C, C/2, C/4)
    for i, branch in enumerate((tfe.branch1, tfe.branch2, tfe.branch3, tfe.branch4)):
        set_convbn(f"ConvBN_{3 + i}", branch[1])
    # lastconv
    set_convbn("ConvBN_7", tfe.lastconv[0])
    params["Conv_0"] = {"kernel": t2f_conv(tfe.lastconv[2].weight)}

    out_f = ffe.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    with torch.no_grad():
        out_t = tfe(nchw(x))
    # ~20 conv+BN layers amplify fp32 reassociation differences between
    # torch-CPU and XLA; tolerance reflects accumulated roundoff, not wiring
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t), rtol=5e-3, atol=1e-2)


def test_dpnet_encoder_parity():
    from dualpixelface_tpu.models.dpnet.mainmodel import Encoder, Encoder2

    mods = runpy.run_path(str(REF / "src/model/dpnet/modules.py"))

    # Encoder2 (stem)
    te2 = mods["Encoder2"](6, 8, 2)
    te2.eval()
    conv = te2.conv1.conv
    p_bn, s_bn = bn_map(te2.conv1.bn)
    alpha = te2.conv1.prelu.weight.detach().numpy().reshape(())
    params = {
        "TorchBlock_0": {
            "Conv_0": {"kernel": t2f_conv(conv.weight)},
            "BatchNorm_0": p_bn,
            "PReLU_0": {"alpha": alpha},
        }
    }
    stats = {"TorchBlock_0": {"BatchNorm_0": s_bn}}
    fe2 = Encoder2(8)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 96, 96, 6)).astype(np.float32)
    out_f = fe2.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    with torch.no_grad():
        out_t = te2(nchw(x))
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t), rtol=1e-3, atol=1e-4)

    # Encoder (residual block with maxpool skip)
    te = mods["Encoder"](14, 16, 32, 1, 1)
    te.eval()
    fe = Encoder(16, 32, 1, 1)
    x2 = rng.standard_normal((1, 32, 32, 14)).astype(np.float32)
    init_vars = fe.init(jax.random.PRNGKey(0), jnp.asarray(x2), False)
    params2 = dict(init_vars["params"])
    stats2 = dict(init_vars["batch_stats"])

    def torchblock(tb):
        p_bn, s_bn = bn_map(tb.bn)
        return (
            {
                "Conv_0": {"kernel": t2f_conv(tb.conv.weight)},
                "BatchNorm_0": p_bn,
                "PReLU_0": {"alpha": tb.prelu.weight.detach().numpy().reshape(())},
            },
            {"BatchNorm_0": s_bn},
        )

    def dwsep(td):
        p_bn, s_bn = bn_map(td.bn)
        return (
            {
                "Conv_0": {"kernel": t2f_conv(td.depthwise.weight)},
                "Conv_1": {"kernel": t2f_conv(td.pointwise.weight)},
                "BatchNorm_0": p_bn,
                "PReLU_0": {"alpha": td.prelu.weight.detach().numpy().reshape(())},
            },
            {"BatchNorm_0": s_bn},
        )

    params2["TorchBlock_0"], stats2["TorchBlock_0"] = torchblock(te.conv1[0])
    params2["DWSep_0"], stats2["DWSep_0"] = dwsep(te.conv1[1])
    params2["TorchBlock_1"], stats2["TorchBlock_1"] = torchblock(te.conv2)
    params2["TorchBlock_2"], stats2["TorchBlock_2"] = torchblock(te.skip_connection[0])
    params2["PReLU_0"] = {"alpha": te.prelu.weight.detach().numpy().reshape(())}

    out_f = fe.apply({"params": params2, "batch_stats": stats2}, jnp.asarray(x2), False)
    with torch.no_grad():
        out_t = te(nchw(x2))
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t), rtol=1e-3, atol=1e-4)


def test_stereonet_feature_extraction_parity():
    from dualpixelface_tpu.models.stereonet.mainmodel import FeatureExtraction

    mods = runpy.run_path(str(REF / "src/model/stereonet/modules.py"))
    tfe = mods["FeatureExtraction"](3, 3)
    tfe.eval()

    params: dict = {}
    stats: dict = {}
    for i, conv in enumerate(tfe.downsample):
        params[f"Conv_{i}"] = {
            "kernel": t2f_conv(conv.weight),
            "bias": conv.bias.detach().numpy(),
        }
    for i, block in enumerate(tfe.residual_blocks):
        p, s = convbn_map(block.conv1[0])
        params[f"ResidualBlock_{i}"] = {"ConvBN_0": p}
        stats[f"ResidualBlock_{i}"] = {"ConvBN_0": s}
    params[f"Conv_{len(tfe.downsample)}"] = {
        "kernel": t2f_conv(tfe.conv_alone.weight),
        "bias": tfe.conv_alone.bias.detach().numpy(),
    }

    ffe = FeatureExtraction(3)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out_f = ffe.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    with torch.no_grad():
        out_t = tfe(nchw(x))
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# FULL-MODEL forward parity: the complete reference STEREODPNET.forward chain
# (ref src/model/stereodpnet/mainmodel.py:67-111 — feature extraction of both
# views, ASM cost volume, 3-hourglass aggregation, soft-argmin regression,
# ANM normal branch) vs our whole STEREODPNET.apply with converted weights.
# torch CPU => use_deform=false fallback (the CUDA dcn3d stub raises on CPU,
# ref src/module/dcn3d/cpu/deform_cpu.cpp:28); compat_nearest reproduces the
# reference's align-corners-mismatched nearest ASM grid bit-for-bit.
# ---------------------------------------------------------------------------


def test_torch_dcn3d_reimpl_matches_packed8():
    """The pure-torch dcn3d forward (tests/torch_deform_ref.py, mirroring
    deform_im2col_cuda.cuh:27-72) vs our oracle-tested unbounded 'packed8'
    impl, with offsets far outside the +-3 Pallas window."""
    from dualpixelface_tpu.ops.deform_conv3d import deform_conv3d
    from tests.torch_deform_ref import dcn_deform_conv_forward

    rng = np.random.default_rng(5)
    b, d, h, w, c, cout = 2, 4, 6, 8, 5, 7
    x = rng.standard_normal((b, d, h, w, c)).astype(np.float32)
    off = (rng.standard_normal((b, d, h, w, 81)) * 4.0).astype(np.float32)
    wt = (rng.standard_normal((3, 3, 3, c, cout)) * 0.2).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ours = deform_conv3d(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(wt), jnp.asarray(bias),
        impl="packed8",
    )

    tx = torch.from_numpy(np.moveaxis(x, -1, 1))  # [B, C, D, H, W]
    toff = torch.from_numpy(np.moveaxis(off, -1, 1))
    twt = torch.from_numpy(np.ascontiguousarray(np.transpose(wt, (4, 3, 0, 1, 2))))
    out_t = dcn_deform_conv_forward(
        tx, twt, torch.from_numpy(bias), toff,
        3, 3, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 64,
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(out_t.numpy(), 1, -1), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("use_deform", [False, True])
def test_full_stereodpnet_forward_parity(use_deform):
    """use_deform=False pins the convbn_3d fallback; use_deform=True runs the
    reference ANM through a pure-torch reimplementation of the dcn3d CUDA
    forward (tests/torch_deform_ref.py) with RANDOMIZED offset heads, vs our
    exact unbounded 'packed8' impl — the whole deform model end-to-end."""
    import torch.nn as nn

    from tests.test_stereodpnet_converter import O, _install_shims
    from tests.test_stereodpnet import make_batch
    from tests.torch_deform_ref import install_dcn_forward

    _install_shims()
    install_dcn_forward()
    # the reference ASM/ANM build grids with unconditional .cuda() calls
    # (ref asm.py:32-49, normal_module.py:80-118); neutralize on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    # torch-1.5 fft API (ref asm.py:112-125) on modern torch
    if not hasattr(torch, "rfft"):
        def _rfft(x, ndim, onesided=False):
            assert ndim == 2 and not onesided
            y = torch.fft.fft2(x)
            return torch.stack([y.real, y.imag], dim=-1)

        def _irfft(x, ndim, onesided=False):
            assert ndim == 2 and not onesided
            return torch.fft.ifft2(torch.complex(x[..., 0], x[..., 1])).real

        torch.rfft = _rfft
        torch.irfft = _irfft
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_stereodpnet_checkpoint import convert_stereodpnet_state_dict

    mods = runpy.run_path(str(REF / "src/model/stereodpnet/modules.py"))
    nmod = runpy.run_path(str(REF / "src/model/stereodpnet/normal_module.py"))

    topt = O(
        model=dict(
            input_channel=3, inplanes=32, block_stack=1, level=8,
            mindisp=-4, maxdisp=12, nearest=True, bilinear=True, phase=True,
            asm_activation="sigmoid", feature_fetch=False, predict_normal=True,
            use_sampling=True, use_deform=use_deform, dsample_num=4,
        ),
        dataset=dict(flip_lr=False),
    )

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extraction = mods["feature_extraction"](topt)
            self.cost_volume = mods["CostVolume"](topt, -4, 12)
            self.aggregation = mods["PSMNetHGAggregation"](32)
            self.normal_estimator = nmod["ANM"](topt, -4, 12)
            self.regression_layer = mods["disp_regression"](-4, 12, 8)

    tm = Container()
    tm.eval()
    # non-trivial running stats so eval BN is a real check
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.25)
        if use_deform:
            # zero-init offset heads would make the deform conv degenerate to
            # a plain conv; randomize them so real fractional offsets flow
            torch.manual_seed(7)
            for dm in (tm.normal_estimator.deform_conv1, tm.normal_estimator.deform_conv2):
                dm.conv_offset.weight.uniform_(-0.05, 0.05)
                dm.conv_offset.bias.uniform_(-0.6, 0.6)

    params, stats, leftover = convert_stereodpnet_state_dict(tm.state_dict(), 1)
    assert leftover == [], leftover[:10]

    batch_np = make_batch(b=1, h=64, w=64)

    # --- reference forward (the exact mainmodel.py:67-111 sequence,
    #     flip_lr=False, eval mode) ---
    def t_img(a):
        return torch.from_numpy(np.moveaxis(a, -1, 1))

    tb = {
        "left": t_img(batch_np["left"]),
        "right": t_img(batch_np["right"]),
        "K": torch.from_numpy(batch_np["K"]),
        "abvalue": torch.from_numpy(batch_np["abvalue"]),
    }
    with torch.no_grad():
        ref_fea = tm.feature_extraction(tb["left"])
        tar_fea = tm.feature_extraction(tb["right"])
        cost = tm.cost_volume(ref_fea, tar_fea)
        cost_i, cost = tm.aggregation(cost)
        cost_f, cost_p = tm.regression_layer(cost_i)
        normal_results = tm.normal_estimator([cost[0]], [cost_f[0]], tb)
        pred_depth_t = torch.stack(list(cost_f), 1).numpy()  # n b h w -> b n h w
        pred_normal_t = np.stack(
            [np.moveaxis(n.numpy(), 1, -1) for n in normal_results[0]], 1
        )  # [B, n, H, W, 3]

    # --- our full model with the converted weights ---
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration(
        "train_synthetic_stereodpnet", make_workspace=False,
        overrides=dict(batch_size=1),
    )
    cfg.data["model"]["use_deform"] = use_deform
    # 'packed8' = the exact unbounded gather formulation matching the CUDA
    # im2col sampling (the 'pallas' default is the windowed TPU semantic)
    cfg.data["model"]["deform_impl"] = "packed8"
    cfg.data["model"]["compat_nearest"] = True
    # reproduce the reference's per-direction grid cache, which freezes the
    # shift at costrange[0] for every plane (ref asm.py:28-31) — see
    # ASMCostVolume; without this flag we compute the per-plane shifts the
    # paper describes
    cfg.data["model"]["compat_frozen_shift_grid"] = True
    cfg.data["model"]["fused_regression"] = False
    opt = cfg.get_config()
    assert not opt.dataset.flip_lr
    model = model_selector(opt)

    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    results = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )

    pred_depth = np.asarray(results["pred_depth"])  # [B, n, H, W]
    assert pred_depth.shape == pred_depth_t.shape
    # measured fp32-reassociation level is ~6e-6 (disparity units on a
    # [-4, 12] range) — far inside the 0.5% parity budget (BASELINE.md)
    np.testing.assert_allclose(pred_depth, pred_depth_t, rtol=0, atol=1e-4)

    pred_normal = np.asarray(results["pred_normal"])  # [B, n, H, W, 3]
    assert pred_normal.shape == pred_normal_t.shape
    np.testing.assert_allclose(pred_normal, pred_normal_t, rtol=0, atol=1e-4)
