"""Numeric parity vs the ACTUAL reference implementations.

BASELINE.md's parity budget (metrics within 0.5%) has no published numbers to
check against, so parity is established empirically (SURVEY.md §6): the
reference's geometry / loss / metric math (torch-CPU, scipy, TF) is imported
from the read-only reference checkout and evaluated on identical inputs.
These tests skip wherever the reference tree or its deps are absent.
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


class Opt:
    """Minimal option object for reference loss constructors."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, Opt(**v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    b, h, w = 2, 24, 24
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.stack(
        [np.array([32.98, -26996.49], np.float32), np.array([27.76, -22694.45], np.float32)]
    )
    disp = (ab[:, 1, None, None] / depth + ab[:, 0, None, None]).astype(np.float32)
    mask = (rng.random((b, h, w)) > 0.2).astype(np.float32)
    pred = disp[:, None] + rng.normal(0, 0.05, (b, 3, h, w)).astype(np.float32)
    idepth = (depth.max() / depth).astype(np.float32)
    normal_gt = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    normal_pred = normal_gt + 0.3 * rng.standard_normal((b, h, w, 3)).astype(np.float32)
    return dict(depth=depth, ab=ab, disp=disp, mask=mask, pred=pred, idepth=idepth,
                normal_gt=normal_gt, normal_pred=normal_pred)


def test_geometry_parity(problem):
    from src.utils import geometry as ref_geo

    from dualpixelface_tpu.ops import geometry as our_geo

    import jax.numpy as jnp

    p = problem
    ours = np.asarray(our_geo.disp2depth(jnp.asarray(p["pred"]), jnp.asarray(p["ab"])))
    ref = ref_geo.disp2depth(torch.from_numpy(p["pred"]), torch.from_numpy(p["ab"])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)

    ours = np.asarray(our_geo.depth2disp(jnp.asarray(p["depth"][:, None]), jnp.asarray(p["ab"])))
    ref = ref_geo.depth2disp(torch.from_numpy(p["depth"][:, None]), torch.from_numpy(p["ab"])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    ours = np.asarray(our_geo.inverse_depth(jnp.asarray(p["depth"][:, None])))
    ref = ref_geo.inverse_depth(torch.from_numpy(p["depth"][:, None])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_regress_affine_parity(problem):
    """Different algorithms (scipy soft_l1 vs on-device IRLS) — fitted affine
    params must agree closely on well-conditioned data."""
    from src.utils import geometry as ref_geo

    from dualpixelface_tpu.ops import geometry as our_geo

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    idepth = rng.uniform(0.5, 2.0, (2, 1, 24, 24)).astype(np.float32)
    pred = 3.5 * idepth - 1.2 + rng.normal(0, 0.01, idepth.shape).astype(np.float32)

    ref = ref_geo.regress_affine(torch.from_numpy(pred), torch.from_numpy(idepth)).numpy()
    ours = np.asarray(our_geo.regress_affine(jnp.asarray(pred), jnp.asarray(idepth)))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def _ref_loss(name, option_dict, results_t, batch_t, target_type="disp"):
    import runpy

    mod = runpy.run_path(str(REF / "src/loss" / name))
    cls = [v for k, v in mod.items() if k.endswith("Loss") and isinstance(v, type)][0]
    loss = cls(Opt(**option_dict))
    return loss.forward(results_t, batch_t, target_type)


def test_smoothl1_parity(problem):
    from dualpixelface_tpu.losses.smoothl1 import SmoothL1Loss

    import jax.numpy as jnp

    p = problem
    opt_dict = dict(
        dataset=dict(dp_conversion="given"),
        model=dict(loss_weight=[1.0, 0.7, 0.5], target_type="disp"),
    )
    batch_np = dict(mask=p["mask"], disp=p["disp"], depth=p["depth"],
                    idepth=p["idepth"], abvalue=p["ab"])

    ref = _ref_loss(
        "depth/smoothL1.py", opt_dict,
        {"pred_depth": torch.from_numpy(p["pred"])},
        {k: torch.from_numpy(v) for k, v in batch_np.items()},
    )
    ours = SmoothL1Loss(Opt(**opt_dict))(
        {"pred_depth": jnp.asarray(p["pred"])},
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )
    np.testing.assert_allclose(float(ours["loss"]), float(ref["loss"]), rtol=1e-4)


def test_silog_parity(problem):
    from dualpixelface_tpu.losses.silog import SilogLoss

    import jax.numpy as jnp

    p = problem
    # silog needs positive pred/gt: use depth-space targets
    pred_depth = p["depth"][:, None] * np.float32(1.05)
    opt_dict = dict(
        dataset=dict(dp_conversion="given"),
        model=dict(loss_weight=[1.0], variance_focus=0.6),
    )
    batch_np = dict(mask=p["mask"], depth=p["depth"], idepth=p["idepth"],
                    disp=p["disp"], abvalue=p["ab"])

    ref = _ref_loss(
        "depth/silog.py", opt_dict,
        {"pred_depth": torch.from_numpy(pred_depth)},
        {k: torch.from_numpy(v) for k, v in batch_np.items()},
        target_type="depth",
    )
    ours = SilogLoss(Opt(**opt_dict))(
        {"pred_depth": jnp.asarray(pred_depth)},
        {k: jnp.asarray(v) for k, v in batch_np.items()},
        target_type="depth",
    )
    np.testing.assert_allclose(float(ours["loss"]), float(ref["loss"]), rtol=1e-4)


def test_cosine_parity(problem):
    from dualpixelface_tpu.losses.cosine import CosineLoss

    import jax.numpy as jnp

    p = problem
    opt_dict = dict(dataset=dict(dp_conversion="given"), model=dict(loss_weight=[1.0]))
    pred_nchw = np.moveaxis(p["normal_pred"], -1, 1)[:, None]  # [B,1,3,H,W]
    gt_nchw = np.moveaxis(p["normal_gt"], -1, 1)

    ref = _ref_loss(
        "normal/cosine.py", opt_dict,
        {"pred_normal": torch.from_numpy(pred_nchw)},
        {"normal": torch.from_numpy(gt_nchw), "mask": torch.from_numpy(p["mask"])},
    )
    ours = CosineLoss(Opt(**opt_dict))(
        {"pred_normal": jnp.asarray(p["normal_pred"][:, None])},
        {"normal": jnp.asarray(p["normal_gt"]), "mask": jnp.asarray(p["mask"])},
    )
    np.testing.assert_allclose(float(ours["loss"]), float(ref["loss"]), rtol=1e-4, atol=1e-5)


def test_absolute_metric_parity(problem):
    import runpy

    from dualpixelface_tpu.metrics.absolute_dp import compute_errors_test_depth as ours_fn

    p = problem
    ref_mod = runpy.run_path(str(REF / "src/metric/absolute_dp/metric.py"))
    pred_depth = p["depth"] * np.random.default_rng(2).uniform(0.95, 1.05, p["depth"].shape)
    ref = ref_mod["compute_errors_test_depth"](p["depth"], pred_depth, p["mask"], 1.01)
    ours = ours_fn(p["depth"], pred_depth, p["mask"], 1.01)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_normal_metric_parity(problem):
    import runpy

    from dualpixelface_tpu.metrics.normal_dp import cal_normal_acc

    p = problem
    ref_mod = runpy.run_path(str(REF / "src/metric/normal_dp/metric.py"))
    gt_t = torch.from_numpy(np.moveaxis(p["normal_gt"], -1, 1))
    pr_t = torch.from_numpy(np.moveaxis(p["normal_pred"], -1, 1))
    mask_t = torch.from_numpy(p["mask"][:, None])
    ref_mean = float(ref_mod["calNormalAcc"](gt_t, pr_t, mask_t))
    ref_rmse = float(ref_mod["calNormalAccRMSE"](gt_t, pr_t, mask_t))
    mean, rmse = cal_normal_acc(p["normal_gt"], p["normal_pred"], p["mask"])
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-4)
    np.testing.assert_allclose(rmse, ref_rmse, rtol=1e-4)


def test_affine_metric_parity(problem):
    tf = pytest.importorskip("tensorflow")
    import runpy

    from dualpixelface_tpu.metrics.affine_dp import metrics as our_metrics

    p = problem
    ref_mod = runpy.run_path(str(REF / "src/metric/affine_dp/metric.py"))
    pred = p["disp"] + np.random.default_rng(3).normal(0, 0.05, p["disp"].shape)
    pred = pred.astype(np.float32)
    target = p["idepth"]
    conf = p["mask"]
    ref = ref_mod["metrics"](pred, target, conf)
    ours = our_metrics(pred, target, conf)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)
