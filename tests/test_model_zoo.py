"""Model-zoo shape/loss smoke tests (psmnet, dpnet, ...)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_end_to_end import tiny_option
from tests.test_stereodpnet import make_batch


def run_model(model_name, batch_np, train_shapes, eval_shapes, overrides=None, model_overrides=None):
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector

    opt = tiny_option(model_name=model_name, **(overrides or {}))
    if model_overrides:
        for k, v in model_overrides.items():
            setattr(opt.model, k, v)
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    results = model.apply(variables, batch, train=False)
    assert results["pred_depth"].shape == eval_shapes, results["pred_depth"].shape
    assert np.isfinite(np.asarray(results["pred_depth"])).all()

    results_t, mutated = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert results_t["pred_depth"].shape == train_shapes, results_t["pred_depth"].shape

    loss_bank = loss_selector(opt)
    losses = loss_bank(results_t, batch)
    assert np.isfinite(float(losses["final_loss"]))
    return opt, model, variables, results


def test_psmnet_concat():
    b, h, w = 1, 64, 64
    batch = make_batch(b, h, w)
    # inplanes=8 keeps the SPP pool kernels (2C..C/4 = 16..2) within the
    # 16x16 quarter-res test features (the reference derives pools from C)
    run_model(
        "psmnet", batch,
        train_shapes=(b, 3, h, w), eval_shapes=(b, 1, h, w),
        model_overrides={"inplanes": 8},
    )


def test_psmnet_gwc():
    b, h, w = 1, 64, 64
    batch = make_batch(b, h, w)
    run_model(
        "psmnet", batch,
        train_shapes=(b, 3, h, w), eval_shapes=(b, 1, h, w),
        model_overrides={"inplanes": 8, "cost_volume": "gwcnet", "group_num": 4},
    )


def test_dpnet():
    b, h, w = 1, 96, 96
    batch = make_batch(b, h, w)
    run_model(
        "dpnet", batch,
        train_shapes=(b, 5, h, w), eval_shapes=(b, 5, h, w),
    )


def test_nnet():
    b, h, w = 1, 64, 64
    batch = make_batch(b, h, w)
    opt, model, variables, results = run_model(
        "nnet", batch,
        train_shapes=(b, 2, h, w), eval_shapes=(b, 2, h, w),
        overrides={"use_normal": True},
        model_overrides={"inplanes": 8},
    )
    assert results["pred_normal"].shape == (b, 1, h, w, 3)
    n = np.asarray(results["pred_normal"])
    np.testing.assert_allclose(np.linalg.norm(n[0, 0], axis=-1), 1.0, atol=1e-4)


def test_bts():
    b, h, w = 1, 64, 64
    batch = make_batch(b, h, w)
    opt, model, variables, results = run_model(
        "bts", batch,
        train_shapes=(b, 1, h, w), eval_shapes=(b, 1, h, w),
        model_overrides={"bts_size": 64},
    )
    d = np.asarray(results["pred_depth"])
    assert (d >= opt.model.min_depth - 1e-3).all() and (d <= opt.model.max_depth + 1e-3).all()


def test_bts_densenet():
    b, h, w = 1, 64, 64
    batch = make_batch(b, h, w)
    run_model(
        "bts", batch,
        train_shapes=(b, 1, h, w), eval_shapes=(b, 1, h, w),
        model_overrides={"bts_size": 64, "encoder": "densenet121_bts"},
    )


def test_model_registry_lists_all():
    from dualpixelface_tpu.models import _ensure_imported, available_models

    _ensure_imported()
    have = set(available_models())
    for name in ("stereonet", "stereodpnet", "psmnet", "dpnet"):
        assert name in have, f"{name} missing from registry {have}"
