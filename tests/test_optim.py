"""Optimizer / scheduler selector math (ref model_selector.py:31-58 parity)."""
import math

import numpy as np
import pytest

from tests.test_end_to_end import tiny_option


def test_steplr_halves_every_35_epochs():
    from dualpixelface_tpu.train.optim import scheduler_selector

    opt = tiny_option(init_lr=1e-4, scheduler="steplr")
    fn = scheduler_selector(opt, steps_per_epoch=10)
    assert fn(0) == 1e-4
    assert fn(34 * 10) == 1e-4
    np.testing.assert_allclose(fn(35 * 10), 5e-5)
    np.testing.assert_allclose(fn(70 * 10), 2.5e-5)


def test_explr_halves_every_epoch():
    from dualpixelface_tpu.train.optim import scheduler_selector

    opt = tiny_option(init_lr=1e-3, scheduler="explr")
    fn = scheduler_selector(opt, steps_per_epoch=4)
    np.testing.assert_allclose(fn(0), 1e-3)
    np.testing.assert_allclose(fn(4), 5e-4)
    np.testing.assert_allclose(fn(8), 2.5e-4)


def test_cosanneal_endpoints():
    from dualpixelface_tpu.train.optim import scheduler_selector

    opt = tiny_option(init_lr=1e-3, scheduler="cosanneal")
    fn = scheduler_selector(opt, steps_per_epoch=1)
    np.testing.assert_allclose(fn(0), 1e-3)
    np.testing.assert_allclose(fn(500), 1e-6, rtol=1e-3)  # T_max=500, eta_min
    mid = fn(250)
    np.testing.assert_allclose(mid, (1e-3 + 1e-6) / 2, rtol=1e-2)


def test_optimizer_variants_build_and_step():
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.train.optim import optimizer_selector

    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.full((4, 4), 0.1)}
    for name in ("adam", "sgd", "rmsprop"):
        opt = tiny_option(optim=name, scheduler="none")
        tx = optimizer_selector(opt, steps_per_epoch=1)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()

    with pytest.raises(NotImplementedError):
        optimizer_selector(tiny_option(optim="nope"), 1)


def test_config_four_layer_merge():
    """All four JSON layers land in the merged tree (ref config_manager.py)."""
    opt = tiny_option(model_name="stereodpnet")
    # main layer
    assert opt.mode == "train" and opt.optim == "adam"
    # model layer
    assert opt.model.level == 8 and opt.model.asm_activation == "sigmoid"
    # dataset layer
    assert opt.dataset.dp_conversion == "given"
    # augmentation preset layer
    assert opt.crop_aug.method == "random_crop"
    assert opt.photo_aug.light is True
    # derived
    assert opt.sync_batch is True


def test_conf_weighting_path():
    """use_conf: losses multiply pred/gt by the confidence map (ref smoothL1.py:35-38)."""
    import jax.numpy as jnp

    from dualpixelface_tpu.losses.smoothl1 import SmoothL1Loss

    opt = tiny_option(model_name="stereonet")
    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 8
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    disp = (ab[:, 1:2, None] / depth + ab[:, 0:1, None]).astype(np.float32)
    pred = disp[:, None] + 0.1
    base = {
        "mask": jnp.ones((b, h, w)), "disp": jnp.asarray(disp),
        "depth": jnp.asarray(depth), "idepth": jnp.asarray(depth.max() / depth),
        "abvalue": jnp.asarray(ab),
    }
    loss = SmoothL1Loss(opt)
    l_no = float(loss({"pred_depth": jnp.asarray(pred)}, base)["loss"])
    with_conf = dict(base, conf=jnp.full((b, h, w), 0.5))
    l_conf = float(loss({"pred_depth": jnp.asarray(pred)}, with_conf)["loss"])
    # conf scales both pred and gt -> residual scales by conf; in the
    # quadratic smooth-L1 region (|r| < 1) the loss scales by conf^2
    np.testing.assert_allclose(l_conf, l_no * 0.25, rtol=1e-5)
