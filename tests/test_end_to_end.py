"""End-to-end slice: config -> synthetic data -> model -> loss -> train step
-> metrics -> checkpoint round-trip, on the 8-device CPU mesh
(SURVEY.md §7.2 step 3)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dualpixelface_tpu.config import Configuration
from dualpixelface_tpu.data.loader_selector import loader_selector
from dualpixelface_tpu.data.pipeline import DataPipeline, numeric_batch
from dualpixelface_tpu.parallel import get_mesh, shard_batch


def tiny_option(model_name="stereonet", mode="train", batch=8, hw=(96, 96), **over):
    cfg = Configuration(
        "train_synthetic_stereonet",
        workspace="test_ws",
        make_workspace=False,
        overrides=dict(
            model_name=model_name,
            mode=mode,
            batch_size=batch,
            workers=2,
            epoch=1,
            **over,
        ),
    )
    cfg.data["dataset"]["height"] = hw[0]
    cfg.data["dataset"]["width"] = hw[1]
    cfg.data["dataset"]["train_samples"] = batch * 2
    cfg.data["dataset"]["test_samples"] = batch
    # small crops keep CI fast; factor stays 96-friendly via 32
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    return cfg.get_config()


def test_synthetic_pipeline_sample_keys():
    opt = tiny_option()
    ds = loader_selector(opt, training=True)
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    for key in ("left", "right", "center", "depth", "mask", "disp", "idepth", "K", "abvalue"):
        assert key in s, key
    assert s["left"].ndim == 3 and s["left"].shape[-1] == 3  # channels-last
    assert s["depth"].ndim == 2
    # disp = a/depth + b holds inside the mask
    m = s["mask"] > 0
    b, a = s["abvalue"]
    np.testing.assert_allclose(
        s["disp"][m], a / s["depth"][m] + b, rtol=1e-4, atol=1e-3
    )


def test_pipeline_batching_deterministic():
    opt = tiny_option()
    ds = loader_selector(opt, training=True)
    pipe = DataPipeline(ds, batch_size=4, shuffle=True, seed=7, num_workers=2, drop_last=True)
    b1 = [b["left"].copy() for b in pipe]
    b2 = [b["left"].copy() for b in pipe]
    assert len(b1) == len(b2) == len(pipe)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_stereodpnet_full_train_step_on_mesh():
    """The FULL flagship (ANM + deformable convs + smoothL1+cosine losses +
    cross-replica BN) executes a sharded train step on the 8-device CPU mesh
    (VERDICT r3 item 3 — the mesh previously only ever saw shrunk models).
    Tiny 32x32 crop, level 4: the sharding surface is identical to full res."""
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    cfg = Configuration(
        "train_synthetic_stereodpnet",
        workspace="test_ws",
        make_workspace=False,
        overrides=dict(batch_size=8, workers=0, epoch=1),
    )
    cfg.data["model"]["level"] = 4
    cfg.data["dataset"]["height"] = 48  # soft crop ratio 0.75 -> 32 (factor 32)
    cfg.data["dataset"]["width"] = 48
    cfg.data["dataset"]["train_samples"] = 8
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    opt = cfg.get_config()
    assert opt.model.predict_normal and opt.model.use_deform

    mesh = get_mesh()
    assert mesh.devices.size == 8
    ds = loader_selector(opt, training=True)
    pipe = DataPipeline(ds, batch_size=8, shuffle=False, seed=3, num_workers=0, drop_last=True)
    model = model_selector(opt)
    train_step = make_train_step(model, loss_selector(opt))

    with mesh:
        batch = {k: v for k, v in numeric_batch(next(iter(pipe))).items() if k != "_valid"}
        device_batch = shard_batch(batch, mesh)
        state = create_train_state(model, opt, device_batch, steps_per_epoch=1)
        state, losses = train_step(state, device_batch)
        assert np.isfinite(float(losses["final_loss"]))
        # both loss heads contributed (depth + the ANM's cosine normal loss)
        assert "smoothL1_loss" in losses and "cosine_loss" in losses
        assert np.isfinite(float(losses["cosine_loss"]))
        out_dtype = jnp.asarray(losses["final_loss"]).dtype
        assert out_dtype == jnp.float32


@pytest.mark.slow
def test_stereonet_train_eval_checkpoint(tmp_path):
    import jax

    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.metrics import metric_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_eval_step, make_train_step

    opt = tiny_option()
    mesh = get_mesh()
    assert mesh.devices.size == 8

    ds = loader_selector(opt, training=True)
    pipe = DataPipeline(ds, batch_size=8, shuffle=True, seed=1, num_workers=2, drop_last=True)
    model = model_selector(opt)
    loss_bank = loss_selector(opt)
    train_step = make_train_step(model, loss_bank)
    eval_step = make_eval_step(model)

    with mesh:
        batches = list(pipe)
        device_batch = shard_batch({k: v for k, v in numeric_batch(batches[0]).items() if k != "_valid"}, mesh)
        state = create_train_state(model, opt, device_batch, steps_per_epoch=len(pipe))

        losses_first = None
        for i in range(3):
            state, losses = train_step(state, device_batch)
            if losses_first is None:
                losses_first = {k: float(v) for k, v in losses.items()}
        assert np.isfinite(losses_first["final_loss"])

        results = eval_step(state, device_batch)
        assert results["pred_depth"].shape[0] == 8
        assert results["pred_depth"].shape[1] == 2  # coarse + refined

        # metrics digest the results
        bank = metric_selector(opt)
        host_results = jax.tree_util.tree_map(np.asarray, results)
        host_batch = {k: np.asarray(v) for k, v in numeric_batch(batches[0]).items() if k != "_valid"}
        out = bank(host_results, host_batch)
        # rmse_log may be NaN for an untrained model (log of negative depth),
        # identical to the reference's numpy math; check the rest.
        finite = np.isfinite(out["absolute_dp"])
        assert "absolute_dp" in out and finite[[0, 1, 2, 3, 5, 6, 7]].all()
        assert "affine_dp" in out and np.isfinite(out["affine_dp"]).all()

        # checkpoint round-trip
        path = save_checkpoint(str(tmp_path), state, epoch=0)
        state2 = create_train_state(model, opt, device_batch, steps_per_epoch=len(pipe))
        state2 = restore_checkpoint(path, state2, strict=True)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
