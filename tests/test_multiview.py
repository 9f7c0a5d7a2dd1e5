"""Multi-view data path + folded loss end-to-end (use_multi pipeline)."""
import numpy as np
import pytest

from dualpixelface_tpu.config import Configuration
from dualpixelface_tpu.data.loader_selector import loader_selector
from dualpixelface_tpu.data.pipeline import DataPipeline, numeric_batch
from dualpixelface_tpu.data.SyntheticDP.fixture import write_fixture_tree


@pytest.fixture(scope="module")
def multi_opt(tmp_path_factory):
    root = tmp_path_factory.mktemp("rcv_multi")
    write_fixture_tree(root, n_train=2, n_test=1, height=96, width=96, cams=(1, 2, 3))
    cfg = Configuration(
        "train_faceDP", make_workspace=False,
        overrides={
            "model_name": "dpnet",
            "model_config": "config_multi",
            "use_multi": True,
            "use_raw": True,
            "select_view": [1, 2, 3],
        },
    )
    cfg.data["dataset"]["path"] = str(root)
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 96
    cfg.data["crop_aug"]["soft_crop"]["crop_ratio"] = 1.0
    # folded training needs the reference views' center images
    cfg.data["multi_view"]["use_center_img"] = True
    # folded loss alongside smoothL1 (the use_multi training setup)
    cfg.data["model"]["loss_type"] = ["smoothL1", "folded"]
    cfg.data["model"]["lambdas"] = [1.0, 0.1]
    cfg.data["model"]["num_neighbor_view"] = 2
    return cfg.get_config()


def test_multiview_sample_keys(multi_opt):
    ds = loader_selector(multi_opt, training=True)
    assert len(ds) == 6  # 2 view indices x 3 cams
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    for key in ("lefts", "rights", "centers", "depths", "masks", "Ks", "Ps"):
        assert key in s, key
    assert s["centers"].shape[0] == 3  # 3 reference views
    assert s["Ks"].shape == (3, 3, 3)
    assert s["Ps"].shape == (3, 4, 4)


@pytest.mark.slow
def test_folded_loss_e2e(multi_opt):
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    ds = loader_selector(multi_opt, training=True)
    pipe = DataPipeline(ds, batch_size=2, shuffle=False, num_workers=2, drop_last=True)
    batch = next(iter(pipe))
    batch = {k: jnp.asarray(v) for k, v in numeric_batch(batch).items() if k != "_valid"}

    model = model_selector(multi_opt)
    state = create_train_state(model, multi_opt, batch, steps_per_epoch=1)
    step = make_train_step(model, loss_selector(multi_opt))
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["final_loss"]))
    assert "folded_loss" in losses and np.isfinite(float(losses["folded_loss"]))
