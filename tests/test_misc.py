"""Small behavioral units: group swap, eval padding, config validation."""
import numpy as np
import pytest

from dualpixelface_tpu.models.base import SWAP_GROUP, apply_group_swap


def test_apply_group_swap():
    batch = {"left": np.zeros(3), "right": np.ones(3), "groupname": [SWAP_GROUP]}
    out = apply_group_swap(dict(batch), training=False)
    np.testing.assert_array_equal(out["left"], np.ones(3))
    np.testing.assert_array_equal(out["right"], np.zeros(3))
    # training mode: no swap even for the revised group
    out = apply_group_swap(dict(batch), training=True)
    np.testing.assert_array_equal(out["left"], np.zeros(3))
    # other groups: no swap
    other = dict(batch, groupname=["group_x"])
    out = apply_group_swap(other, training=False)
    np.testing.assert_array_equal(out["left"], np.zeros(3))


def test_pipeline_pads_last_batch_with_valid_mask():
    from dualpixelface_tpu.data.pipeline import DataPipeline

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i, rng=None):
            return {"x": np.full((2, 2), i, np.float32)}

    pipe = DataPipeline(DS(), batch_size=4, shuffle=False, num_workers=1, drop_last=False)
    batches = list(pipe)
    assert len(batches) == 2
    assert batches[0]["_valid"].all()
    assert batches[1]["_valid"].tolist() == [True, False, False, False]
    # padded entries repeat the last real sample
    np.testing.assert_array_equal(batches[1]["x"][1], batches[1]["x"][0])


def test_pipeline_propagates_worker_errors():
    from dualpixelface_tpu.data.pipeline import DataPipeline

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng=None):
            raise RuntimeError("boom")

    pipe = DataPipeline(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(pipe)


def test_config_validate():
    from dualpixelface_tpu.config import Configuration

    cfg = Configuration("train_synthetic_stereonet", make_workspace=False)
    cfg.validate()  # ok
    cfg.data["optim"] = "adagrad"
    with pytest.raises(RuntimeError, match="option_check"):
        cfg.validate()
    cfg.data["optim"] = "adam"
    cfg.data["batch_size"] = 0
    with pytest.raises(RuntimeError, match="range_check"):
        cfg.validate()
