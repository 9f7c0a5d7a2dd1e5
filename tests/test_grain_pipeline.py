"""Grain-backed pipeline: same contract as the thread pipeline."""
import numpy as np
import pytest

pytest.importorskip("grain")

from dualpixelface_tpu.data.grain_pipeline import GrainPipeline, make_pipeline
from dualpixelface_tpu.data.loader_selector import loader_selector
from tests.test_end_to_end import tiny_option


def test_grain_pipeline_batches():
    opt = tiny_option()
    ds = loader_selector(opt, training=True)
    pipe = GrainPipeline(ds, batch_size=4, shuffle=True, seed=7, num_workers=0, drop_last=True)
    pipe.set_epoch(0)
    batches = list(pipe)
    assert len(batches) == len(pipe)
    b = batches[0]
    assert b["left"].shape[0] == 4 and b["left"].shape[-1] == 3
    assert b["_valid"].all()

    # deterministic across re-iteration of the same epoch (single reader
    # thread -> bitwise; multi-threaded readers are ULP-deterministic)
    again = list(pipe)
    np.testing.assert_allclose(batches[0]["left"], again[0]["left"], atol=3e-7)

    # different epoch -> different order
    pipe.set_epoch(1)
    other = list(pipe)
    assert not np.array_equal(batches[0]["left"], other[0]["left"])


def test_grain_pipeline_pads_last_batch():
    opt = tiny_option()
    ds = loader_selector(opt, training=False)  # test_samples = batch*1 = 8 -> force odd
    pipe = GrainPipeline(ds, batch_size=5, shuffle=False, num_workers=0, drop_last=False)
    batches = list(pipe)
    assert batches[-1]["_valid"].sum() == len(ds) - 5 * (len(batches) - 1)


def test_make_pipeline_selects_kind():
    from dualpixelface_tpu.data.pipeline import DataPipeline

    opt = tiny_option()
    ds = loader_selector(opt, training=True)
    assert isinstance(make_pipeline(opt, ds, True), DataPipeline)
    opt2 = tiny_option(data_pipeline="grain")
    assert isinstance(make_pipeline(opt2, ds, True), GrainPipeline)
