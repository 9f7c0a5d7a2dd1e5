"""FaceDPLoader against an on-disk RCV fixture tree (real file IO path)."""
import numpy as np
import pytest

from dualpixelface_tpu.data.loader_selector import loader_selector
from dualpixelface_tpu.data.SyntheticDP.fixture import write_fixture_tree
from tests.test_end_to_end import tiny_option


@pytest.fixture(scope="module")
def facedp_opt(tmp_path_factory):
    root = tmp_path_factory.mktemp("rcv_fixture")
    write_fixture_tree(root, n_train=4, n_test=2, height=96, width=96)
    opt = tiny_option(model_name="stereonet")
    # retarget the FaceDP dataset config at the fixture
    from dualpixelface_tpu.config import Configuration

    cfg = Configuration(
        "train_faceDP", make_workspace=False,
        overrides={"model_name": "stereonet", "use_raw": True, "use_albedo": False},
    )
    cfg.data["dataset"]["path"] = str(root)
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    return cfg.get_config()


def test_scan_and_load_train(facedp_opt):
    ds = loader_selector(facedp_opt, training=True)
    assert len(ds) == 4
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    for key in ("left", "right", "center", "depth", "mask", "disp", "idepth",
                "normal", "K", "P", "abvalue", "metadata", "L", "coords",
                "raw_left", "raw_depth", "pathname"):
        assert key in s, key
    assert s["left"].shape[-1] == 3 and s["left"].ndim == 3
    # crop is a factor-32 multiple at ratio 0.75 of 96 -> 64
    assert s["left"].shape[0] % 32 == 0
    # abvalue [b, a] consistency with disparity inside mask
    m = s["raw_mask"] > 0
    b_term, a_term = s["abvalue"]
    np.testing.assert_allclose(
        s["raw_disp"][m], a_term / s["raw_depth"][m] + b_term, rtol=1e-3, atol=1e-2
    )


def test_scan_cache_and_groupname(facedp_opt):
    ds = loader_selector(facedp_opt, training=False)
    assert len(ds) == 2
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["groupname"] == "group_test"
    # the scan cache file was written next to the dataset
    from pathlib import Path

    assert (Path(facedp_opt.dataset.path) / "FaceDP_test_single.npy").is_file()
    # second instantiation loads from cache
    ds2 = loader_selector(facedp_opt, training=False)
    assert len(ds2) == 2


def test_filtering_by_dataset_options(facedp_opt):
    from dualpixelface_tpu.config import Configuration

    cfg = Configuration("train_faceDP", make_workspace=False, overrides={"model_name": "stereonet"})
    cfg.data["dataset"]["path"] = facedp_opt.dataset.path
    cfg.data["dataset"]["gender"] = ["w"]  # only even-index fixture samples
    opt = cfg.get_config()
    ds_cls = type(loader_selector(facedp_opt, training=True))
    # force rescan by bypassing the cache name (different flags -> same cache
    # file, so construct the reader directly)
    from dualpixelface_tpu.data.FaceDP.path_reader import RCVDPReader

    reader = RCVDPReader(opt, opt.dataset.path, True)
    records, n = reader.read_rcv_path()
    assert n == 2  # half of 4 train samples are gender 'w'
