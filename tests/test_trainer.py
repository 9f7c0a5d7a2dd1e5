"""Trainer end-to-end: fit + test + workspace artifacts + checkpoint resume."""
import json
import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_trainer_fit_test_artifacts(tmp_path):
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.train import Trainer

    # tiny synthetic run with a real workspace rooted in tmp
    (tmp_path / "configs").mkdir()
    src = Path(__file__).resolve().parent.parent / "configs" / "train_synthetic_stereonet.json"
    cfg_data = json.loads(src.read_text())
    cfg_data.update(epoch=1, batch_size=4, workers=2)
    (tmp_path / "configs" / "tiny.json").write_text(json.dumps(cfg_data))

    cfg = Configuration("tiny", workspace="t1", root=tmp_path, make_workspace=True)
    cfg.data["dataset"]["height"] = 96
    cfg.data["dataset"]["width"] = 96
    cfg.data["dataset"]["train_samples"] = 8
    cfg.data["dataset"]["test_samples"] = 4
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    opt = cfg.get_config()

    trainer = Trainer(opt)
    trainer.fit(epochs=1)
    agg = trainer.test()

    ws = tmp_path / "workspace" / "stereonet" / "t1"
    assert (ws / "output" / "log_text.txt").exists()
    assert (ws / "output" / "metrics.jsonl").exists()
    ckpts = list((ws / "checkpoints").glob("checkpoint_*"))
    assert len(ckpts) == 1
    assert "absolute_dp" in agg

    lines = [json.loads(l) for l in (ws / "output" / "metrics.jsonl").read_text().splitlines()]
    assert any(l.get("mode") == "train" for l in lines)
    assert any(l.get("mode") == "test" for l in lines)

    # auto-resume: a fresh Trainer on the same workspace with auto_resume
    # continues from the saved epoch instead of restarting
    cfg_r = Configuration(
        "tiny", workspace="t1", root=tmp_path, make_workspace=True,
        overrides={"auto_resume": True, "epoch": 2},
    )
    cfg_r.data["dataset"]["height"] = 96
    cfg_r.data["dataset"]["width"] = 96
    cfg_r.data["dataset"]["train_samples"] = 8
    cfg_r.data["dataset"]["test_samples"] = 4
    cfg_r.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    tr_r = Trainer(cfg_r.get_config())
    path, last_epoch = tr_r.latest_checkpoint()
    assert last_epoch == 0 and path is not None
    tr_r.fit()  # runs only epoch 1 (resumes after epoch 0)
    ckpts2 = sorted((ws / "checkpoints").glob("checkpoint_*"))
    assert len(ckpts2) == 2

    # test-only run restoring the checkpoint (the --load_model path)
    cfg2 = Configuration(
        "tiny", workspace="t1", root=tmp_path, make_workspace=True,
        load_model=str(ckpts[0]), overrides={"mode": "test"},
    )
    cfg2.data["dataset"]["height"] = 96
    cfg2.data["dataset"]["width"] = 96
    cfg2.data["dataset"]["test_samples"] = 4
    cfg2.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    opt2 = cfg2.get_config()
    trainer2 = Trainer(opt2)
    agg2 = trainer2.test()
    assert "absolute_dp" in agg2
    # restored params produce identical metrics to the in-memory state
    np.testing.assert_allclose(
        list(agg["absolute_dp"].values()), list(agg2["absolute_dp"].values()), rtol=1e-4
    )
