"""Every zoo model through the FULL Trainer (fit 1 epoch + test) on the
8-device CPU mesh — catches model-specific loss/metric/key wiring that
step-level tests can miss."""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _make_opt(tmp_path, model_name, **model_over):
    from dualpixelface_tpu.config import Configuration

    (tmp_path / "configs").mkdir(exist_ok=True)
    src = Path(__file__).resolve().parent.parent / "configs" / "train_synthetic_stereonet.json"
    cfg_data = json.loads(src.read_text())
    cfg_data.update(epoch=1, batch_size=4, workers=2, model_name=model_name,
                    use_normal=model_name in ("stereodpnet", "nnet"))
    (tmp_path / "configs" / "tiny.json").write_text(json.dumps(cfg_data))

    cfg = Configuration("tiny", workspace=f"zoo_{model_name}", root=tmp_path, make_workspace=True)
    cfg.data["dataset"].update(height=96, width=96, train_samples=8, test_samples=4)
    cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
    for k, v in model_over.items():
        cfg.data["model"][k] = v
    return cfg.get_config()


@pytest.mark.slow
@pytest.mark.parametrize(
    "model_name,model_over",
    [
        ("psmnet", {"inplanes": 8}),
        ("dpnet", {}),
        ("nnet", {"inplanes": 8}),
        ("bts", {"bts_size": 64}),
    ],
)
def test_zoo_model_full_trainer(tmp_path, model_name, model_over):
    from dualpixelface_tpu.train import Trainer

    opt = _make_opt(tmp_path, model_name, **model_over)
    trainer = Trainer(opt)
    trainer.fit(epochs=1)
    agg = trainer.test()
    assert "absolute_dp" in agg
    assert np.isfinite(agg["absolute_dp"]["abs_rel"])
    ws = tmp_path / "workspace" / model_name / f"zoo_{model_name}"
    assert list((ws / "checkpoints").glob("checkpoint_*"))
