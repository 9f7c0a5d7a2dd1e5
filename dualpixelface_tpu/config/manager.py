"""4-layer JSON configuration system.

Preserves the reference's config surface (ref config_/config_manager.py:8-95):
a main run config (configs/<name>.json) is merged with the selected model's
config (dualpixelface_tpu/models/<model>/<model_config>.json), the selected
dataset's config (dualpixelface_tpu/data/<dataset>/<dataset_config>.json) and
the named augmentation preset (dualpixelface_tpu/data/preprocess/<aug>.json),
then wrapped in a recursive attribute-access `Config`.

TPU-first deviations from the reference:
  * `accelerator` accepts 'jit' (single host, all local devices through one
    pjit program over a 1-D `data` mesh). The reference's 'dp'/'ddp' values
    are accepted as aliases of 'jit' — in a global-view pjit formulation the
    DP/DDP distinction disappears and BatchNorm is cross-replica by
    construction (ref config_manager.py:57 derives sync_batch from 'ddp').
  * `precision` accepts 32 or 'bf16' (TPU-native mixed precision; no AMP/
    loss-scaling needed, ref main.py:53,56).
"""
from __future__ import annotations

import copy
import json
from pathlib import Path

from dualpixelface_tpu.utils.file_manager import error_handler, makedir_custom, setup_logger

PACKAGE_ROOT = Path(__file__).resolve().parent.parent
REPO_ROOT = PACKAGE_ROOT.parent


class Config:
    """Recursive attribute-access wrapper over a dict (ref config.py:4-10)."""

    def __init__(self, d: dict):
        self._raw = d
        for key, value in d.items():
            if isinstance(value, (list, tuple)):
                setattr(
                    self,
                    key,
                    [Config(x) if isinstance(x, dict) else x for x in value],
                )
            else:
                setattr(self, key, Config(value) if isinstance(value, dict) else value)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._raw)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def __contains__(self, key):
        return key in self._raw

    def __repr__(self):
        return f"Config({json.dumps(self._raw, default=str, indent=2)})"


def _load_json(path: Path) -> dict:
    with open(path) as f:
        return json.load(f)


class Configuration:
    """Merge the 4 JSON layers into one config tree and set up the workspace.

    Mirrors ref config_/config_manager.py:17-95, with workspace layout
    workspace/<model_name>/<workspace>/{log, output, checkpoints}.
    """

    def __init__(
        self,
        config: str,
        workspace: str = "default",
        load_model: str | None = None,
        root: Path | str | None = None,
        make_workspace: bool = True,
        overrides: dict | None = None,
    ):
        self.root = Path(root) if root is not None else REPO_ROOT
        self.data: dict = {"model": {}, "dataset": {}}
        self.workspace = workspace

        config_path = Path(config)
        if not config_path.is_file():
            config_path = self.root / "configs" / (config + ".json")
        error_handler(config_path.is_file(), f"invalid config name: {config}", __name__, True)
        self.config_path = config_path

        self.data["load_model"] = str(Path(load_model).absolute()) if load_model else None
        self._initialize(make_workspace, overrides)

    def _initialize(self, make_workspace: bool, overrides: dict | None = None):
        self.data.update(_load_json(self.config_path))
        # overrides land before the dependent model/dataset/aug layers resolve,
        # so overriding model_name etc. picks up the right sub-configs
        if overrides:
            self.data.update(overrides)

        # TPU-native: sync batchnorm is implicit in the global-view pjit
        # formulation; keep the flag for config parity (ref config_manager.py:57).
        self.data["sync_batch"] = True

        if make_workspace:
            root_path = makedir_custom(self.root / "workspace")
            model_path = makedir_custom(root_path / self.data["model_name"])
            workspace_path = makedir_custom(model_path / self.workspace)
            logger_path = makedir_custom(workspace_path / "log")
            output_path = makedir_custom(workspace_path / "output")
            ckpt_path = makedir_custom(workspace_path / "checkpoints")
            logger_text = setup_logger("train_log", str(output_path / "log_text.txt"))
            logger_text.info("config=%s workspace=%s", self.config_path, self.workspace)
            self.data.update(
                {
                    "model_path": str(model_path),
                    "workspace_path": str(workspace_path),
                    "logger_path": str(logger_path),
                    "output_path": str(output_path),
                    "ckpt_path": str(ckpt_path),
                }
            )

        # model config layer (ref config_manager.py:70-72)
        model_cfg = (
            PACKAGE_ROOT
            / "models"
            / self.data["model_name"]
            / (self.data.get("model_config", "config") + ".json")
        )
        error_handler(model_cfg.is_file(), f"invalid model config: {model_cfg}", __name__, True)
        self.data["model"] = _load_json(model_cfg)

        # dataset config layer (ref config_manager.py:75-77)
        data_cfg = (
            PACKAGE_ROOT
            / "data"
            / self.data["dataset_name"]
            / (self.data.get("dataset_config", "config") + ".json")
        )
        error_handler(data_cfg.is_file(), f"invalid dataset config: {data_cfg}", __name__, True)
        self.data["dataset"] = _load_json(data_cfg)

        # augmentation preset layer (ref config_manager.py:80-84)
        if "augmentation" in self.data:
            preset = _load_json(
                PACKAGE_ROOT / "data" / "preprocess" / (self.data["augmentation_config"] + ".json")
            )
            for aug in self.data["augmentation"]:
                if aug in preset:
                    self.data[aug] = preset[aug]

    def option_check(self, value, options=None):
        """Validation hook (ref config_manager.py:39-41 — present there but
        unused; functional here)."""
        error_handler(value in (options or ()), f"option_check failed: {value}", __name__, True)

    def range_check(self, value, min=None, max=None):
        """Validation hook (ref config_manager.py:43-46)."""
        if min is not None:
            error_handler(value >= min, "range_check failed", __name__, True)
        if max is not None:
            error_handler(value <= max, "range_check failed", __name__, True)

    def validate(self):
        """Minimal semantic validation of the merged config."""
        self.option_check(self.data.get("mode"), ("train", "test", "demo"))
        self.option_check(self.data.get("optim"), ("adam", "sgd", "rmsprop"))
        self.range_check(self.data.get("batch_size", 1), min=1)
        self.range_check(self.data.get("init_lr", 1e-4), min=0.0)

    def update(self, config: dict | None):
        if config is not None:
            self.data.update(config)

    def get_config(self) -> Config:
        return Config(self.data)


def load_config(name: str, **kwargs) -> Config:
    """One-call convenience: Configuration(name).get_config()."""
    return Configuration(name, **kwargs).get_config()
