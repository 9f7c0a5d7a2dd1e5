"""Model zoo registry (ref src/model/model_selector.py:8-28).

The reference run_path-loads src/model/<name>/mainmodel.py and instantiates
the upper-cased class. Here models self-register by name; `model_selector`
returns the Flax module (construction only — parameter init, checkpoint
restore and train/test wiring live in dualpixelface_tpu.train).
"""
from __future__ import annotations

_MODEL_REGISTRY: dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        _MODEL_REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return deco


def available_models() -> list[str]:
    return sorted(_MODEL_REGISTRY)


def model_selector(option):
    _ensure_imported()
    name = option.model_name
    if name not in _MODEL_REGISTRY:
        raise NotImplementedError(f"model {name!r} not registered; have {available_models()}")
    return _MODEL_REGISTRY[name](option=option)


def _ensure_imported():
    from dualpixelface_tpu.models.stereonet import mainmodel as _stereonet  # noqa: F401

    for _name in ("psmnet", "dpnet", "nnet", "bts", "stereodpnet", "stereodpnet_plus"):
        try:
            __import__(f"dualpixelface_tpu.models.{_name}.mainmodel")
        except ImportError:
            pass
