"""Dataset loader registry (ref dataloader/loader_selector.py:8-16).

The reference dynamically imports dataloader/<name>/loader.py and instantiates
`<name>Loader`. Here datasets self-register by name; `loader_selector(option,
training)` resolves option.dataset_name. Same plug-in surface, no runpy.
"""
from __future__ import annotations

_LOADER_REGISTRY: dict[str, type] = {}


def register_loader(name: str):
    def deco(cls):
        _LOADER_REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return deco


def available_loaders() -> list[str]:
    return sorted(_LOADER_REGISTRY)


def loader_selector(option, training: bool):
    name = option.dataset_name
    _ensure_imported()
    if name not in _LOADER_REGISTRY:
        raise NotImplementedError(f"dataset {name!r} not registered; have {available_loaders()}")
    return _LOADER_REGISTRY[name](option, training)


def _ensure_imported():
    from dualpixelface_tpu.data.FaceDP import loader as _face  # noqa: F401
    from dualpixelface_tpu.data.SyntheticDP import loader as _synth  # noqa: F401
