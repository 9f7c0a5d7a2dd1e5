"""Loss registry (ref src/loss/loss_selector.py:7-41).

The reference scans src/loss/{depth,normal}/*.py and instantiates
`<STEM>Loss` classes by upper-cased filename. Here each loss module
self-registers by name via @register_loss; `loss_selector(option)` builds a
LossBank that evaluates every configured loss, weights them by
option.model.lambdas into `final_loss`, exposes per-loss `<name>_loss` keys
and passes through `abvalue` — the same output contract the reference models
consume (stereodpnet/mainmodel.py:107-109).

All losses are pure jittable functions of (results, batch).
"""
from __future__ import annotations

from typing import Callable

_LOSS_REGISTRY: dict[str, Callable] = {}


def register_loss(name: str):
    def deco(cls):
        _LOSS_REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return deco


def available_losses() -> list[str]:
    return sorted(_LOSS_REGISTRY)


class LossBank:
    """Weighted combination of registered losses (ref loss_selector.py:29-41)."""

    def __init__(self, option):
        names = list(option.model.loss_type)
        lambdas = list(option.model.lambdas)
        assert len(names) == len(lambdas), "loss_type and lambdas length mismatch"
        # BTS trains/evaluates on metric depth; the reference hardcodes
        # target_type='depth' in its steps (bts/mainmodel.py:52-54,106-108) —
        # here it's a model-config field
        self.target_type = option.model.get("target_type", "disp")
        self.entries = []
        for name, lam in zip(names, lambdas):
            if name not in _LOSS_REGISTRY:
                raise NotImplementedError(f"loss {name!r} not registered; have {available_losses()}")
            self.entries.append((name, lam, _LOSS_REGISTRY[name](option)))

    def __call__(self, results: dict, batch: dict) -> dict:
        out: dict = {}
        total = 0.0
        for name, lam, loss in self.entries:
            res = loss(results, batch, target_type=self.target_type)
            total = total + lam * res["loss"]
            out[f"{name}_loss"] = res["loss"]
            if "abvalue" in res:
                out["abvalue"] = res["abvalue"]
        out["final_loss"] = total
        return out


def loss_selector(option) -> LossBank:
    return LossBank(option)


# self-registration imports (keep at bottom)
from dualpixelface_tpu.losses import cosine, silog, smoothl1  # noqa: E402,F401

try:  # folded multi-view loss arrives with the multi-view data path
    from dualpixelface_tpu.losses import folded  # noqa: E402,F401
except ImportError:  # pragma: no cover
    pass
