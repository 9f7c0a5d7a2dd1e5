"""Shared model scaffold helpers.

Every reference mainmodel starts its forward with the same left/right
ref/target selection driven by dataset.flip_lr plus a test-time exception for
group '2020-2-9_group20' (ref src/model/stereodpnet/mainmodel.py:70-83 and the
identical block in every other model). Under jit the group name is host-only
data, so the exception is applied by `apply_group_swap` on the host batch
before device placement, and the in-graph selection uses only the static
flip_lr flag.
"""
from __future__ import annotations

SWAP_GROUP = "2020-2-9_group20"


def select_ref_target(batch: dict, option):
    """(ref, target) images per dataset.flip_lr (static)."""
    if option.dataset.flip_lr:
        return batch["right"], batch["left"]
    return batch["left"], batch["right"]


def apply_group_swap(batch: dict, training: bool) -> dict:
    """Host-side: swap left/right for the revised test group
    (ref mainmodel.py:70-76). No-op during training or without groupname."""
    if training or "groupname" not in batch:
        return batch
    names = batch["groupname"]
    if isinstance(names, (list, tuple)) and len(names) > 0 and names[0] == SWAP_GROUP:
        batch = dict(batch)
        batch["left"], batch["right"] = batch["right"], batch["left"]
    return batch
