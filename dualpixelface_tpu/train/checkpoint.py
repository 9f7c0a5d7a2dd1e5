"""Orbax checkpointing: {params, batch_stats, opt_state, step} every epoch,
keep-all (ref main.py:35-40 ModelCheckpoint(save_top_k=-1, period=1));
restore supports strict and partial (non-strict) loading
(ref src/model/model_selector.py:17-26).
"""
from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from dualpixelface_tpu.utils.file_manager import error_handler


def checkpoint_name(epoch: int) -> str:
    return f"checkpoint_{epoch:02d}"


def save_checkpoint(ckpt_dir: str, state, epoch: int):
    path = (Path(ckpt_dir) / checkpoint_name(epoch)).absolute()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return str(path)


def restore_checkpoint(path: str, state, strict: bool = True):
    """Restore into an existing abstract state. strict=False keeps current
    values for any missing/mismatched leaves."""
    path = Path(path).absolute()
    error_handler(path.exists(), f"checkpoint {path} not found", __name__, True)
    reference = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, reference)
    with ocp.PyTreeCheckpointer() as ckptr:
        if strict:
            restored = ckptr.restore(path, item=abstract)
        else:
            try:
                restored = ckptr.restore(path, item=abstract)
            except Exception:
                loose = ckptr.restore(path)
                restored = _merge(reference, loose)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def _merge(reference, loaded):
    """Overlay loaded leaves onto the reference tree where paths+shapes match."""
    if isinstance(reference, dict) and isinstance(loaded, dict):
        return {
            k: _merge(reference[k], loaded[k]) if k in loaded else reference[k]
            for k in reference
        }
    if hasattr(reference, "shape") and hasattr(loaded, "shape"):
        return loaded if tuple(reference.shape) == tuple(loaded.shape) else reference
    return loaded if loaded is not None else reference
