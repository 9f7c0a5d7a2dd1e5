"""Filesystem / logging helpers.

Parity target: reference `src/utils/file_manager.py:39-119` (error_handler,
tensor2numpy, makedir_custom, setup_logger). Re-designed minimally: JAX arrays
instead of torch tensors, no iterative-decorator machinery (jax.tree_util
covers pytrees natively).
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import numpy as np


def error_handler(condition: bool, message: str = "", name: str = "", raise_error: bool = True):
    """Assert-style guard matching reference src/utils/file_manager.py:55-71."""
    if condition:
        return
    text = f"[{name}] {message}" if name else message
    if raise_error:
        raise RuntimeError(text)
    print(text, file=sys.stderr)


def tensor2numpy(tree):
    """Convert a pytree of jax/np arrays to numpy (ref file_manager.py:44-52)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def makedir_custom(path, exist_ok: bool = True) -> Path:
    """mkdir -p returning the Path (ref file_manager.py:74-90)."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def setup_logger(name: str, log_file: str, level=logging.INFO) -> logging.Logger:
    """File + stream logger (ref file_manager.py:109-119)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        formatter = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        logger.addHandler(sh)
    return logger
