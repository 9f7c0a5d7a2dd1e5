"""Cost volume constructions, vectorized over disparity planes.

Parity targets:
  * integer-shift concat volume + group-wise correlation volume:
    ref src/model/psmnet/modules.py:221-263 (build_concat_volume /
    build_gwc_volume; note groupwise_correlation returns NEGATIVE mean)
  * subtraction volume: ref src/model/stereonet/mainmodel.py:100-114
  * ASM sub-pixel concat volume: ref src/model/stereodpnet/modules.py:181-197
    (assembled in the StereoDPNet model from ops.asm primitives)

The DP disparity axis is H (rows). Integer shifts `int(disp)` truncate toward
zero exactly as the reference does. All volumes are emitted channels-last as
[B, D, H, W, C*] — the layout 3-D convolutions want on TPU — and each plane is
a static slice-and-pad, so XLA fuses the whole volume build into one kernel.

`costrange(mindisp, maxdisp, level)` reproduces the reference's quarter-
resolution plane spacing (psmnet/modules.py:182-183, stereodpnet same).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops.asm import shift_h_static


def costrange(mindisp: float, maxdisp: float, level: int) -> np.ndarray:
    """Quarter-resolution disparity plane centers (ref modules.py:144-145)."""
    return (
        np.arange(int(level)) * ((maxdisp / 4.0 - mindisp / 4.0) / float(level))
        + mindisp / 4.0
    )


def regression_disparities(mindisp: float, maxdisp: float, level: int, multiplier: int) -> np.ndarray:
    """Full-resolution soft-argmin bin centers (ref modules.py:345)."""
    n = int(multiplier * level)
    return np.arange(n) * ((maxdisp - mindisp) / float(n)) + mindisp


def row_valid_mask(h: int, disp: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, 1, 1] mask of rows the reference writes for integer shift `disp`:
    disp > 0 -> rows [0, H-disp); disp < 0 -> rows [-disp, H)."""
    rows = np.ones((h, 1, 1), np.float32)
    if disp > 0:
        rows[h - disp :] = 0.0
    elif disp < 0:
        rows[: -disp] = 0.0
    return jnp.asarray(rows, dtype)


def subtraction_volume(ref: jnp.ndarray, tar: jnp.ndarray, disps: Sequence[float]) -> jnp.ndarray:
    """StereoNet-style volume: plane i = (ref - tar[y+disp]) on valid rows,
    zero elsewhere (ref stereonet/mainmodel.py:100-114). [B,H,W,C] -> [B,D,H,W,C]."""
    h = ref.shape[1]
    planes = []
    for d in disps:
        k = int(d)
        mask = row_valid_mask(h, k, ref.dtype)
        planes.append((ref - shift_h_static(tar, k)) * mask)
    return jnp.stack(planes, axis=1)


def concat_volume_int(ref: jnp.ndarray, tar: jnp.ndarray, disps: Sequence[float]) -> jnp.ndarray:
    """PSMNet-style volume: plane i = concat(ref[y], tar[y+disp]) on valid
    rows (ref psmnet/modules.py:221-240). [B,H,W,C] -> [B,D,H,W,2C]."""
    h = ref.shape[1]
    planes = []
    for d in disps:
        k = int(d)
        mask = row_valid_mask(h, k, ref.dtype)
        planes.append(jnp.concatenate([ref * mask, shift_h_static(tar, k) * mask], axis=-1))
    return jnp.stack(planes, axis=1)


def gwc_volume(
    ref: jnp.ndarray, tar: jnp.ndarray, disps: Sequence[float], num_groups: int
) -> jnp.ndarray:
    """GwcNet-style volume: plane i = -mean_group(ref * tar[y+disp]) on valid
    rows (ref psmnet/modules.py:213-263; note the NEGATIVE sign at :221).
    [B,H,W,C] -> [B,D,H,W,G]."""
    b, h, w, c = ref.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    planes = []
    for d in disps:
        k = int(d)
        mask = row_valid_mask(h, k, ref.dtype)
        prod = ref * shift_h_static(tar, k)
        corr = -jnp.mean(prod.reshape(b, h, w, num_groups, c // num_groups), axis=-1)
        planes.append(corr * mask)
    return jnp.stack(planes, axis=1)


def soft_argmin(cost: jnp.ndarray, disparities: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-argmin disparity regression (ref modules.py:340-362).

    cost: [B, D, H, W] raw cost logits; returns (disparity [B, H, W],
    probability volume [B, D, H, W]).
    """
    prob = jnp.astype(
        jnp.exp(jnp.astype(cost, jnp.float32) - jnp.max(cost, axis=1, keepdims=True).astype(jnp.float32)),
        jnp.float32,
    )
    prob = prob / jnp.sum(prob, axis=1, keepdims=True)
    dvec = jnp.asarray(disparities, jnp.float32).reshape(1, -1, 1, 1)
    disp = jnp.sum(prob * dvec, axis=1)
    return disp.astype(cost.dtype), prob.astype(cost.dtype)
