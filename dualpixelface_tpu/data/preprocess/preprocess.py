"""Preprocess orchestrators (ref dataloader/preprocess/preprocess.py:16-126).

basic_transform: ToNumpy -> crop (soft/hard sizing; soft rounds H*ratio and
W*ratio down to crop_factor multiples, keeping shapes in a small static set so
XLA never recompiles per-sample) -> photometric aug -> float conversion ->
PCA lighting -> normalization. Exposes the crop origin in `.coords`.

raw_transform: ToNumpy -> float conversion only (ref preprocess.py:114-126).

Randomness: every `apply` takes an explicit numpy Generator so augmentation is
reproducible per (seed, epoch, index) — replaces the reference's global-RNG
draws (preprocess.py:69-72).
"""
from __future__ import annotations

import numpy as np

from dualpixelface_tpu.data.preprocess import augmentation as T
from dualpixelface_tpu.utils.file_manager import error_handler


def _check_finite(arrs, what: str):
    for a in arrs:
        if a is not None:
            error_handler(
                bool(np.isfinite(a).all()), f"invalid value found in {what}", __name__, True
            )


def get_crop_size(inputs, ratio: float, factor: int) -> tuple[int, int]:
    """Soft crop sizing: floor(ceil(size*ratio) / factor) * factor
    (ref preprocess.py:29-44)."""
    size = None
    for x in inputs:
        if x is not None:
            size = (x.shape[0], x.shape[1])
            break
    if size is None:
        raise RuntimeError("all inputs are None")
    n = (np.ceil(np.array(size) * ratio) // factor).astype(int)
    error_handler(
        bool((n > 0).all()),
        f"soft crop of {size} at ratio {ratio} rounds below crop_factor {factor}",
        __name__, True,
    )
    return tuple(int(factor) * n)


class basic_transform:
    def __init__(self, option):
        self.opt = option
        self.coords = [0, 0]

    def apply(self, inputs_, targets_, rng: np.random.Generator | None = None):
        rng = rng if rng is not None else np.random.default_rng()
        inputs, targets = T.ToNumpy()(list(inputs_), list(targets_))

        if "crop_aug" in self.opt.augmentation:
            crop_opt = self.opt.crop_aug
            if crop_opt.type == "soft_crop":
                size = get_crop_size(
                    inputs, crop_opt.soft_crop.crop_ratio, crop_opt.soft_crop.crop_factor
                )
            else:
                size = (crop_opt.hard_crop.crop_height, crop_opt.hard_crop.crop_width)
            cropper = T.Cropper(crop_opt, size, rng)
            inputs, targets = cropper(inputs, targets)
            self.coords = cropper.coords

        if "photo_aug" in self.opt.augmentation:
            p = self.opt.photo_aug
            uniform = lambda: float(rng.uniform(0.7, 1.2))
            transforms = [
                T.PhotometricAug(
                    brightness=uniform() if p.brightness else 0,
                    gamma=uniform() if p.gamma else 0,
                    contrast=uniform() if p.contrast else 0,
                ),
                T.ToFloat(),
                T.Lighting(float(rng.uniform(0.5, 5.0)) if p.light else 0, rng),
                T.Normalizer(),
            ]
        else:
            transforms = [T.ToFloat(), T.Normalizer()]

        inputs, targets = T.Compose(transforms)(inputs, targets)
        _check_finite(inputs, "inputs")
        _check_finite(targets, "targets")
        return inputs, targets


class raw_transform:
    def __init__(self, option, crop: bool = False):
        self.opt = option
        self.crop = crop

    def apply(self, inputs_, targets_, rng: np.random.Generator | None = None):
        inputs, targets = T.ToNumpy()(list(inputs_), list(targets_))
        return T.ToFloat()(inputs, targets)
