"""Native host data-plane (C++ libdphost) vs the numpy reference pipeline."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not (NATIVE_DIR / "libdphost.so").exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("no C++ toolchain available")
    from dualpixelface_tpu.data.preprocess import native

    if not native.available():
        pytest.skip("libdphost.so failed to load")


def numpy_reference(img, crop, brightness, gamma, contrast, light, mean, std):
    from dualpixelface_tpu.data.preprocess import augmentation as T

    oy, ox, ch, cw = crop
    x = img[oy : oy + ch, ox : ox + cw]
    (x,), _ = T.PhotometricAug(brightness, gamma, contrast)([x], [])
    (x,), _ = T.ToFloat()([x], [])
    x = x + np.asarray(light, np.float32)[None, None, :]
    return ((x - mean) / std).astype(np.float32)


@pytest.mark.parametrize(
    "brightness,gamma,contrast",
    [(0.0, 0.0, 0.0), (1.1, 0.0, 0.0), (0.0, 0.85, 0.0), (0.0, 0.0, 0.9), (1.15, 0.8, 1.1)],
)
def test_fused_matches_numpy(brightness, gamma, contrast):
    from dualpixelface_tpu.data.preprocess.augmentation import IMAGENET_MEAN, IMAGENET_STD
    from dualpixelface_tpu.data.preprocess.native import fused_photo_normalize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    crop = (7, 5, 32, 32)
    light = rng.normal(0, 0.05, 3).astype(np.float32)

    ref = numpy_reference(img, crop, brightness, gamma, contrast, light, IMAGENET_MEAN, IMAGENET_STD)
    out = fused_photo_normalize(img, crop, brightness, gamma, contrast, light)
    # tone-curve LUT may differ by 1 uint8 level from numpy's float math at
    # rounding boundaries -> tolerance of one quantization step / std
    atol = (1.5 / 255.0) / IMAGENET_STD.min()
    np.testing.assert_allclose(out, ref, atol=atol)
    # and the overwhelming majority must match to float precision (the rest
    # differ by exactly one uint8 level where float truncation boundaries
    # land differently between the C and numpy expression orders)
    frac_exact = np.mean(np.abs(out - ref) < 1e-5)
    assert frac_exact > 0.94, frac_exact


def test_basic_transform_native_matches_numpy():
    """Full pipeline parity: use_native=True vs the numpy path with the same
    seed produces matching samples."""
    from dualpixelface_tpu.data import preprocess
    from tests.test_end_to_end import tiny_option

    opt = tiny_option()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    depth = rng.uniform(800, 1200, (96, 96)).astype(np.float32)
    mask = np.ones((96, 96), np.float32)
    inputs = [img, img.copy(), None]
    targets = [depth, mask, None, None, np.zeros((96, 96, 3), np.float32), None]

    t_np = preprocess.basic_transform(opt, use_native=False)
    t_na = preprocess.basic_transform(opt, use_native=True)
    a_in, a_tg = t_np.apply(inputs, targets, np.random.default_rng(42))
    b_in, b_tg = t_na.apply(inputs, targets, np.random.default_rng(42))
    assert t_np.coords == t_na.coords
    for a, b in zip(a_in, b_in):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(a, b, atol=(1.5 / 255.0) / 0.225)
        assert np.mean(np.abs(a - b) < 1e-5) > 0.9
    for a, b in zip(a_tg, b_tg):
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(a, b)


def test_fused_crop_f32():
    from dualpixelface_tpu.data.preprocess.native import fused_crop_f32

    rng = np.random.default_rng(1)
    a2 = rng.standard_normal((40, 30)).astype(np.float32)
    out = fused_crop_f32(a2, (3, 4, 20, 16))
    np.testing.assert_array_equal(out, a2[3:23, 4:20])

    a3 = rng.standard_normal((40, 30, 3)).astype(np.float32)
    out = fused_crop_f32(a3, (5, 2, 10, 12))
    np.testing.assert_array_equal(out, a3[5:15, 2:14])
