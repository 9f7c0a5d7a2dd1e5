"""Resize ops vs torch F.interpolate oracle (torch is CPU-only test dep)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dualpixelface_tpu.ops import resize  # noqa: E402


def test_bilinear_up_matches_torch_align_corners():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    out = np.asarray(resize.upsample2d_bilinear(jnp.asarray(x), 4))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=4,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_trilinear_up_matches_torch_align_corners():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 6, 5, 2)).astype(np.float32)
    out = np.asarray(resize.upsample3d_trilinear(jnp.asarray(x), 4))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), scale_factor=4,
        mode="trilinear", align_corners=True,
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_up2_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    out = np.asarray(resize.upsample2d_bilinear(jnp.asarray(x), 2))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_nearest_down_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 12, 2)).astype(np.float32)
    out = np.asarray(resize.downsample2d_nearest(jnp.asarray(x), 4))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.25, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_nearest_up_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
    out = np.asarray(resize.upsample2d_nearest(jnp.asarray(x), 2))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-6)
