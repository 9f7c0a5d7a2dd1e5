"""2-D deformable conv vs torchvision-free oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops.deform_conv2d import DeformConvPack2D, deform_conv2d


def test_zero_offset_equals_conv2d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 3, 4)).astype(np.float32) * 0.2
    offset = jnp.zeros((1, 6, 7, 18), jnp.float32)
    out = deform_conv2d(jnp.asarray(x), offset, jnp.asarray(weight))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_integer_offset_equals_shifted_conv():
    """A constant integer offset (dy=1) equals convolving a shifted image."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 2)).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    offset[..., 0::2] = 1.0  # dy = +1 every tap
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight))

    x_shift = np.zeros_like(x)
    x_shift[:, :-1] = x[:, 1:]
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # interior rows match exactly (border rows differ by zero-padding policy)
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-2], np.asarray(ref)[:, 1:-2], rtol=1e-4, atol=1e-5
    )


def test_modulated_mask_scales_output():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)).astype(np.float32))
    off = jnp.zeros((1, 5, 5, 18), jnp.float32)
    full = deform_conv2d(x, off, w, mask=jnp.ones((1, 5, 5, 9)))
    half = deform_conv2d(x, off, w, mask=jnp.full((1, 5, 5, 9), 0.5))
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, rtol=1e-5)


def test_pack_module():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
    for modulated in (False, True):
        mod = DeformConvPack2D(8, modulated=modulated)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out, offset = mod.apply(variables, x)
        assert out.shape == (1, 6, 6, 8)
        np.testing.assert_array_equal(np.asarray(offset), 0.0)
