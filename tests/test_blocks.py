"""MXU-shaped conv blocks: both kd-folding layouts of _DSliceConv3D must
equal the plain XLA 3-D convolution they stand in for (same param tree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


def _attic_dslice_v2():
    """Load the demoted epilogue-fused pallas2 kernel from tools/attic (kept
    there as a documented negative result; not dispatched by the package)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "attic", "conv3d_dslice_v2.py",
    )
    spec = importlib.util.spec_from_file_location("attic_conv3d_dslice_v2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("strides", [(1, 1, 1), (2, 2, 2)])
@pytest.mark.parametrize("dfold", ["out", "pallas", "cpack"])
def test_dslice_conv3d_matches_conv3d(strides, dfold):
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    b, d, h, w, c, co = 2, 4, 8, 8, 5, 7
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, d, h, w, c)), jnp.float32)

    mod = _DSliceConv3D(co, strides=strides, use_bias=True, dfold=dfold)
    var = mod.init(jax.random.PRNGKey(1), x)

    ref = nn.Conv(
        co, kernel_size=(3, 3, 3), strides=strides,
        padding=[(1, 1)] * 3, use_bias=True,
    )
    out = mod.apply(var, x)
    expect = ref.apply(var, x)
    assert out.shape == expect.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=2e-5, atol=2e-5)


def test_dslice_fold_layouts_share_params():
    """Flipping dfold is a pure compute-path choice: the param tree (and
    therefore every checkpoint/converter) is identical."""
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    x = jnp.zeros((1, 4, 8, 8, 3), jnp.float32)
    v_out = _DSliceConv3D(6, dfold="out").init(jax.random.PRNGKey(0), x)
    v_in = _DSliceConv3D(6, dfold="pallas").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_out) == jax.tree_util.tree_structure(v_in)
    for a, b in zip(jax.tree_util.tree_leaves(v_out), jax.tree_util.tree_leaves(v_in)):
        assert a.shape == b.shape


def test_packed_tconv3d_matches_convtranspose():
    """_PackedTConv3D (parity-decomposed dense conv + staged interleave)
    must equal nn.ConvTranspose(3,3,3 s2, torch p1/op1 semantics) exactly
    (same [3,3,3,Co,Cin] transpose_kernel param)."""
    from dualpixelface_tpu.ops.blocks import _PackedTConv3D

    b, d, h, w, c, co = 2, 4, 8, 6, 5, 7
    x = jnp.asarray(np.random.default_rng(2).standard_normal((b, d, h, w, c)), jnp.float32)

    mod = _PackedTConv3D(co)
    var = mod.init(jax.random.PRNGKey(3), x)
    out = mod.apply(var, x)
    assert out.shape == (b, 2 * d, 2 * h, 2 * w, co)

    # torch ConvTranspose3d(k3 s2 p1 op1): crop flax's p(1,2) full output
    ref = nn.ConvTranspose(
        co, kernel_size=(3, 3, 3), strides=(2, 2, 2),
        padding=[(1, 2)] * 3, transpose_kernel=True, use_bias=False,
    )
    expect = ref.apply(var, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize(
    "shape,co", [((2, 4, 16, 24, 5), 7), ((1, 6, 16, 16, 16), 16), ((1, 3, 8, 8, 3), 4)]
)
def test_conv3d_dslice_pallas_interpret(shape, co, stride):
    """The fused Pallas conv (interpret mode) vs the XLA twin, including a
    D not divisible by the block size."""
    from dualpixelface_tpu.ops.kernels.conv3d_dslice import (
        _conv3d_call,
        conv3d_dslice_reference,
    )

    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((3, 3, 3, c, co)) * 0.1, jnp.float32)
    ref = conv3d_dslice_reference(x, wm, stride)
    out = _conv3d_call(x, wm, stride=stride, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "shape,co", [((2, 5, 16, 16, 8), 8), ((1, 8, 24, 16, 32), 32), ((2, 3, 8, 16, 5), 7)]
)
def test_conv3d_dslice_v2_interpret(shape, co):
    """The kw-lane-folded v2 kernel (interpret mode) vs the XLA twin,
    including ragged D/H block remainders and non-tile channel counts."""
    _m = _attic_dslice_v2()
    _conv3d_call_v2 = _m._conv3d_call_v2
    from dualpixelface_tpu.ops.kernels.conv3d_dslice import conv3d_dslice_reference

    rng = np.random.default_rng(4)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((3, 3, 3, c, co)) * 0.1, jnp.float32)
    ref = conv3d_dslice_reference(x, wm, 1)
    out = _conv3d_call_v2(x, wm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_conv3d_dslice_v2_grad_matches_twin():
    _m = _attic_dslice_v2()
    conv3d_dslice_v2 = _m.conv3d_dslice_v2
    from dualpixelface_tpu.ops.kernels.conv3d_dslice import conv3d_dslice_reference

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 5)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 6)), jnp.float32)
    _, vjp = jax.vjp(conv3d_dslice_v2, x, wm)
    _, vjp_ref = jax.vjp(lambda a, b: conv3d_dslice_reference(a, b, 1), x, wm)
    for a, b in zip(vjp(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_conv3d_dslice_pallas_grad_matches_twin():
    """custom_vjp routes gradients through the XLA twin exactly."""
    from dualpixelface_tpu.ops.kernels.conv3d_dslice import (
        conv3d_dslice_pallas,
        conv3d_dslice_reference,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 5)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 6)), jnp.float32)
    _, vjp = jax.vjp(lambda a, b: conv3d_dslice_pallas(a, b, 1), x, wm)
    _, vjp_ref = jax.vjp(lambda a, b: conv3d_dslice_reference(a, b, 1), x, wm)
    for a, b in zip(vjp(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_dslice_taps_fold_matches_conv3d():
    """dfold='taps' (single-output-channel classifier head) equals the plain
    3-D conv; non-co-1 / strided sites silently fall back to 'out'."""
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    b, d, h, w, c = 2, 4, 8, 8, 5
    x = jnp.asarray(np.random.default_rng(2).standard_normal((b, d, h, w, c)), jnp.float32)

    mod = _DSliceConv3D(1, use_bias=True, dfold="taps")
    var = mod.init(jax.random.PRNGKey(3), x)
    ref = nn.Conv(1, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3, use_bias=True)
    np.testing.assert_allclose(
        np.asarray(mod.apply(var, x)), np.asarray(ref.apply(var, x)),
        rtol=2e-5, atol=2e-5,
    )
    # fallback: co>1 goes through 'out' (still exact)
    mod2 = _DSliceConv3D(6, use_bias=False, dfold="taps")
    var2 = mod2.init(jax.random.PRNGKey(4), x)
    ref2 = nn.Conv(6, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3, use_bias=False)
    np.testing.assert_allclose(
        np.asarray(mod2.apply(var2, x)), np.asarray(ref2.apply(var2, x)),
        rtol=2e-5, atol=2e-5,
    )


def test_dslice_cpack_fold_matches_conv3d():
    """dfold='cpack' (D-groups-of-4 on channels, 6-plane halo) equals the
    plain 3-D conv; non-multiple-of-4 D falls back to 'out'."""
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    b, d, h, w, c, co = 2, 8, 8, 8, 5, 7
    x = jnp.asarray(np.random.default_rng(6).standard_normal((b, d, h, w, c)), jnp.float32)
    mod = _DSliceConv3D(co, use_bias=True, dfold="cpack")
    var = mod.init(jax.random.PRNGKey(7), x)
    ref = nn.Conv(co, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3, use_bias=True)
    np.testing.assert_allclose(
        np.asarray(mod.apply(var, x)), np.asarray(ref.apply(var, x)),
        rtol=2e-5, atol=2e-5,
    )
    # fallback: d not a multiple of 4
    x2 = x[:, :6]
    mod2 = _DSliceConv3D(co, dfold="cpack")
    var2 = mod2.init(jax.random.PRNGKey(8), x2)
    ref2 = nn.Conv(co, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3, use_bias=False)
    np.testing.assert_allclose(
        np.asarray(mod2.apply(var2, x2)), np.asarray(ref2.apply(var2, x2)),
        rtol=2e-5, atol=2e-5,
    )


def test_dslice_auto_fold_matches_conv3d():
    """dfold='auto' (per-site taps/out selection) is exact at each of its
    dispatch branches."""
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    rng = np.random.default_rng(11)
    for shape, co in [
        ((2, 4, 8, 8, 5), 1),   # -> taps
        ((2, 8, 8, 8, 5), 7),   # -> out (cpack removed from auto: full-model regression)
        ((2, 6, 8, 8, 40), 7),  # -> out
    ]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        mod = _DSliceConv3D(co, use_bias=True, dfold="auto")
        var = mod.init(jax.random.PRNGKey(1), x)
        ref = nn.Conv(co, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3, use_bias=True)
        np.testing.assert_allclose(
            np.asarray(mod.apply(var, x)), np.asarray(ref.apply(var, x)),
            rtol=2e-5, atol=2e-5,
        )
