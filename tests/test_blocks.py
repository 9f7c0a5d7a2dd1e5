"""MXU-shaped conv blocks: both kd-folding layouts of _DSliceConv3D must
equal the plain XLA 3-D convolution they stand in for (same param tree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


@pytest.mark.parametrize("strides", [(1, 1, 1), (2, 2, 2)])
@pytest.mark.parametrize("dfold", ["out", "out2", "in", "kdsum", "bgc"])
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
    v_in = _DSliceConv3D(6, dfold="in").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_out) == jax.tree_util.tree_structure(v_in)
    for a, b in zip(jax.tree_util.tree_leaves(v_out), jax.tree_util.tree_leaves(v_in)):
        assert a.shape == b.shape
