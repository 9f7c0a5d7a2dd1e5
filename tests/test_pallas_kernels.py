"""Pallas kernels vs their pure-JAX reference paths (interpret mode on CPU)."""
import pytest
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops.cost_volume import regression_disparities, soft_argmin
from dualpixelface_tpu.ops.kernels import fused_softargmin
from dualpixelface_tpu.ops.resize import upsample3d_trilinear


def reference_path(cost, disp_values, factor=4):
    up = upsample3d_trilinear(cost[..., None], factor)[..., 0]
    disp, _prob = soft_argmin(up, disp_values)
    return disp


def test_fused_softargmin_matches_reference():
    rng = np.random.default_rng(0)
    b, d, h, w = 2, 8, 16, 24
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32) * 3
    dvals = regression_disparities(-4, 12, d, 4)

    ref = np.asarray(reference_path(jnp.asarray(cost), dvals))
    out = np.asarray(fused_softargmin(jnp.asarray(cost), dvals, factor=4, row_tile=16))
    assert out.shape == (b, 4 * h, 4 * w)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_stereodpnet_fused_regression_matches_unfused():
    """Same params, fused vs unfused regression -> identical disparities."""
    import jax

    from dualpixelface_tpu.models import model_selector
    from tests.test_end_to_end import tiny_option
    from tests.test_stereodpnet import make_batch

    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=1, h=32, w=32))

    opt_a = tiny_option(model_name="stereodpnet")
    model_a = model_selector(opt_a)
    variables = model_a.init(jax.random.PRNGKey(0), batch, train=False)
    ref = model_a.apply(variables, batch, train=False)

    opt_b = tiny_option(model_name="stereodpnet")
    opt_b.model.fused_regression = True
    opt_b.model._raw["fused_regression"] = True
    model_b = model_selector(opt_b)
    out = model_b.apply(variables, batch, train=False)

    np.testing.assert_allclose(
        np.asarray(out["pred_depth"]), np.asarray(ref["pred_depth"]), rtol=1e-4, atol=1e-4
    )
    assert out["prob_depth"] is None and ref["prob_depth"] is not None


def test_fused_softargmin_tile_invariance():
    rng = np.random.default_rng(1)
    cost = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    dvals = regression_disparities(-4, 12, 8, 4)
    a = np.asarray(fused_softargmin(jnp.asarray(cost), dvals, row_tile=8))
    b = np.asarray(fused_softargmin(jnp.asarray(cost), dvals, row_tile=32))
    np.testing.assert_allclose(a, b, rtol=1e-5)
