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


def test_fused_softargmin_grad_matches_reference():
    """custom_vjp (Pallas backward) vs jax.grad through the unfused path,
    with a non-trivial downstream cotangent (weighted sum)."""
    import jax

    rng = np.random.default_rng(2)
    b, d, h, w = 2, 8, 8, 16
    cost = jnp.asarray(rng.standard_normal((b, d, h, w)).astype(np.float32) * 3)
    dvals = regression_disparities(-4, 12, d, 4)
    wgt = jnp.asarray(rng.standard_normal((b, 4 * h, 4 * w)).astype(np.float32))

    def loss_fused(c):
        return jnp.sum(wgt * fused_softargmin(c, dvals, factor=4, row_tile=8))

    def loss_ref(c):
        return jnp.sum(wgt * reference_path(c, dvals))

    v_f, g_f = jax.value_and_grad(loss_fused)(cost)
    v_r, g_r = jax.value_and_grad(loss_ref)(cost)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), rtol=2e-3, atol=2e-4)


def test_fused_softargmin_grad_row_tile_invariance():
    import jax

    rng = np.random.default_rng(3)
    cost = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    dvals = regression_disparities(-4, 12, 8, 4)
    f = lambda c, rt: jnp.sum(fused_softargmin(c, dvals, row_tile=rt) ** 2)
    g8 = jax.grad(lambda c: f(c, 8))(cost)
    g32 = jax.grad(lambda c: f(c, 32))(cost)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g32), rtol=1e-4, atol=1e-5)
