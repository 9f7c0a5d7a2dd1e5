"""bf16 mixed-precision policy tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualpixelface_tpu.ops.precision import cast_floating, resolve_policy
from tests.test_end_to_end import tiny_option
from tests.test_stereodpnet import make_batch


def test_resolve_policy():
    assert resolve_policy(tiny_option()) == jnp.float32
    assert resolve_policy(tiny_option(precision="bf16")) == jnp.bfloat16
    assert resolve_policy(tiny_option(precision=16)) == jnp.bfloat16


def test_cast_floating_leaves_ints():
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


@pytest.mark.slow
def test_bf16_train_step_keeps_fp32_masters():
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    opt = tiny_option(model_name="stereonet", precision="bf16")
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=2, h=32, w=32))
    state = create_train_state(model, opt, batch, steps_per_epoch=1)
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["final_loss"]))
    # master params remain fp32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32
