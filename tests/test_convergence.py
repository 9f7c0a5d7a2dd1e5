"""Optimization sanity: a few train steps on one repeated batch must reduce
the loss substantially (catches broken gradients / LR plumbing / BN wiring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_end_to_end import tiny_option
from tests.test_stereodpnet import make_batch


@pytest.mark.slow
def test_stereonet_overfits_single_batch():
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    opt = tiny_option(model_name="stereonet", init_lr=1e-3, scheduler="none")
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=2, h=32, w=32))
    state = create_train_state(model, opt, batch, steps_per_epoch=1)
    step = make_train_step(model, loss_selector(opt))

    losses = []
    for _ in range(12):
        state, out = step(state, batch)
        losses.append(float(out["final_loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses[0]:.4f} -> {losses[-1]:.4f}"
