"""StereoDPNet: shapes, train/eval modes, loss integration, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_end_to_end import tiny_option


def make_batch(b=2, h=64, w=64, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    disp = (ab[:, 1:2, None] / depth + ab[:, 0:1, None]).astype(np.float32)
    return {
        "left": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "right": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "center": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "depth": depth,
        "mask": np.ones((b, h, w), np.float32),
        "disp": disp,
        "idepth": (depth.max() / depth).astype(np.float32),
        "normal": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "K": np.tile(np.array([[[740.0, 0, w / 2], [0, 740.0, h / 2], [0, 0, 1]]], np.float32), (b, 1, 1)),
        "abvalue": ab,
    }


@pytest.fixture(scope="module")
def sdp_setup():
    from dualpixelface_tpu.models import model_selector

    opt = tiny_option(model_name="stereodpnet", use_normal=True)
    # XLA deform twin: on CPU the default 'pallas' impl runs in interpret
    # mode (this fixture's init alone took 5+ min of the fast tier); the
    # kernel itself is covered by tests/test_deform_gather_pallas.py
    opt.model.deform_impl = "packed8"
    opt.model._raw["deform_impl"] = "packed8"
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=1, h=32, w=32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return opt, model, batch, variables


@pytest.mark.slow  # ~50 s one-time full-model CPU compile in the fixture
def test_eval_shapes(sdp_setup):
    opt, model, batch, variables = sdp_setup
    results = model.apply(variables, batch, train=False)
    b, h, w = batch["depth"].shape
    level = opt.model.level
    assert results["pred_depth"].shape == (b, 1, h, w)
    assert results["prob_depth"].shape == (b, 1, 4 * level, h, w)
    assert results["pred_normal"].shape == (b, 1, h, w, 3)
    assert results["ref_feature"].shape == (b, h // 4, w // 4)
    assert np.isfinite(np.asarray(results["pred_depth"])).all()
    n = np.asarray(results["pred_normal"])
    assert (n >= -1.0).all() and (n <= 1.0).all()


@pytest.mark.slow  # shares the sdp_setup compile cost
def test_train_shapes_and_loss(sdp_setup):
    from dualpixelface_tpu.losses import loss_selector

    opt, model, batch, variables = sdp_setup
    results, mutated = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    b, h, w = batch["depth"].shape
    assert results["pred_depth"].shape == (b, 3, h, w)  # 3 classifier scales
    assert "batch_stats" in mutated

    loss_bank = loss_selector(opt)
    losses = loss_bank(results, batch)
    assert np.isfinite(float(losses["final_loss"]))
    assert "smoothL1_loss" in losses and "cosine_loss" in losses


@pytest.mark.slow
def test_gradients_reach_all_params(sdp_setup):
    from dualpixelface_tpu.losses import loss_selector

    opt, model, batch, variables = sdp_setup
    loss_bank = loss_selector(opt)

    def loss_fn(params):
        results, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )
        return loss_bank(results, batch)["final_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for _, g in flat)
    # the vast majority of parameters must receive gradient (zero-init offset
    # convs legitimately produce zero input-grads at init for some leaves)
    assert nonzero / len(flat) > 0.85, f"only {nonzero}/{len(flat)} grads nonzero"
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad at {path}"


def test_sample_with_sort_selects_nearest_planes():
    from dualpixelface_tpu.models.stereodpnet.normal_module import sample_with_sort
    from dualpixelface_tpu.ops.cost_volume import costrange

    cr = costrange(-4, 12, 8)  # [-1, -0.5, 0, .5, 1, 1.5, 2, 2.5]
    b, d, h, w, c = 1, 8, 2, 2, 3
    cost = jnp.arange(b * d * h * w * c, dtype=jnp.float32).reshape(b, d, h, w, c)
    disp = jnp.full((b, h, w), 0.9)
    sc, sd = sample_with_sort(cost, disp, cr, 4)
    assert sc.shape == (b, 4, h, w, c)
    # nearest planes to 0.9 are 1.0, 0.5, 1.5, 0.0 -> sorted [0.0, 0.5, 1.0, 1.5]
    np.testing.assert_allclose(np.asarray(sd[0, :, 0, 0]), [0.0, 0.5, 1.0, 1.5])


def test_sample_with_sort_odd_k_fallback():
    """Odd k takes the general topk path (the reference supported any k);
    checks against a brute-force numpy oracle of topk(1/|cr - disp|)+sort."""
    from dualpixelface_tpu.models.stereodpnet.normal_module import sample_with_sort
    from dualpixelface_tpu.ops.cost_volume import costrange

    cr = np.asarray(costrange(-4, 12, 8), np.float32)
    rng = np.random.default_rng(3)
    b, d, h, w, c = 2, 8, 3, 4, 2
    cost = rng.standard_normal((b, d, h, w, c)).astype(np.float32)
    disp = rng.uniform(cr[0] - 0.3, cr[-1] + 0.3, (b, h, w)).astype(np.float32)
    disp[0, 0, 0] = cr[2]  # exact plane hit (tie on both neighbours)
    for k in (3, 5):
        sc, sd = sample_with_sort(jnp.asarray(cost), jnp.asarray(disp), cr, k)
        assert sc.shape == (b, k, h, w, c)
        for bi in range(b):
            for yi in range(h):
                for xi in range(w):
                    diff = np.abs(cr - disp[bi, yi, xi])
                    idx = np.sort(np.argsort(diff, kind="stable")[:k])
                    np.testing.assert_allclose(
                        np.asarray(sd[bi, :, yi, xi]), cr[idx])
                    np.testing.assert_allclose(
                        np.asarray(sc[bi, :, yi, xi]), cost[bi, idx, yi, xi])


def test_grid_maker_3d_normalized():
    from dualpixelface_tpu.models.stereodpnet.normal_module import grid_maker_3d

    b, d, h, w = 2, 4, 8, 8
    K = jnp.tile(jnp.asarray([[[740.0, 0, 16], [0, 740.0, 16], [0, 0, 1]]]), (b, 1, 1))
    disp = jnp.linspace(-1, 2.5, b * d * h * w).reshape(b, d, h, w)
    ab = jnp.tile(jnp.asarray([[32.98, -26996.49]]), (b, 1))
    vol = grid_maker_3d(K, disp, ab)
    assert vol.shape == (b, d, h, w, 3)
    v = np.asarray(vol)
    assert v.min() >= -1e-5 and v.max() <= 1.0 + 1e-5


@pytest.mark.slow  # ~60 s full-model CPU compile when the fixture isn't warm
def test_stereodpnet_plus_matches_stereodpnet_at_init():
    """stereodpnet_plus = the TPU fast path of the SAME architecture: its
    param tree is identical and (zero-init offsets => aperture inert,
    fused regression parity-tested elsewhere) outputs match."""
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    def build(name):
        cfg = Configuration(f"train_synthetic_{name}", make_workspace=False,
                            overrides=dict(batch_size=1))
        # compare the shared architecture: disable the TPU-only fast paths
        # (fused regression needs the TPU; fast_attention deviates at seams)
        cfg.data["model"]["fused_regression"] = False
        cfg.data["model"]["fast_attention"] = False
        return model_selector(cfg.get_config())

    base = build("stereodpnet")
    plus = build("stereodpnet_plus")
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=1, h=32, w=32))
    var = base.init(jax.random.PRNGKey(0), batch, train=False)
    var_p = plus.init(jax.random.PRNGKey(0), batch, train=False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var_p)

    out_b = base.apply(var, batch, train=False)
    out_p = plus.apply(var, batch, train=False)  # same params transfer
    np.testing.assert_allclose(
        np.asarray(out_b["pred_depth"]), np.asarray(out_p["pred_depth"]),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow  # ~5 min on a 1-core host: one train-step compile + 2 eval compiles
def test_stereodpnet_plus_receipt_after_training():
    """The stereodpnet_plus receipt (VERDICT r2 item 8): train `stereodpnet`
    (exact packed8 path), then evaluate the SAME weights under
    `stereodpnet_plus` — ALL of its fast paths live: the windowed Pallas
    deform semantics (`deform_impl='pallas'`; its `_windowed_xla` twin on
    CPU), `fast_attention` (conv-then-shift seams), `fused_regression`
    (interpret-mode Pallas softargmin on CPU).

    Continuous eval metrics (abs_rel/abs_diff/sq_rel/rmse/rmse_log, normal
    mean angle + angular RMSE) must agree within the 0.5% parity budget
    (BASELINE.json north_star). Discrete a1/a2/a3 threshold accuracies count
    pixels crossing 1.01, so near-chance predictions flip pixels on tiny
    output changes — those assert a small ABSOLUTE delta instead (measured
    0.0012 at this scale; budgeted 0.005).
    """
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.metrics.absolute_dp import compute_errors_test_depth
    from dualpixelface_tpu.metrics.normal_dp import cal_normal_acc
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.ops.geometry import disp2depth
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    H = W = 64
    opt = tiny_option(model_name="stereodpnet", init_lr=1e-3, scheduler="none")
    base = model_selector(opt)

    train_batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=2, h=H, w=W, rng_seed=1))
    state = create_train_state(base, opt, train_batch, steps_per_epoch=1)
    step = make_train_step(base, loss_selector(opt))
    first = last = None
    for _ in range(10):
        state, out = step(state, train_batch)
        last = float(out["final_loss"])
        first = first if first is not None else last
    assert last < first, f"training did not move: {first} -> {last}"
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    cfg_p = Configuration(
        "train_synthetic_stereodpnet", make_workspace=False,
        overrides=dict(model_name="stereodpnet_plus", batch_size=2),
    )
    plus = model_selector(cfg_p.get_config())

    eval_batch = jax.tree_util.tree_map(jnp.asarray, make_batch(b=2, h=H, w=W, rng_seed=99))

    def measure(model):
        out = model.apply(variables, eval_batch, train=False)
        depth = np.asarray(disp2depth(out["pred_depth"][:, 0:1], eval_batch["abvalue"]))[:, 0]
        gt = np.asarray(eval_batch["depth"])
        mask = np.asarray(eval_batch["mask"])
        errs = compute_errors_test_depth(gt, depth, mask, 1.01)
        nm = cal_normal_acc(
            np.asarray(eval_batch["normal"]), np.asarray(out["pred_normal"][:, 0]), mask
        )
        cont = np.array([errs[0], errs[1], errs[2], errs[3], errs[4], nm[0], nm[1]], np.float64)
        thresh = np.array(errs[5:8], np.float64)
        return cont, thresh

    cont_b, th_b = measure(base)
    cont_p, th_p = measure(plus)

    rel = np.abs(cont_p - cont_b) / np.maximum(np.abs(cont_b), 1e-9)
    assert rel.max() <= 5e-3, f"continuous metric deltas exceed 0.5%: {rel}"
    assert np.abs(th_p - th_b).max() <= 5e-3, f"threshold deltas: {th_p - th_b}"
