"""Loss golden tests vs torch / numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_end_to_end import tiny_option  # noqa: E402


def test_smooth_l1_matches_torch():
    from dualpixelface_tpu.losses.common import masked_mean, smooth_l1

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 8, 8)).astype(np.float32) * 3
    gt = rng.standard_normal((2, 8, 8)).astype(np.float32)
    mask = (rng.random((2, 8, 8)) > 0.3).astype(np.float32)

    ours = float(masked_mean(smooth_l1(jnp.asarray(pred - gt)), jnp.asarray(mask)))
    t_pred = torch.from_numpy(pred)[torch.from_numpy(mask) > 0]
    t_gt = torch.from_numpy(gt)[torch.from_numpy(mask) > 0]
    ref = float(F.smooth_l1_loss(t_pred, t_gt))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cosine_loss_matches_reference_reduction():
    """Oracle: the reference's per-component cosine embedding reduction
    (cosine.py:15-29 + masked forward)."""
    from dualpixelface_tpu.losses import loss_selector

    rng = np.random.default_rng(1)
    b, h, w = 2, 6, 6
    pred = rng.standard_normal((b, 1, h, w, 3)).astype(np.float32)
    gt = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    mask = (rng.random((b, h, w)) > 0.3).astype(np.float32)

    opt = tiny_option(model_name="stereodpnet")
    bank = loss_selector(opt)
    cos = [loss for name, lam, loss in bank.entries if name == "cosine"][0]
    ours = float(cos({"pred_normal": jnp.asarray(pred)}, {"normal": jnp.asarray(gt), "mask": jnp.asarray(mask)})["loss"])

    # torch oracle mirroring the reference math
    tp = torch.from_numpy(pred).permute(0, 1, 4, 2, 3)  # b n c h w
    tg = torch.from_numpy(gt).permute(0, 3, 1, 2)  # b c h w
    tm = torch.from_numpy(mask) > 0
    tp_m = torch.nn.functional.normalize(tp.permute(0, 3, 4, 1, 2)[tm], dim=-1, eps=1e-6)
    tg_m = torch.nn.functional.normalize(tg.permute(0, 2, 3, 1)[tm], dim=-1, eps=1e-6)
    i1, i2 = tp_m[:, 0], tg_m
    d1 = i1.norm(dim=-1, keepdim=True)
    d2 = i2.norm(dim=-1, keepdim=True)
    sim = ((i1 * i2) / (d1 * d2).clamp_min(1e-6)).clamp(-1, 1)
    ref = float((1.0 - sim).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch():
    from dualpixelface_tpu.ops.resample import grid_sample

    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 9, 7, 3)).astype(np.float32)
    grid = (rng.random((2, 5, 6, 2)).astype(np.float32) * 2.6 - 1.3)

    for ac in (False, True):
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=ac))
        ref = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=ac,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_general_robust_loss_cases():
    from dualpixelface_tpu.losses.folded import general_robust_loss

    x = jnp.linspace(-3, 3, 13)
    # alpha=2 -> L2
    np.testing.assert_allclose(
        np.asarray(general_robust_loss(x, 2.0, 0.5)), np.asarray(0.5 * (x / 0.5) ** 2), rtol=1e-6
    )
    # alpha=0 -> Cauchy
    np.testing.assert_allclose(
        np.asarray(general_robust_loss(x, 0.0, 0.5)),
        np.log1p(0.5 * np.asarray(x / 0.5) ** 2), rtol=1e-6,
    )
    # alpha=1 (Charbonnier-ish): finite, monotone in |x|
    v = np.asarray(general_robust_loss(x, 1.0, 0.1))
    assert np.isfinite(v).all() and v[0] > v[6]


def test_folded_loss_runs():
    from dualpixelface_tpu.losses.folded import FoldedLoss

    opt = tiny_option(model_name="dpnet", model_config="config_multi")
    rng = np.random.default_rng(3)
    b, h, w = 2, 16, 16
    n = 3
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    batch = {
        "mask": np.ones((b, h, w), np.float32),
        "depth": depth,
        "idepth": (depth.max() / depth).astype(np.float32),
        "disp": (ab[:, 1:2, None] / depth + ab[:, 0:1, None]).astype(np.float32),
        "abvalue": ab,
        "coords": np.zeros((b, 2), np.float32),
        "raw_center": rng.random((b, h, w, 3)).astype(np.float32),
        "centers": rng.random((b, n, h, w, 3)).astype(np.float32),
        "K": np.tile(np.array([[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], np.float32), (b, 1, 1)),
        "P": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "Ks": np.tile(np.array([[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], np.float32), (b, n, 1, 1)).reshape(b, n, 3, 3),
        "Ps": np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1)),
    }
    results = {"pred_depth": jnp.asarray(depth[:, None])}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    loss = FoldedLoss(opt)(results, batch, target_type="disp")
    assert np.isfinite(float(loss["loss"]))
    assert "abvalue" in loss
