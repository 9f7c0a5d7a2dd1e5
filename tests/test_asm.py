"""ASM sub-pixel shift vs torch grid_sample / FFT oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dualpixelface_tpu.ops import asm  # noqa: E402


def torch_bilinear_shift(x_nchw: np.ndarray, delta: float) -> np.ndarray:
    """The reference's bilinear branch: grid of y+delta sampled with
    align_corners=True, zero padding (ref asm.py:35-47,98-102)."""
    t = torch.from_numpy(x_nchw)
    b, c, h, w = t.shape
    ys = (torch.arange(h, dtype=torch.float64) + delta) / (h - 1) * 2 - 1
    xs = torch.arange(w, dtype=torch.float64) / (w - 1) * 2 - 1
    yv, xv = torch.meshgrid(ys, xs, indexing="ij")
    grid = torch.stack([xv, yv], -1)[None].expand(b, -1, -1, -1).float()
    return F.grid_sample(t, grid, mode="bilinear", align_corners=True).numpy()


@pytest.mark.parametrize("delta", [0.0, 1.0, -2.0, 0.5, -1.25, 3.75])
def test_bilinear_shift_matches_grid_sample(delta):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 9, 4)).astype(np.float32)
    out = np.asarray(asm.shift_h_bilinear(jnp.asarray(x), delta))
    ref = torch_bilinear_shift(np.moveaxis(x, -1, 1), delta)
    np.testing.assert_allclose(out, np.moveaxis(ref, 1, -1), rtol=1e-5, atol=1e-5)


def test_nearest_shift_integer():
    x = np.arange(5 * 3, dtype=np.float32).reshape(1, 5, 3, 1)
    out = np.asarray(asm.shift_h_nearest(jnp.asarray(x), 2.0))
    np.testing.assert_array_equal(out[0, :3, :, 0], x[0, 2:, :, 0])
    np.testing.assert_array_equal(out[0, 3:, :, 0], 0.0)
    out = np.asarray(asm.shift_h_nearest(jnp.asarray(x), -1.0))
    np.testing.assert_array_equal(out[0, 1:, :, 0], x[0, :4, :, 0])
    np.testing.assert_array_equal(out[0, 0, :, 0], 0.0)


def test_phase_shift_integer_is_circular_roll():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 6, 2)).astype(np.float32)
    out = np.asarray(asm.phase_shift_multi(jnp.asarray(x), [2.0]))[:, 0]
    np.testing.assert_allclose(out, np.roll(x, -2, axis=1), rtol=1e-4, atol=1e-5)


def test_phase_shift_matches_reference_fft_math():
    """Oracle: the reference's full-2D rfft/cos-sin/irfft chain (asm.py:104-125)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    delta = 1.7
    h, w = x.shape[1], x.shape[2]
    Nr = np.concatenate([np.arange(np.ceil(h // 2)), np.arange(-np.fix(h // 2), 0)])
    Nc = np.concatenate([np.arange(np.ceil(w // 2)), np.arange(-np.fix(w // 2), 0)])
    NR, NC = np.meshgrid(Nr, Nc, indexing="ij")
    theta = 2 * np.pi * (delta / h * NR + 0.0 * NC)
    fx = np.fft.fft2(np.moveaxis(x, -1, 1), axes=(-2, -1))
    shifted = np.fft.ifft2(fx * np.exp(1j * theta), axes=(-2, -1)).real
    ref = np.moveaxis(shifted, 1, -1).astype(np.float32)

    out = np.asarray(asm.phase_shift_multi(jnp.asarray(x), [delta]))[:, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_subpixel_shift_planes_shapes_and_direction():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 8, 4)).astype(np.float32)
    disps = [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5]
    fwd = asm.subpixel_shift_planes(jnp.asarray(x), disps, "forward")
    assert fwd.shape == (2, 8, 3, 16, 8, 4)
    bwd = asm.subpixel_shift_planes(jnp.asarray(x), disps, "backward")
    # backward with disp d == forward with -d
    fwd_neg = asm.subpixel_shift_planes(jnp.asarray(x), [-d for d in disps], "forward")
    np.testing.assert_allclose(np.asarray(bwd), np.asarray(fwd_neg), rtol=1e-4, atol=1e-5)


def test_masking_attention_shapes():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8, 3, 8, 8, 16)), jnp.float32)
    mod = asm.MaskingAttention(features=16, act="sigmoid")
    variables = mod.init(rng, x, train=False)
    out = mod.apply(variables, x, train=False)
    assert out.shape == (2, 8, 8, 8, 16)
    # train mode mutates batch stats
    out, mutated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8, 8, 8, 16)
    assert "batch_stats" in mutated


def test_fast_attention_matches_exact_interior():
    """Hoisted mask head (fast_attention): identical params, outputs match
    the exact per-plane attention away from the shift seams; the deviation
    is confined to boundary rows (conv radius + max shift)."""
    import jax

    from dualpixelface_tpu.ops.asm import MaskingAttention, subpixel_shift_planes

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), jnp.float32)
    disps = (-1.0, -0.5, 0.0, 0.5, 1.0, 1.5)
    modes = dict(nearest=True, bilinear=True, phase=True)

    att = MaskingAttention(features=8)
    planes = subpixel_shift_planes(feat, disps, "forward", **modes)
    var = att.init(jax.random.PRNGKey(0), planes, False)

    exact = att.apply(var, planes, False)
    fast = att.apply(
        var, feat, False,
        shift_fn=lambda t: subpixel_shift_planes(t, disps, "forward", **modes),
    )
    assert exact.shape == fast.shape
    # interior rows: away from the +-2-row seam region (shift <= 2 + radius 1)
    e = np.asarray(exact)[:, :, 4:-4]
    f = np.asarray(fast)[:, :, 4:-4]
    # InstanceNorm statistics differ by O(seam/area); allow a loose band on
    # the interior and require strong agreement in aggregate
    np.testing.assert_allclose(f, e, rtol=0.15, atol=0.05)
    corr = np.corrcoef(e.ravel(), f.ravel())[0, 1]
    assert corr > 0.999, corr


def test_flat_attention_matches_stacked_exactly():
    """The mode-MAJOR flat layout is the SAME exact math as the stacked
    [B,D,M,..] path: identical param tree, outputs equal to float rounding."""
    rng = jax.random.PRNGKey(0)
    b, d, m, h, w, c = 2, 4, 3, 8, 8, 16
    xs = jnp.asarray(
        np.random.default_rng(7).standard_normal((b, d, m, h, w, c)), jnp.float32
    )
    xf = jnp.transpose(xs, (2, 0, 1, 3, 4, 5))  # [M, B, D, H, W, C]

    mod = asm.MaskingAttention(features=c, act="sigmoid")
    var_s = mod.init(rng, xs, train=False)
    var_f = mod.init(rng, xf, train=False, flat=True)
    assert jax.tree_util.tree_structure(var_s) == jax.tree_util.tree_structure(var_f)
    for a, bb in zip(jax.tree_util.tree_leaves(var_s), jax.tree_util.tree_leaves(var_f)):
        assert a.shape == bb.shape

    out_s = mod.apply(var_s, xs, train=False)
    out_f = mod.apply(var_s, xf, train=False, flat=True)  # same params
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), rtol=2e-5, atol=2e-6)

    # train mode: batch statistics are computed over the same element sets
    out_s, mut_s = mod.apply(var_s, xs, train=True, mutable=["batch_stats"])
    out_f, mut_f = mod.apply(var_s, xf, train=True, flat=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), rtol=2e-5, atol=2e-6)
    for a, bb in zip(
        jax.tree_util.tree_leaves(mut_s), jax.tree_util.tree_leaves(mut_f)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6)


def test_flat_attention_layout_full_cost_volume():
    """ASMCostVolume with attention_layout='flat' equals the stacked default
    bit-for-bit-modulo-rounding on the same params."""
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models.stereodpnet.modules import ASMCostVolume

    def build(layout):
        cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
        cfg.data["model"]["attention_layout"] = layout
        opt = cfg.get_config()
        return ASMCostVolume(option=opt, mindisp=opt.model.mindisp, maxdisp=opt.model.maxdisp)

    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    tar = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)

    mod_s = build("stacked")
    mod_f = build("flat")
    var = mod_s.init(jax.random.PRNGKey(1), ref, tar, train=False)
    var_f = mod_f.init(jax.random.PRNGKey(1), ref, tar, train=False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var_f)

    out_s = mod_s.apply(var, ref, tar, train=False)
    out_f = mod_f.apply(var, ref, tar, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), rtol=2e-5, atol=2e-6)


def test_listwise_fast_attention_matches_stacked_fast():
    """mode_list=True (layout='list' shift_fn) is the SAME math as the
    stacked fast path: identical param tree, outputs equal to rounding."""
    rng = np.random.default_rng(11)
    feat = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), jnp.float32)
    disps = (-1.0, -0.5, 0.0, 0.5, 1.0, 1.5)
    modes = dict(nearest=True, bilinear=True, phase=True)

    for act, ff in (("sigmoid", False), ("relu", True)):
        att = asm.MaskingAttention(features=8, act=act, feature_fetch=ff)
        sf_stacked = lambda t: asm.subpixel_shift_planes(t, disps, "forward", **modes)
        sf_list = lambda t: asm.subpixel_shift_planes(
            t, disps, "forward", layout="list", **modes
        )
        var_s = att.init(jax.random.PRNGKey(0), feat, False, shift_fn=sf_stacked)
        var_l = att.init(
            jax.random.PRNGKey(0), feat, False, shift_fn=sf_list, mode_list=True
        )
        assert jax.tree_util.tree_structure(var_s) == jax.tree_util.tree_structure(var_l)
        for a, b in zip(
            jax.tree_util.tree_leaves(var_s), jax.tree_util.tree_leaves(var_l)
        ):
            assert a.shape == b.shape

        out_s = att.apply(var_s, feat, False, shift_fn=sf_stacked)
        out_l = att.apply(var_s, feat, False, shift_fn=sf_list, mode_list=True)
        np.testing.assert_allclose(
            np.asarray(out_l), np.asarray(out_s), rtol=2e-5, atol=2e-6
        )


def test_listwise_fast_attention_full_cost_volume():
    """ASMCostVolume fast_attention with layout 'list' equals layout
    'stacked' on the same params (env override plumbed through)."""
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models.stereodpnet.modules import ASMCostVolume

    def build(layout):
        cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
        cfg.data["model"]["fast_attention"] = True
        cfg.data["model"]["fast_attention_layout"] = layout
        opt = cfg.get_config()
        return ASMCostVolume(option=opt, mindisp=opt.model.mindisp, maxdisp=opt.model.maxdisp)

    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    tar = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)

    mod_s = build("stacked")
    mod_l = build("list")
    var = mod_s.init(jax.random.PRNGKey(1), ref, tar, train=False)
    var_l = mod_l.init(jax.random.PRNGKey(1), ref, tar, train=False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var_l)

    out_s = mod_s.apply(var, ref, tar, train=False)
    out_l = mod_l.apply(var, ref, tar, train=False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_s), rtol=2e-5, atol=2e-6)


def test_head_s2d_attention_matches_exactly():
    """head_s2d=True (packed mask-head convs) is the SAME exact math as the
    fine head: identical param tree, outputs and train-mode BN statistics."""
    rng = jax.random.PRNGKey(0)
    b, d, m, h, w, c = 2, 4, 3, 8, 8, 16
    xs = jnp.asarray(
        np.random.default_rng(9).standard_normal((b, d, m, h, w, c)), jnp.float32
    )

    mod = asm.MaskingAttention(features=c, act="sigmoid")
    mod2 = asm.MaskingAttention(features=c, act="sigmoid", head_s2d=True)
    var = mod.init(rng, xs, train=False)
    var2 = mod2.init(rng, xs, train=False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var2)
    for a, bb in zip(jax.tree_util.tree_leaves(var), jax.tree_util.tree_leaves(var2)):
        assert a.shape == bb.shape

    out = mod.apply(var, xs, train=False)
    out2 = mod2.apply(var, xs, train=False)  # same params
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=2e-5, atol=2e-6)

    out, mut = mod.apply(var, xs, train=True, mutable=["batch_stats"])
    out2, mut2 = mod2.apply(var, xs, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=2e-5, atol=2e-6)
    for a, bb in zip(
        jax.tree_util.tree_leaves(mut), jax.tree_util.tree_leaves(mut2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6)


def test_head_s2d_odd_dims_falls_back():
    """Odd H/W bypasses the packed head (it requires even dims)."""
    rng = jax.random.PRNGKey(0)
    xs = jnp.asarray(
        np.random.default_rng(10).standard_normal((1, 2, 3, 7, 9, 8)), jnp.float32
    )
    mod = asm.MaskingAttention(features=8, act="sigmoid", head_s2d=True)
    var = mod.init(rng, xs, train=False)
    out = mod.apply(var, xs, train=False)
    assert out.shape == (1, 2, 7, 9, 8)


def test_mpack_attention_matches_stacked_exactly():
    """Mode-PACKED lanes ([B,D,H,W,M*C], block-diagonal head convs) are the
    SAME exact math as the stacked [B,D,M,..] path: identical param tree,
    outputs and train-mode batch statistics equal to float rounding."""
    rng = jax.random.PRNGKey(0)
    b, d, m, h, w, c = 2, 4, 3, 8, 8, 16
    xs = jnp.asarray(
        np.random.default_rng(17).standard_normal((b, d, m, h, w, c)), jnp.float32
    )
    # mode-major lane pack of the same planes
    xp = jnp.concatenate([xs[:, :, j] for j in range(m)], axis=-1)

    mod = asm.MaskingAttention(features=c, act="sigmoid")
    var_s = mod.init(rng, xs, train=False)
    var_p = mod.init(rng, xp, train=False, mpack=m)
    assert jax.tree_util.tree_structure(var_s) == jax.tree_util.tree_structure(var_p)
    for a, bb in zip(jax.tree_util.tree_leaves(var_s), jax.tree_util.tree_leaves(var_p)):
        assert a.shape == bb.shape

    out_s = mod.apply(var_s, xs, train=False)
    out_p = mod.apply(var_s, xp, train=False, mpack=m)  # same params
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=2e-5, atol=2e-6)

    out_s, mut_s = mod.apply(var_s, xs, train=True, mutable=["batch_stats"])
    out_p, mut_p = mod.apply(var_s, xp, train=True, mpack=m, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=2e-5, atol=2e-6)
    for a, bb in zip(
        jax.tree_util.tree_leaves(mut_s), jax.tree_util.tree_leaves(mut_p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6)


def test_mpack_attention_layout_full_cost_volume():
    """ASMCostVolume with attention_layout='mpack' equals the stacked default
    on the same params (eval AND train-mode batch statistics)."""
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models.stereodpnet.modules import ASMCostVolume

    def build(layout):
        cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
        cfg.data["model"]["attention_layout"] = layout
        opt = cfg.get_config()
        return ASMCostVolume(option=opt, mindisp=opt.model.mindisp, maxdisp=opt.model.maxdisp)

    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    tar = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)

    mod_s = build("stacked")
    mod_p = build("mpack")
    var = mod_s.init(jax.random.PRNGKey(1), ref, tar, train=False)
    var_p = mod_p.init(jax.random.PRNGKey(1), ref, tar, train=False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var_p)

    out_s = mod_s.apply(var, ref, tar, train=False)
    out_p = mod_p.apply(var, ref, tar, train=False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=2e-5, atol=2e-6)

    out_s, mut_s = mod_s.apply(var, ref, tar, train=True, mutable=["batch_stats"])
    out_p, mut_p = mod_p.apply(var, ref, tar, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=2e-5, atol=2e-6)
    for a, bb in zip(
        jax.tree_util.tree_leaves(mut_s), jax.tree_util.tree_leaves(mut_p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6)
