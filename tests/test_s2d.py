"""Space-to-depth tower path (ops/s2d.py): exactness vs the fine path.

The s2d execution of the StereoDPNet feature tower must be a pure
reparametrization — identical param tree, identical outputs (eval) and
identical BatchNorm batch statistics (train), so checkpoints and the
reference weight-transfer parity are untouched.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dualpixelface_tpu.ops.s2d import (
    S2DConv,
    s2d_concat,
    s2d_kernel_extent,
    s2d_pack,
    s2d_unpack,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(s2d_unpack(s2d_pack(x))), np.asarray(x))
    # channel layout: parity-major, fine-channel minor
    p = s2d_pack(x)
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, :5]), np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 15:]), np.asarray(x[0, 1, 1]))


def _fine_conv(x, k, stride, dilation):
    p = dilation * (k.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "stride,dilation,kext",
    [(1, 1, 3), (1, 3, 5), (1, 5, 7), (2, 2, 3), (1, 2, 3)],
)
def test_s2dconv_matches_fine(stride, dilation, kext):
    assert s2d_kernel_extent(3, dilation, stride) == kext
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 5)), jnp.float32)
    mod = S2DConv(7, 3, stride, dilation, use_bias=True)
    var = mod.init(jax.random.PRNGKey(0), s2d_pack(x))
    y = mod.apply(var, s2d_pack(x))
    ref = _fine_conv(x, var["params"]["kernel"], stride, dilation)
    ref = ref + var["params"]["bias"]
    got = y if stride == 2 else s2d_unpack(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_s2d_concat_matches_fine_concat():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((1, 4, 6, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 4, 6, 5)), jnp.float32)
    got = s2d_unpack(s2d_concat([s2d_pack(a), s2d_pack(b)]))
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.concatenate([a, b], axis=-1))
    )


def test_s2d_depthwise_matches_fine():
    from dualpixelface_tpu.ops.s2d import S2DDepthwiseConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 4)), jnp.float32)
    mod = S2DDepthwiseConv(3, use_bias=True)
    var = mod.init(jax.random.PRNGKey(3), s2d_pack(x))
    assert var["params"]["kernel"].shape == (3, 3, 1, 4)
    got = s2d_unpack(mod.apply(var, s2d_pack(x)))
    ref = jax.lax.conv_general_dilated(
        x, var["params"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4,
    ) + var["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_dpblock_interblock_packed_roundtrip():
    """ratio_s=1 DPBlock maps packed->packed with the fine param tree
    (conv5's depthwise + the 1x1 skip as parity-structured coarse convs)."""
    from dualpixelface_tpu.models.stereodpnet.modules import DPBlock

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
    fine = DPBlock(5, 1, 1)
    s2d = DPBlock(5, 1, 1, s2d=True)
    var = fine.init(jax.random.PRNGKey(4), x)
    var2 = s2d.init(jax.random.PRNGKey(4), s2d_pack(x))
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var2)
    for a, b in zip(jax.tree_util.tree_leaves(var), jax.tree_util.tree_leaves(var2)):
        assert a.shape == b.shape
    y_fine = fine.apply(var, x, False)
    y_s2d = s2d_unpack(s2d.apply(var, s2d_pack(x), False))
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_fine), rtol=5e-5, atol=5e-5
    )


def _tower_pair(hw=32, mode=True):
    from tests.test_end_to_end import tiny_option
    from dualpixelface_tpu.models.stereodpnet.modules import FeatureExtraction

    opt = tiny_option(model_name="stereodpnet", hw=(hw, hw))
    fine = FeatureExtraction(opt)
    opt2 = tiny_option(model_name="stereodpnet", hw=(hw, hw))
    opt2.model._raw["tower_s2d"] = mode
    s2d = FeatureExtraction(opt2)
    return fine, s2d


@pytest.mark.parametrize("mode", [True, "full"])
def test_feature_extraction_s2d_exact_eval(mode):
    fine, s2d = _tower_pair(mode=mode)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    var = fine.init(jax.random.PRNGKey(1), x)
    var2 = s2d.init(jax.random.PRNGKey(1), x)
    # identical param tree (names AND shapes): checkpoints interchange
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var2)
    for a, b in zip(jax.tree_util.tree_leaves(var), jax.tree_util.tree_leaves(var2)):
        assert a.shape == b.shape
    y_fine = fine.apply(var, x, False)
    y_s2d = s2d.apply(var, x, False)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_fine), rtol=5e-5, atol=5e-5
    )


@pytest.mark.parametrize("mode", [True, "full"])
def test_feature_extraction_s2d_train_stats_match(mode):
    fine, s2d = _tower_pair(mode=mode)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    var = fine.init(jax.random.PRNGKey(2), x)
    y1, m1 = fine.apply(var, x, True, mutable=["batch_stats"])
    y2, m2 = s2d.apply(var, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=5e-5, atol=5e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(m1["batch_stats"]),
        jax.tree_util.tree_leaves(m2["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5)


# NOTE: no odd-input fallback test — the architecture requires factor-96
# inputs (preprocess rounds crops to 96), so H/2 is always even; the guard
# in FeatureExtraction is a safety net only.


def test_dpack_roundtrip():
    from dualpixelface_tpu.ops.s2d import dpack, dunpack

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 5, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(dunpack(dpack(x))), np.asarray(x))


def test_dpack_stride2_conv_matches_fine():
    from dualpixelface_tpu.ops.blocks import _DPackConv3DS2, _DSliceConv3D
    from dualpixelface_tpu.ops.s2d import dpack, dunpack

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 10, 5)), jnp.float32)
    fine = _DSliceConv3D(7, strides=(2, 2, 2))
    var = fine.init(jax.random.PRNGKey(5), x)
    ref = fine.apply(var, x)
    got = dunpack(
        _DPackConv3DS2(7).apply(
            {"params": {"kernel": var["params"]["kernel"]}}, dpack(x)
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_dpack_tconv_matches_fine():
    from dualpixelface_tpu.ops.blocks import _DPackTConv3D, _PackedTConv3D
    from dualpixelface_tpu.ops.s2d import dpack, dunpack

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 4, 12, 10, 5)), jnp.float32)
    fine = _PackedTConv3D(7)
    var = fine.init(jax.random.PRNGKey(6), x)
    ref = fine.apply(var, x)
    got = dunpack(
        _DPackTConv3D(7).apply(
            {"params": {"kernel": var["params"]["kernel"]}}, dpack(x)
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _agg_pair(mode):
    from dualpixelface_tpu.ops.aggregation import PSMNetHGAggregation

    plain = PSMNetHGAggregation(8, upsample=False, dpack_mode="off")
    packed = PSMNetHGAggregation(8, upsample=False, dpack_mode=mode)
    return plain, packed


@pytest.mark.parametrize("mode", ["dres", "full"])
def test_aggregation_dpack_exact_eval(mode):
    """Resident D-packed aggregation: identical param tree and outputs."""
    plain, packed = _agg_pair(mode)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    var = plain.init(jax.random.PRNGKey(3), x)
    var2 = packed.init(jax.random.PRNGKey(3), x)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(var2)
    for a, b in zip(jax.tree_util.tree_leaves(var), jax.tree_util.tree_leaves(var2)):
        assert a.shape == b.shape
    (y1,), (f1,) = plain.apply(var, x, False)
    (y2,), (f2,) = packed.apply(var, x, False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("mode", ["dres", "full"])
def test_aggregation_dpack_train_stats_match(mode):
    plain, packed = _agg_pair(mode)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    var = plain.init(jax.random.PRNGKey(4), x)
    (l1, f1), m1 = plain.apply(var, x, True, mutable=["batch_stats"])
    (l2, f2), m2 = packed.apply(var, x, True, mutable=["batch_stats"])
    for a, b in zip(l1 + f1, l2 + f2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(m1["batch_stats"]),
        jax.tree_util.tree_leaves(m2["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5)
