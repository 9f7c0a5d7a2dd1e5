"""Pallas windowed deform-conv kernel vs its XLA twin (oracle) + gradients.

The kernel's reference anchor is the dcn3d CUDA im2col
(`/root/reference/src/module/dcn3d/src/cuda/deform_im2col_cuda.cuh:193-265`)
with a bounded sampling aperture (docs/PERFORMANCE.md). The XLA twin
`_windowed_xla` is itself oracle-tested against the unbounded formulation
when offsets stay inside the aperture (test_aperture_matches_unbounded).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualpixelface_tpu.ops.deform_conv3d import (
    DeformConvPack3D,
    _windowed_xla,
    deform_conv3d,
)
from dualpixelface_tpu.ops.kernels.deform_fused import AP, deform_conv3d_fused


def _rand(shape, scale=1.0, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale, jnp.float32
    )


@pytest.mark.parametrize(
    "b,d,h,w,c,co,scale",
    [
        (1, 4, 8, 8, 5, 7, 0.5),
        # D<4, ragged W, aggressive clamping — slow: interpret-mode minutes
        pytest.param(1, 3, 8, 11, 5, 6, 8.0, marks=pytest.mark.slow),
        pytest.param(2, 4, 6, 20, 35, 16, 2.0, marks=pytest.mark.slow),
        pytest.param(1, 4, 8, 16, 64, 8, 1.5, marks=pytest.mark.slow),
    ],
)
def test_pallas_kernel_matches_twin(b, d, h, w, c, co, scale):
    x = _rand((b, d, h, w, c), seed=1)
    off = _rand((b, d, h, w, 81), scale, seed=2)
    wt = _rand((3, 3, 3, c, co), 0.1, seed=3)
    bias = _rand((co,), seed=4)

    ref = _windowed_xla(x, off, wt, bias)
    got = deform_conv3d_fused(x, off, wt, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_aperture_matches_unbounded_for_small_offsets():
    """With |offset| < AP - 1 the clamp is inert: the windowed op equals the
    unbounded reference formulation exactly."""
    x = _rand((1, 4, 8, 10, 6), seed=5)
    # |off| + |tap-1| < AP strictly (clip the gaussian tails)
    off = jnp.clip(_rand((1, 4, 8, 10, 81), 0.6, seed=6), -(AP - 1.01), AP - 1.01)
    wt = _rand((3, 3, 3, 6, 4), 0.2, seed=7)

    unbounded = deform_conv3d(x, off, wt, None, impl="packed8")
    windowed = _windowed_xla(x, off, wt, None)
    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(unbounded), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_clamping_is_active_and_bounded():
    """Huge offsets: the windowed op behaves as if positions sit at the
    aperture edge — finite, and equal to the twin with pre-clamped offsets."""
    x = _rand((1, 4, 6, 8, 5), seed=8)
    off = _rand((1, 4, 6, 8, 81), 50.0, seed=9)
    wt = _rand((3, 3, 3, 5, 4), 0.2, seed=10)

    out = deform_conv3d_fused(x, off, wt, None, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    ref = _windowed_xla(x, off, wt, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # clamped result differs from unbounded (sanity that the test is not vacuous)
    unbounded = deform_conv3d(x, off, wt, None, impl="packed8")
    assert float(jnp.max(jnp.abs(unbounded - out))) > 1e-3


@pytest.mark.slow
def test_custom_vjp_gradients_match_twin():
    """grad of impl='pallas' == grad of the XLA twin for x, offset, weight."""
    x = _rand((1, 4, 6, 8, 5), seed=11)
    off = _rand((1, 4, 6, 8, 81), 1.5, seed=12)
    wt = _rand((3, 3, 3, 5, 4), 0.2, seed=13)
    bias = _rand((4,), seed=14)
    cot = _rand((1, 4, 6, 8, 4), seed=15)

    def loss_pallas(x_, o_, w_, b_):
        return jnp.sum(deform_conv3d(x_, o_, w_, b_, impl="pallas") * cot)

    def loss_twin(x_, o_, w_, b_):
        return jnp.sum(_windowed_xla(x_, o_, w_, b_) * cot)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, off, wt, bias)
    g2 = jax.grad(loss_twin, argnums=(0, 1, 2, 3))(x, off, wt, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_deform_conv_pack3d_pallas_impl():
    """Module-level wiring: impl='pallas' produces (out, offset) with the
    same shapes/values as the windowed twin at zero-init offsets."""
    x = _rand((1, 4, 8, 8, 5), seed=16)
    mod_p = DeformConvPack3D(6, (3, 3, 3), 1, 1, impl="pallas")
    mod_x = DeformConvPack3D(6, (3, 3, 3), 1, 1, impl="packed8")
    var = mod_p.init(jax.random.PRNGKey(0), x)
    out_p, off_p = mod_p.apply(var, x)
    out_x, off_x = mod_x.apply(var, x)
    # offsets are zero at init -> aperture inert -> identical outputs
    np.testing.assert_allclose(np.asarray(off_p), np.asarray(off_x))
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_fused_backward_matches_direct_vjp():
    """The fused Pallas backward (one-hot-matmul run in reverse, the train
    path) must match the direct vjp of the windowed twin, multi-block H."""
    from dualpixelface_tpu.ops import deform_conv3d as dc3d

    x = _rand((1, 4, 80, 8, 5), seed=20)  # H=80 -> several h-blocks
    off = _rand((1, 4, 80, 8, 81), 1.5, seed=21)
    wt = _rand((3, 3, 3, 5, 4), 0.2, seed=22)
    bias = _rand((4,), seed=23)
    cot = _rand((1, 4, 80, 8, 4), seed=24)

    g_fused = dc3d._pallas_bwd((x, off, wt, bias), cot)
    _, vjp = jax.vjp(dc3d._windowed_xla, x, off, wt, bias)
    g_direct = vjp(cot)
    # block accumulation reorders the weight-grad reduction over samples:
    # fp32 reassociation noise ~1e-4
    for a, b in zip(g_fused, g_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_fused_backward_zero_offset_init():
    """At the zero-offset initialization every sampling position is an exact
    integer: the hat-gradient tie convention must still produce the twin's
    (nonzero) offset gradients — sign(0)=0 would silently freeze the offset
    head at the start of training."""
    from dualpixelface_tpu.ops import deform_conv3d as dc3d

    x = _rand((1, 4, 8, 8, 5), seed=30)
    off = jnp.zeros((1, 4, 8, 8, 81), jnp.float32)
    wt = _rand((3, 3, 3, 5, 4), 0.2, seed=31)
    cot = _rand((1, 4, 8, 8, 4), seed=32)

    g_fused = dc3d._pallas_bwd((x, off, wt, None), cot)
    _, vjp = jax.vjp(lambda x_, o_, w_: dc3d._windowed_xla(x_, o_, w_, None), x, off, wt)
    g_direct = vjp(cot)
    assert float(jnp.abs(g_direct[1]).sum()) > 0.0
    for a, b in zip(g_fused[:3], g_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_fused_backward_smoke_fast():
    """Fast-tier coverage of the v5 backward kernel (the thorough vjp suites
    are slow-tier): one tiny h-block (hb=4), nonzero offsets, all three
    gradient outputs vs the twin's direct vjp."""
    from dualpixelface_tpu.ops import deform_conv3d as dc3d
    from dualpixelface_tpu.ops.kernels import deform_fused as df

    x = _rand((1, 2, 4, 8, 3), seed=40)
    off = _rand((1, 2, 4, 8, 81), 1.2, seed=41)
    wt = _rand((3, 3, 3, 3, 4), 0.2, seed=42)
    cot = _rand((1, 2, 4, 8, 4), seed=43)

    g_fused = df.deform_conv3d_fused_bwd(x, off, wt, None, cot, interpret=True)
    _, vjp = jax.vjp(lambda x_, o_, w_: dc3d._windowed_xla(x_, o_, w_, None), x, off, wt)
    g_direct = vjp(cot)
    for a, b in zip(g_fused[:3], g_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_kernel_v7_matches_twin(monkeypatch):
    """v7 (TGRP-tap union dots, round 5) is the same windowed math as the
    v5 default — oracle-checked against the XLA twin, aggressive offsets."""
    monkeypatch.setenv("DPFACE_DEFORM_KV", "v7")
    jax.clear_caches()
    try:
        x = _rand((1, 4, 8, 16, 5), seed=50)
        off = _rand((1, 4, 8, 16, 81), 3.0, seed=51)
        wt = _rand((3, 3, 3, 5, 6), 0.1, seed=52)
        ref = _windowed_xla(x, off, wt, None)
        got = deform_conv3d_fused(x, off, wt, None, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
    finally:
        jax.clear_caches()  # drop the v7-traced _fused_call entries


def test_kernel_v7_backward_matches_direct_vjp(monkeypatch):
    """v7 backward (TGRP-tap union structure in reverse) vs the twin's
    direct vjp — all three gradient outputs."""
    from dualpixelface_tpu.ops import deform_conv3d as dc3d
    from dualpixelface_tpu.ops.kernels import deform_fused as df

    monkeypatch.setenv("DPFACE_DEFORM_KV", "v7")
    jax.clear_caches()
    try:
        x = _rand((1, 4, 8, 16, 5), seed=60)
        off = _rand((1, 4, 8, 16, 81), 1.5, seed=61)
        wt = _rand((3, 3, 3, 5, 4), 0.2, seed=62)
        cot = _rand((1, 4, 8, 16, 4), seed=63)

        g_fused = df.deform_conv3d_fused_bwd(x, off, wt, None, cot, interpret=True)
        _, vjp = jax.vjp(
            lambda x_, o_, w_: dc3d._windowed_xla(x_, o_, w_, None), x, off, wt
        )
        g_direct = vjp(cot)
        for a, b in zip(g_fused[:3], g_direct):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
            )
    finally:
        jax.clear_caches()
