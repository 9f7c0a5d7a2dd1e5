"""deform_conv3d vs naive oracle + zero-offset == regular conv + gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualpixelface_tpu.ops.deform_conv3d import DeformConvPack3D, deform_conv3d


def naive_deform_conv3d(x, offset, weight, bias, stride=1, padding=1, dilation=1):
    """Triple-loop trilinear oracle mirroring deform_im2col_cuda.cuh:27-72."""
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = weight.shape
    bo, do, ho, wo, _ = offset.shape
    out = np.zeros((b, do, ho, wo, cout), np.float64)

    def sample(xb, pd, ph, pw, c):
        if pd <= -1 or pd >= d or ph <= -1 or ph >= h or pw <= -1 or pw >= w:
            return 0.0
        acc = 0.0
        d0, h0, w0 = int(np.floor(pd)), int(np.floor(ph)), int(np.floor(pw))
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    zi, yi, xi = d0 + dz, h0 + dy, w0 + dx
                    if 0 <= zi < d and 0 <= yi < h and 0 <= xi < w:
                        wz = 1 - abs(pd - zi)
                        wy = 1 - abs(ph - yi)
                        wx = 1 - abs(pw - xi)
                        if wz > 0 and wy > 0 and wx > 0:
                            acc += wz * wy * wx * xb[zi, yi, xi, c]
        return acc

    for bi in range(b):
        for z in range(do):
            for y in range(ho):
                for xo in range(wo):
                    k = 0
                    col = np.zeros((kd * kh * kw, cin))
                    for kz in range(kd):
                        for ky in range(kh):
                            for kx in range(kw):
                                od = offset[bi, z, y, xo, k * 3 + 0]
                                oh = offset[bi, z, y, xo, k * 3 + 1]
                                ow = offset[bi, z, y, xo, k * 3 + 2]
                                pd = z * stride - padding + kz * dilation + od
                                ph = y * stride - padding + ky * dilation + oh
                                pw = xo * stride - padding + kx * dilation + ow
                                for c in range(cin):
                                    col[k, c] = sample(x[bi], pd, ph, pw, c)
                                k += 1
                    out[bi, z, y, xo] = np.einsum(
                        "kc,kco->o", col, weight.reshape(kd * kh * kw, cin, cout)
                    )
                    if bias is not None:
                        out[bi, z, y, xo] += bias
    return out


@pytest.fixture
def small_problem():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 5, 5, 3)).astype(np.float32)
    offset = (rng.standard_normal((1, 4, 5, 5, 81)) * 0.7).astype(np.float32)
    weight = (rng.standard_normal((3, 3, 3, 3, 4)) * 0.2).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    return x, offset, weight, bias


def test_matches_naive_oracle(small_problem):
    x, offset, weight, bias = small_problem
    ref = naive_deform_conv3d(x, offset, weight, bias)
    for impl in ("simple", "packed", "packed8"):
        out = np.asarray(
            deform_conv3d(
                jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
                jnp.asarray(bias), impl=impl,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4, err_msg=impl)


def test_packed_matches_simple_large_offsets():
    """Packed quad-gather must agree with the 8-corner form even for wild
    offsets that push corners far out of bounds."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 5, 3)).astype(np.float32))
    offset = jnp.asarray((rng.standard_normal((2, 4, 6, 5, 81)) * 5.0).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)).astype(np.float32))
    a = deform_conv3d(x, offset, weight, None, impl="simple")
    for impl in ("packed", "packed8"):
        b = deform_conv3d(x, offset, weight, None, impl=impl)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=impl)


def test_zero_offset_equals_conv3d(small_problem):
    x, _, weight, bias = small_problem
    offset = jnp.zeros((1, 4, 5, 5, 81), jnp.float32)
    out = deform_conv3d(jnp.asarray(x), offset, jnp.asarray(weight), jnp.asarray(bias))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + jnp.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gradients_flow(small_problem):
    x, offset, weight, bias = small_problem

    def f(x_, o_, w_):
        return jnp.sum(deform_conv3d(x_, o_, w_, None) ** 2)

    gx, go, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight)
    )
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(go)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert np.abs(np.asarray(go)).max() > 0  # offsets get gradient (col2im_coord)

    # numeric check of the offset gradient (the trickiest backward path)
    from jax.test_util import check_grads

    check_grads(
        lambda o_: f(jnp.asarray(x), o_, jnp.asarray(weight)),
        (jnp.asarray(offset),),
        order=1, modes=("rev",), atol=1e-2, rtol=1e-2,
    )


@pytest.mark.parametrize("dimension", ["THW", "HW", "TW", "TH", "T", "H", "W"])
def test_expand_masked_offset_semantics(dimension):
    """expand_masked_offset vs a literal numpy transcription of the reference's
    in-place channel loops (ref modules/deform_conv.py:146-200): tap i's full
    offset channels are i*3+{T,H,W}; active axes read temp channels
    i*len+j in T,H,W order, masked axes are zero."""
    from dualpixelface_tpu.ops.deform_conv3d import expand_masked_offset

    k = 27
    active = [i for i, ax in enumerate("THW") if ax in dimension]
    rng = np.random.default_rng(11)
    temp = rng.standard_normal((2, 3, 4, 5, len(active) * k)).astype(np.float32)

    expect = np.zeros((2, 3, 4, 5, 3 * k), np.float32)
    for i in range(k):
        for j, axis in enumerate(active):
            expect[..., i * 3 + axis] = temp[..., i * len(active) + j]

    out = np.asarray(expand_masked_offset(jnp.asarray(temp), dimension, k))
    np.testing.assert_array_equal(out, expect)


def test_external_offset_module(small_problem):
    """DeformConv3D (external offsets, ref DeformConv deform_conv.py:15-63)
    == the functional deform_conv3d with the module's own weight/bias."""
    from dualpixelface_tpu.ops.deform_conv3d import DeformConv3D

    x, offset, _, _ = small_problem
    mod = DeformConv3D(features=4)
    variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(offset))
    out = mod.apply(variables, jnp.asarray(x), jnp.asarray(offset))
    ref = deform_conv3d(
        jnp.asarray(x), jnp.asarray(offset),
        variables["params"]["weight"], variables["params"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_external_offset_module_masked(small_problem):
    """Dimension-masked external offsets (ref DeformConv_d): 'HW' temp with
    2*K channels == full deform with dT pinned to zero."""
    from dualpixelface_tpu.ops.deform_conv3d import DeformConv3D, expand_masked_offset

    x, _, _, _ = small_problem
    rng = np.random.default_rng(7)
    temp = jnp.asarray((rng.standard_normal((1, 4, 5, 5, 54)) * 0.7).astype(np.float32))
    mod = DeformConv3D(features=4, dimension="HW")
    variables = mod.init(jax.random.PRNGKey(4), jnp.asarray(x), temp)
    out = mod.apply(variables, jnp.asarray(x), temp)
    full = expand_masked_offset(temp, "HW", 27)
    ref = deform_conv3d(
        jnp.asarray(x), full,
        variables["params"]["weight"], variables["params"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # and against the naive oracle with the expanded offsets
    oracle = naive_deform_conv3d(
        x, np.asarray(full),
        np.asarray(variables["params"]["weight"]),
        np.asarray(variables["params"]["bias"]),
    )
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dimension", ["HW", "W"])
def test_masked_pack_zero_init(small_problem, dimension):
    """DeformConvPack3D_d (ref DeformConvPack_d): zero-init offset head ->
    plain conv at init, regardless of the dimension mask."""
    from dualpixelface_tpu.ops.deform_conv3d import DeformConvPack3D_d

    x, _, _, _ = small_problem
    mod = DeformConvPack3D_d(features=6, dimension=dimension)
    variables = mod.init(jax.random.PRNGKey(5), jnp.asarray(x))
    out = mod.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 4, 5, 5, 6)
    params = variables["params"]
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), params["weight"],
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + params["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pack_module_zero_init_offsets(small_problem):
    x, _, _, _ = small_problem
    mod = DeformConvPack3D(features=8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, offset = mod.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 4, 5, 5, 8)
    assert offset.shape == (1, 4, 5, 5, 81)
    # zero-initialised offset head -> behaves as a plain conv at init
    np.testing.assert_array_equal(np.asarray(offset), 0.0)


# --- offset_clamp: the windowed-serving exactness contract (round 5) ------


def test_clamp_offsets_positions_inside_window():
    """Clamped offsets put every sampling position inside the Pallas window
    [out-AP, out+AP+1-EPS] along H and W, for every tap."""
    from dualpixelface_tpu.ops.deform_conv3d import clamp_offsets_to_window
    from dualpixelface_tpu.ops.kernels.deform_fused import AP, EPS

    rng = np.random.default_rng(7)
    off = jnp.asarray((rng.standard_normal((2, 4, 6, 5, 81)) * 9.0).astype(np.float32))
    clamped = np.asarray(clamp_offsets_to_window(off))
    kz, ky, kx = np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij")
    base_h = (ky.reshape(-1) - 1).astype(np.float32)
    base_w = (kx.reshape(-1) - 1).astype(np.float32)
    c = clamped.reshape(2, 4, 6, 5, 27, 3)
    pos_h = base_h + c[..., 1]  # relative to the output voxel
    pos_w = base_w + c[..., 2]
    assert (pos_h >= -AP - 1e-6).all() and (pos_h <= AP + 1 - EPS + 1e-6).all()
    assert (pos_w >= -AP - 1e-6).all() and (pos_w <= AP + 1 - EPS + 1e-6).all()
    # in-window offsets pass through untouched (x0.3 keeps every draw well
    # inside the tightest per-tap bound of 2.0)
    small = jnp.asarray((rng.standard_normal((1, 4, 5, 5, 81)) * 0.3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(clamp_offsets_to_window(small)), np.asarray(small)
    )


def test_clamped_offsets_windowed_equals_unbounded():
    """On clamped offsets the windowed (aperture) path and the exact
    unbounded packed8 path are IDENTICAL — the serving-parity contract:
    a checkpoint trained with offset_clamp evaluates the same under
    `deform_impl=packed8` and `deform_impl=pallas`."""
    from dualpixelface_tpu.ops.deform_conv3d import (
        _windowed_xla,
        clamp_offsets_to_window,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 7, 3)).astype(np.float32))
    # heavy-tailed raw offsets (p99 of trained offsets is 5.9-7.4 voxels)
    raw = jnp.asarray((rng.standard_normal((2, 4, 8, 7, 81)) * 6.0).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)).astype(np.float32))
    off = clamp_offsets_to_window(raw)
    exact = deform_conv3d(x, off, weight, None, impl="packed8")
    windowed = _windowed_xla(x, off, weight, None)
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(windowed), rtol=1e-5, atol=1e-5
    )
    # and WITHOUT the clamp the two paths genuinely differ on these offsets
    # (the test would otherwise prove nothing)
    exact_raw = deform_conv3d(x, raw, weight, None, impl="packed8")
    windowed_raw = _windowed_xla(x, raw, weight, None)
    assert np.abs(np.asarray(exact_raw) - np.asarray(windowed_raw)).max() > 1e-3


def test_clamp_straight_through_gradient():
    """The clamp's backward is the identity: saturated offsets still receive
    gradient (a hard clip would freeze them outside the window forever)."""
    from dualpixelface_tpu.ops.deform_conv3d import clamp_offsets_to_window

    rng = np.random.default_rng(3)
    off = jnp.asarray((rng.standard_normal((1, 2, 3, 3, 81)) * 10.0).astype(np.float32))
    g = jax.grad(lambda o: jnp.sum(clamp_offsets_to_window(o) * 2.0))(off)
    np.testing.assert_array_equal(np.asarray(g), 2.0)


def test_pack_module_offset_clamp_returns_clamped():
    """DeformConvPack3D(offset_clamp=True) conv consumes and RETURNS the
    clamped offsets (the returned tensor is what diagnostics/serving see)."""
    from dualpixelface_tpu.ops.kernels.deform_fused import AP

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 6, 3)).astype(np.float32))
    mod = DeformConvPack3D(features=4, impl="packed8", offset_clamp=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # force a non-trivial offset head so the clamp has something to do
    big = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 7.0) if a.ndim == 1 and a.shape[0] == 81 else a,
        variables,
    )
    out, offset = mod.apply(big, x)
    o = np.asarray(offset).reshape(1, 4, 6, 6, 27, 3)
    # dH/dW channels clamped to the loosest per-tap bound (AP+2-EPS, for the
    # k=0 edge taps whose base sits one voxel below the output)
    assert o[..., 1:].max() <= AP + 2
    assert o[..., 0].max() == 7.0      # dD stays unbounded by design
    # the unbounded evaluation of the same module matches the windowed one
    mod_win = DeformConvPack3D(features=4, impl="pallas", offset_clamp=True)
    out_win, _ = mod_win.apply(big, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_win), rtol=1e-5, atol=1e-5
    )


def test_gather_chunks_equivalent(small_problem):
    """Chunked packed8 gather (memory-bounded exact path for the headline
    shape) is the identical computation, split over output voxels —
    including an uneven chunk split."""
    x, offset, weight, bias = small_problem
    ref = deform_conv3d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(bias), impl="packed8",
    )
    for chunks in (2, 7):  # 7 does not divide N = 4*5*5 = 100
        out = deform_conv3d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
            jnp.asarray(bias), impl="packed8", gather_chunks=chunks,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"chunks={chunks}",
        )
