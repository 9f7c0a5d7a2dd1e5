import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops import geometry


def test_disp2depth_roundtrip():
    rng = np.random.default_rng(0)
    depth = rng.uniform(800.0, 1400.0, size=(2, 1, 8, 8)).astype(np.float32)
    # abvalue layout [b, a]: disp = a/depth + b (ref path_reader.py:203)
    ab = np.array([[32.98, -26996.49], [27.76, -22694.45]], dtype=np.float32)
    disp = geometry.depth2disp(jnp.asarray(depth), jnp.asarray(ab))
    back = geometry.disp2depth(disp, jnp.asarray(ab))
    np.testing.assert_allclose(np.asarray(back), depth, rtol=1e-4)


def test_disp2depth_nonfinite_zeroed():
    pred = jnp.array([[[[1.0, 2.0], [2.0, 2.0]]]])  # disp == b gives inf
    ab = jnp.array([[2.0, -5.0]])
    depth = geometry.disp2depth(pred, ab)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.asarray(depth)[0, 0, 0, 1] == 0.0


def test_depth2disp_invalid_fill():
    pred = jnp.array([[[[0.0, 1000.0]]]])
    ab = jnp.array([[32.0, -26000.0]])
    disp = np.asarray(geometry.depth2disp(pred, ab))
    assert disp[0, 0, 0, 0] == -100.0  # div by zero -> fill (ref geometry.py:69)
    np.testing.assert_allclose(disp[0, 0, 0, 1], -26000.0 / 1000.0 + 32.0, rtol=1e-5)


def test_inverse_depth():
    pred = jnp.array([[[[0.0, 2.0]]]])
    out = np.asarray(geometry.inverse_depth(pred))
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 0, 0, 1] == 0.5


def test_regress_affine_recovers_exact_fit():
    rng = np.random.default_rng(1)
    idepth = rng.uniform(0.5, 2.0, size=(3, 1, 16, 16)).astype(np.float32)
    a_true = np.array([4.0, -3.0, 2.5])
    b_true = np.array([1.0, 0.5, -2.0])
    pred = a_true[:, None, None, None] * idepth + b_true[:, None, None, None]
    ab = np.asarray(geometry.regress_affine(jnp.asarray(pred), jnp.asarray(idepth)))
    # layout [b, a] (ref geometry.py:104)
    np.testing.assert_allclose(ab[:, 1], a_true, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ab[:, 0], b_true, rtol=1e-3, atol=1e-3)


def test_regress_affine_robust_to_outliers_and_invalid():
    rng = np.random.default_rng(2)
    idepth = rng.uniform(0.5, 2.0, size=(1, 1, 32, 32)).astype(np.float32)
    pred = 3.0 * idepth + 1.5
    # inject outliers in pred and invalid zeros in gt
    pred[0, 0, 0, :5] += 100.0
    idepth[0, 0, 1, :8] = 0.0
    ab = np.asarray(geometry.regress_affine(jnp.asarray(pred), jnp.asarray(idepth)))
    np.testing.assert_allclose(ab[0, 1], 3.0, atol=0.1)
    np.testing.assert_allclose(ab[0, 0], 1.5, atol=0.2)


def test_intrinsic2KD():
    intr = np.arange(1, 10, dtype=np.float64)
    K, D = geometry.intrinsic2KD(intr)
    assert K[0, 0] == 1 and K[1, 1] == 2 and K[0, 1] == 3
    assert K[0, 2] == 4 and K[1, 2] == 5 and K[2, 2] == 1
    np.testing.assert_array_equal(D, [6, 7, 8, 9])
