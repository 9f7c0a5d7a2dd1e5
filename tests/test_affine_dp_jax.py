"""Pure-JAX affine_dp metrics vs the numpy (reference-parity-tested) path."""
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.metrics.affine_dp import metrics, metrics_jax


def test_affine_dp_jax_matches_numpy():
    rng = np.random.default_rng(0)
    b, h, w = 3, 24, 24
    depth = rng.uniform(0.5, 2.0, (b, h, w)).astype(np.float32)
    pred = 3.0 * depth + 0.7 + rng.normal(0, 0.1, depth.shape).astype(np.float32)
    conf = (rng.random((b, h, w)) > 0.2).astype(np.float32)

    ref = metrics(pred, depth, conf)
    out = np.asarray(metrics_jax(jnp.asarray(pred), jnp.asarray(depth), jnp.asarray(conf)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_affine_dp_jax_jittable():
    import jax

    rng = np.random.default_rng(1)
    b, h, w = 2, 16, 16
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (b, h, w)).astype(np.float32))
    pred = depth * 2 + 0.1
    conf = jnp.ones((b, h, w))
    out = jax.jit(metrics_jax)(pred, depth, conf)
    v = np.asarray(out)
    assert np.isfinite(v).all()
    assert v[0] < 1e-3 and v[1] < 1e-3  # perfect affine fit
    assert v[2] < 1e-3  # perfect rank correlation
