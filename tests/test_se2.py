import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.utils import se2


def rand_poses(key, shape):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, shape + (2,), minval=-10, maxval=10)
    th = jax.random.uniform(k2, shape + (1,), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th], axis=-1)


def test_compose_inverse_identity():
    key = jax.random.PRNGKey(0)
    a = rand_poses(key, (64,))
    ident = se2.compose(a, se2.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-9)


def test_compose_associative():
    k = jax.random.PRNGKey(1)
    a, b, c = (rand_poses(kk, (16,)) for kk in jax.random.split(k, 3))
    lhs = se2.compose(se2.compose(a, b), c)
    rhs = se2.compose(a, se2.compose(b, c))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)


def test_relative_definition():
    k = jax.random.PRNGKey(2)
    a, b = (rand_poses(kk, (8,)) for kk in jax.random.split(k, 2))
    np.testing.assert_allclose(
        np.asarray(se2.relative(a, b)),
        np.asarray(se2.compose(se2.inverse(a), b)),
        atol=1e-9,
    )
    # a ∘ rel(a,b) == b (b's angles are already in (-pi, pi])
    np.testing.assert_allclose(
        np.asarray(se2.compose(a, se2.relative(a, b))),
        np.asarray(b),
        atol=1e-9,
    )


def test_normalize_angle():
    t = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 7.0, -7.0])
    n = np.asarray(se2.normalize_angle(t))
    assert np.all(n <= np.pi + 1e-12) and np.all(n >= -np.pi - 1e-12)
    np.testing.assert_allclose(np.cos(n), np.cos(np.asarray(t)), atol=1e-9)
    np.testing.assert_allclose(np.sin(n), np.sin(np.asarray(t)), atol=1e-9)


def test_apply_points():
    pose = jnp.array([1.0, 2.0, np.pi / 2])
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(se2.apply(pose, pts))
    np.testing.assert_allclose(out, [[1.0, 3.0], [0.0, 2.0]], atol=1e-7)


def test_exp_log_roundtrip():
    k = jax.random.PRNGKey(3)
    xi = jax.random.uniform(k, (32, 3), minval=-2, maxval=2)
    back = se2.log(se2.exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-7)


def test_oplus_additive():
    pose = jnp.array([1.0, 1.0, 3.0])
    delta = jnp.array([0.5, -0.5, 0.5])
    out = np.asarray(se2.oplus(pose, delta))
    np.testing.assert_allclose(out[:2], [1.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(out[2], 3.5 - 2 * np.pi, atol=1e-9)
