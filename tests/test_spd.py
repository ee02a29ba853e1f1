"""Matmul-only SPD inverse (solver.spd) vs numpy, across sizes."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.solver.spd import spd_inverse


def _spd(rng, b, n, cond=1e3):
    q, _ = np.linalg.qr(rng.normal(size=(b, n, n)))
    ev = np.exp(rng.uniform(0, np.log(cond), size=(b, n)))
    return (q * ev[:, None, :]) @ np.swapaxes(q, -1, -2)


def test_matches_numpy_inverse():
    rng = np.random.default_rng(0)
    for n in (12, 24, 48, 192, 300):  # 300: odd split path
        h = _spd(rng, 4, n)
        got = np.asarray(spd_inverse(jnp.asarray(h, jnp.float64)))
        want = np.linalg.inv(h)
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-9, (n, err)


def test_f32_accuracy_at_solver_scale():
    # the solver's regime: gauge-fixed pose Hessians, f32. The honest
    # yardstick is the f32 Cholesky-solve the inverse replaces: both
    # carry O(kappa * eps) error; require the same class.
    import jax.scipy.linalg as jsl

    rng = np.random.default_rng(1)
    h64 = _spd(rng, 8, 192, cond=1e5)
    h = jnp.asarray(h64, jnp.float32)
    want = np.linalg.inv(h64)

    got = np.asarray(spd_inverse(h))
    err = np.abs(got - want).max() / np.abs(want).max()

    L = jsl.cho_factor(h, lower=True)
    chol_inv = np.asarray(jsl.cho_solve(
        L, jnp.broadcast_to(jnp.eye(192, dtype=jnp.float32),
                            h.shape)))
    err_chol = np.abs(chol_inv - want).max() / np.abs(want).max()
    assert err < 10 * err_chol + 1e-6, (err, err_chol)
