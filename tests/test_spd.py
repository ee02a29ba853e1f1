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
    for n in (12, 48, 192, 75):  # 75: odd split path
        h = _spd(rng, 4, n)
        got = np.asarray(spd_inverse(jnp.asarray(h, jnp.float64)))
        want = np.linalg.inv(h)
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-9, (n, err)


def test_f32_solve_accuracy_at_solver_scale():
    """The solver's regime: gauge-fixed pose Hessians, f32, κ up to 1e5.
    The production path is spd_inverse as preconditioner + pcg_refine
    (the explicit inverse ALONE may carry O(1) residual at this
    condition — observed on TPU); the refined SOLVE must land in the f32
    Cholesky-solve error class."""
    import jax.scipy.linalg as jsl

    from cg_mrslam_tpu.solver.spd import pcg_refine

    rng = np.random.default_rng(1)
    h64 = _spd(rng, 8, 192, cond=1e5)
    h = jnp.asarray(h64, jnp.float32)
    b64 = rng.normal(size=(8, 192, 1))
    b = jnp.asarray(b64, jnp.float32)
    want = np.linalg.solve(h64, b64)

    minv = spd_inverse(h)
    assert np.isfinite(np.asarray(minv)).all()
    got = np.asarray(pcg_refine(h, b, minv))
    err = np.abs(got - want).max() / np.abs(want).max()

    L = jsl.cho_factor(h, lower=True)
    chol = np.asarray(jsl.cho_solve(L, b))
    err_chol = np.abs(chol - want).max() / np.abs(want).max()
    assert err < 10 * err_chol + 1e-6, (err, err_chol)


def test_pcg_refine_rescues_bad_preconditioner():
    """Even a garbage (but finite, PD-ish) preconditioner must yield a
    finite, convergent solve — the NaN-on-TPU failure mode this layer
    exists to kill."""
    from cg_mrslam_tpu.solver.spd import pcg_refine

    rng = np.random.default_rng(2)
    h64 = _spd(rng, 2, 96, cond=1e4)
    h = jnp.asarray(h64, jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 96, 2)), jnp.float32)
    # deliberately terrible preconditioner: scaled identity
    minv = jnp.broadcast_to(0.01 * jnp.eye(96, dtype=jnp.float32),
                            h.shape)
    got = np.asarray(pcg_refine(h, b, minv, max_iters=256, tol=1e-6))
    assert np.isfinite(got).all()
    want = np.linalg.solve(h64, np.asarray(b, np.float64))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-2, err
