"""PCG solver: parity with the dense solver; 20k-pose scaling smoke."""

import numpy as np
import jax.numpy as jnp

from __graft_entry__ import _build_batch
from cg_mrslam_tpu.core.linearize import chi2
from cg_mrslam_tpu.solver import gauss_newton as gn
from cg_mrslam_tpu.solver import pcg


def test_pcg_matches_dense_gn():
    import jax
    g1 = jax.tree_util.tree_map(lambda a: a[0], _build_batch(1))
    dense = gn.optimize(g1, iterations=3)
    sparse = pcg.optimize_pcg(g1, iterations=3, cg_iters=200)
    d = np.asarray(sparse.poses) - np.asarray(dense.poses)
    # angles compare modulo 2π: both solvers reach the same optimum
    # (chi2 ~1e-9) but may land the unbounded θ parameter on different
    # 2π branches — the same rotation
    d[:, 2] = (d[:, 2] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-3)
    assert float(chi2(sparse)) <= float(chi2(g1))


def test_pcg_large_chain():
    # 20k-pose noisy loop: dense H would be [60k,60k] (28 GB) — PCG runs it
    rng = np.random.default_rng(0)
    n = 20_000
    gt = np.zeros((n, 3))
    th = 2 * np.pi / n
    step = 0.5
    for k in range(1, n):
        a = th * k
        gt[k] = gt[k - 1] + [step * np.cos(a), step * np.sin(a), th]
    gt[:, 2] = np.unwrap(gt[:, 2]) % (2 * np.pi)

    def rel(a, b):
        c, s = np.cos(a[..., 2]), np.sin(a[..., 2])
        dx, dy = b[..., 0] - a[..., 0], b[..., 1] - a[..., 1]
        t = (b[..., 2] - a[..., 2] + np.pi) % (2 * np.pi) - np.pi
        return np.stack([c * dx + s * dy, -s * dx + c * dy, t], -1)

    z = rel(gt[:-1], gt[1:])
    noisy = gt + np.concatenate(
        [rng.normal(0, 0.05, (n, 2)), rng.normal(0, 0.01, (n, 1))], 1)
    noisy[0] = gt[0]

    from cg_mrslam_tpu.core.graph import PoseGraph
    e = n  # chain + 1 loop edge
    e_ij = np.zeros((e, 2), np.int32)
    e_ij[:n - 1, 0] = np.arange(n - 1)
    e_ij[:n - 1, 1] = np.arange(1, n)
    e_ij[n - 1] = (n - 1, 0)
    e_z = np.zeros((e, 3), np.float32)
    e_z[:n - 1] = z
    e_z[n - 1] = rel(gt[n - 1], gt[0])
    info = np.tile(np.asarray([100, 0, 0, 100, 0, 1000], np.float32),
                   (e, 1))
    g = PoseGraph(
        poses=jnp.asarray(noisy, jnp.float32),
        vmask=jnp.ones(n, bool),
        fixed=jnp.zeros(n, bool).at[0].set(True),
        e_ij=jnp.asarray(e_ij), e_z=jnp.asarray(e_z),
        e_info=jnp.asarray(info), emask=jnp.ones(e, bool),
        e_level=jnp.zeros(e, jnp.int32), e_owner=jnp.zeros(e, jnp.int32),
        n_vertices=jnp.asarray(n, jnp.int32),
        n_edges=jnp.asarray(e, jnp.int32))

    c0 = float(chi2(g))
    opt = pcg.optimize_pcg(g, iterations=3, cg_iters=100)
    c1 = float(chi2(opt))
    assert np.isfinite(c1)
    assert c1 < c0 * 0.2, (c0, c1)


def test_pcg_marginals_pinned_vertex_matches_dense():
    """ADVICE r03: the dense path returns ~identity covariance blocks
    for pinned/fixed queried vertices (gauge rows are replaced by I
    before inversion); the PCG path's masked rhs/hvp used to return
    all-zero blocks there, which makes the pipeline covariance gate
    singular (NaN d^2). Pin identity-block parity on a fixed query."""
    import jax
    g1 = jax.tree_util.tree_map(lambda a: a[0], _build_batch(1))
    q = jnp.asarray([0, 5, 17], jnp.int32)  # vertex 0 is the gauge
    dense = np.asarray(gn.marginal_covariance(g1, q))
    sparse = np.asarray(pcg.marginal_covariance_pcg(g1, q, cg_iters=200))
    assert np.isfinite(sparse).all()
    np.testing.assert_allclose(sparse[0], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(sparse, dense, atol=5e-3)


def _big_nonchainable(n=550, cap_v=576, closures=24, seed=3):
    """A past-DENSE_MAX graph the chain fast path cannot cover: more
    loop edges than loop_cap AND a vertex whose chain edges are absent
    (held only by loop edges), so ``chainable`` is False."""
    import jax
    from tests.test_chain_solver import _loop_graph
    return _loop_graph(n=n, closures=closures, seed=seed,
                       cap_v=cap_v, cap_e=cap_v + 128)


def test_auto_band_pcg_fallback_parity():
    """ADVICE r03: the auto band's PCG fallback (past DENSE_MAX,
    non-chainable) had no accuracy pin — block-Jacobi under-convergence
    at cg_iters=96/160 would ship unnoticed. Compare optimize_auto and
    marginal_covariance_auto on a 576-capacity non-chainable graph
    against the dense solver (fine on CPU at this scale)."""
    import jax
    import sys
    sys.path.insert(0, ".")

    g = _big_nonchainable()
    # force non-chainable: loop_cap far below the closure count
    from cg_mrslam_tpu.solver import chain as CH
    assert not bool(CH.chainable(g, loop_cap=4))
    assert int(gn.auto_backend(g, loop_cap=4)) == 2  # PCG branch

    dense = gn.optimize(g, iterations=5)
    auto = gn.optimize_auto(g, iterations=5, loop_cap=4)
    cd, ca = float(chi2(dense)), float(chi2(auto))
    c0 = float(chi2(g))
    assert np.isfinite(ca)
    assert ca < 1e-3 * c0, (c0, ca)
    assert ca <= max(2.0 * cd, 1e-3), (cd, ca)

    q = jnp.asarray([3, 100, 400], jnp.int32)
    md = np.asarray(gn.marginal_covariance(dense, q))
    ma = np.asarray(gn.marginal_covariance_auto(auto, q, loop_cap=4))
    assert np.isfinite(ma).all()
    np.testing.assert_allclose(ma, md, rtol=0.15, atol=5e-4)
