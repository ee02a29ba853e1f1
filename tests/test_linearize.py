import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core import linearize as L
from cg_mrslam_tpu.utils import se2

from golden import ref_error


def _rand_graph(key, n=10, dtype=jnp.float64):
    ks = jax.random.split(key, 4)
    g = G.empty(n, 2 * n, dtype)
    poses = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), dtype, -5, 5),
            jax.random.uniform(ks[1], (n, 1), dtype, -3, 3),
        ],
        axis=-1,
    )
    import dataclasses

    g = dataclasses.replace(
        g,
        poses=poses,
        vmask=jnp.ones((n,), bool),
        n_vertices=jnp.asarray(n, jnp.int32),
    )
    for k in range(n - 1):
        z = jax.random.uniform(jax.random.fold_in(ks[2], k), (3,), dtype, -1, 1)
        info = jnp.diag(jnp.array([100.0, 100.0, 1000.0], dtype))
        g = G.add_edge(g, k, k + 1, z, info)
    return g


def test_error_matches_reference():
    g = _rand_graph(jax.random.PRNGKey(0))
    e = np.asarray(L.edge_errors(g.poses, g.e_ij, g.e_z))
    poses = np.asarray(g.poses)
    for k in range(int(g.n_edges)):
        i, j = np.asarray(g.e_ij[k])
        z = np.asarray(g.e_z[k])
        np.testing.assert_allclose(e[k], ref_error(poses[i], poses[j], z), atol=1e-9)


def test_zero_error_at_consistent_poses():
    g = _rand_graph(jax.random.PRNGKey(1))
    # set measurements to the exact relative poses -> zero error
    import dataclasses

    xi = g.poses[g.e_ij[:, 0]]
    xj = g.poses[g.e_ij[:, 1]]
    g = dataclasses.replace(g, e_z=se2.relative(xi, xj))
    e = np.asarray(L.edge_errors(g.poses, g.e_ij, g.e_z))
    mask = np.asarray(g.emask)
    np.testing.assert_allclose(e[mask], 0.0, atol=1e-9)
    assert float(L.chi2(g)) < 1e-12


def test_analytic_jacobians_match_autodiff():
    g = _rand_graph(jax.random.PRNGKey(2))
    e, Ji, Jj = L.linearize(g.poses, g.e_ij, g.e_z)

    def err_k(xi, xj, z):
        return se2.compose(se2.inverse(z), se2.relative(xi, xj))

    for k in range(int(g.n_edges)):
        i, j = (int(x) for x in np.asarray(g.e_ij[k]))
        xi, xj, z = g.poses[i], g.poses[j], g.e_z[k]
        Ji_ad = jax.jacfwd(err_k, argnums=0)(xi, xj, z)
        Jj_ad = jax.jacfwd(err_k, argnums=1)(xi, xj, z)
        np.testing.assert_allclose(np.asarray(Ji[k]), np.asarray(Ji_ad), atol=1e-8)
        np.testing.assert_allclose(np.asarray(Jj[k]), np.asarray(Jj_ad), atol=1e-8)


def test_chi2_respects_mask():
    g = _rand_graph(jax.random.PRNGKey(3))
    full = float(L.chi2(g))
    half_mask = g.emask & (jnp.arange(g.emask.shape[0]) % 2 == 0)
    half = float(L.chi2(g, half_mask))
    assert 0.0 < half < full
