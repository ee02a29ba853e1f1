import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core import linearize as L
from cg_mrslam_tpu.solver import gauss_newton as GN

from golden import make_loop_graph, ref_chi2, ref_gn, ref_marginals


def to_jax_graph(init, edges, fixed, cap_v=None, cap_e=None):
    n = len(init)
    cap_v = cap_v or n
    cap_e = cap_e or (len(edges) + 4)
    g = G.empty(cap_v, cap_e, jnp.float64)
    g = dataclasses.replace(
        g,
        poses=g.poses.at[:n].set(jnp.asarray(init)),
        vmask=g.vmask.at[:n].set(True),
        fixed=g.fixed.at[jnp.asarray(sorted(fixed), jnp.int32)].set(True),
        n_vertices=jnp.asarray(n, jnp.int32),
    )
    for (i, j, z, omega) in edges:
        g = G.add_edge(g, i, j, jnp.asarray(z), jnp.asarray(omega))
    return g


def test_gn_matches_numpy_reference():
    rng = np.random.default_rng(0)
    init, edges, _ = make_loop_graph(rng, n=20)
    g = to_jax_graph(init, edges, fixed={0})

    for iters in (1, 5):
        out = GN.optimize(g, iterations=iters)
        ref = ref_gn(init, edges, {0}, iters)
        np.testing.assert_allclose(np.asarray(out.poses)[: len(init)], ref, atol=2e-5)
        c_jax = float(L.chi2(out))
        c_ref = ref_chi2(ref, edges)
        assert abs(c_jax - c_ref) <= 1e-6 * max(1.0, c_ref)


def test_gn_reduces_chi2_and_converges():
    rng = np.random.default_rng(1)
    init, edges, _ = make_loop_graph(rng, n=30)
    g = to_jax_graph(init, edges, fixed={0})
    c0 = float(L.chi2(g))
    out = GN.optimize(g, iterations=10)
    c1 = float(L.chi2(out))
    assert c1 < c0
    # converged: another iteration changes chi2 negligibly
    out2 = GN.optimize(out, iterations=1)
    assert abs(float(L.chi2(out2)) - c1) < 1e-8 * max(1.0, c1)


def test_fixed_vertex_untouched():
    rng = np.random.default_rng(2)
    init, edges, _ = make_loop_graph(rng, n=12)
    g = to_jax_graph(init, edges, fixed={0})
    out = GN.optimize(g, iterations=5)
    np.testing.assert_allclose(
        np.asarray(out.poses)[0], np.asarray(g.poses)[0], atol=1e-12
    )


def test_unused_capacity_is_inert():
    rng = np.random.default_rng(3)
    init, edges, _ = make_loop_graph(rng, n=10)
    g_tight = to_jax_graph(init, edges, fixed={0})
    g_padded = to_jax_graph(init, edges, fixed={0}, cap_v=32, cap_e=64)
    a = GN.optimize(g_tight, iterations=5)
    b = GN.optimize(g_padded, iterations=5)
    np.testing.assert_allclose(
        np.asarray(a.poses)[: len(init)],
        np.asarray(b.poses)[: len(init)],
        atol=1e-10,
    )


def test_edge_subset_solve():
    rng = np.random.default_rng(4)
    init, edges, _ = make_loop_graph(rng, n=10, loop=True)
    g = to_jax_graph(init, edges, fixed={0})
    # restrict to odometry chain only (drop loop edge = last edge)
    sub = g.emask & (jnp.arange(g.emask.shape[0]) != len(edges) - 1)
    out = GN.optimize(g, iterations=5, edge_mask=sub)
    ref = ref_gn(init, edges[:-1], {0}, 5)
    np.testing.assert_allclose(np.asarray(out.poses)[: len(init)], ref, atol=2e-5)


def test_lm_reduces_chi2():
    rng = np.random.default_rng(5)
    init, edges, _ = make_loop_graph(rng, n=25, noise=0.3)
    g = to_jax_graph(init, edges, fixed={0})
    out = GN.optimize_lm(g, iterations=15)
    assert float(L.chi2(out)) < float(L.chi2(g))


def test_vmap_batch_of_graphs():
    rng = np.random.default_rng(6)
    graphs = []
    for _ in range(4):
        init, edges, _ = make_loop_graph(rng, n=15)
        graphs.append(to_jax_graph(init, edges, fixed={0}))
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)
    out = jax.vmap(lambda gg: GN.optimize(gg, iterations=5))(batched)
    for k, g in enumerate(graphs):
        single = GN.optimize(g, iterations=5)
        np.testing.assert_allclose(
            np.asarray(out.poses[k]), np.asarray(single.poses), atol=1e-9
        )


def test_marginal_covariance_matches_numpy():
    rng = np.random.default_rng(7)
    init, edges, _ = make_loop_graph(rng, n=12)
    g = to_jax_graph(init, edges, fixed={0})
    g = GN.optimize(g, iterations=5)
    query = jnp.array([3, 7, 11], jnp.int32)
    cov = np.asarray(GN.marginal_covariance(g, query))
    ref = ref_marginals(np.asarray(g.poses)[: len(init)], edges, {0}, [3, 7, 11])
    np.testing.assert_allclose(cov, ref, atol=1e-5, rtol=1e-4)
    # covariance grows with graph distance from the fixed gauge
    assert np.trace(cov[0]) < np.trace(cov[1])
