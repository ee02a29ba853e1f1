"""Chain+Woodbury solver parity with the dense GN solver.

The fast path must produce the SAME update as the dense solver on any
graph where every free vertex touches a chain edge — the Woodbury
identity is exact, not approximate. Pinned here on chains with loop
closures, gauge variations, masked slots, and the vmap'd batch form.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core.linearize import chi2
from cg_mrslam_tpu.solver import chain as CH
from cg_mrslam_tpu.solver import gauss_newton as gn


def _loop_graph(n=50, closures=5, seed=0, cap_v=64, cap_e=128):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack([8 * np.cos(th), 8 * np.sin(th), th + np.pi / 2], 1)
    est = gt + np.concatenate(
        [rng.normal(0, 0.2, (n, 2)), rng.normal(0, 0.05, (n, 1))], 1)
    est[0] = gt[0]

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                         (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi])

    g = G.empty(cap_v, cap_e)
    g = G.add_vertex(g, jnp.asarray(est[0], jnp.float32), fixed=True)
    info = jnp.asarray([100.0, 10.0, 0, 100.0, 0, 1000.0], jnp.float32)
    for k in range(1, n):
        g = G.add_vertex(g, jnp.asarray(est[k], jnp.float32))
    for k in range(n - 1):
        g = G.add_edge(g, k, k + 1, jnp.asarray(rel(gt[k], gt[k + 1]),
                                                jnp.float32), info)
    for c in range(closures):
        i = int(rng.integers(0, n - 1))
        j = (i + n // 2) % n
        i, j = min(i, j), max(i, j)
        if j == i + 1:
            continue
        g = G.add_edge(g, i, j, jnp.asarray(rel(gt[i], gt[j]), jnp.float32),
                       info)
    return g


def test_chainable_detection():
    g = _loop_graph()
    assert bool(CH.chainable(g))
    # isolate a free vertex: kill its chain edges
    kill = np.zeros(g.e_ij.shape[0], bool)
    e_ij = np.asarray(g.e_ij)
    em = np.asarray(g.emask)
    for k in range(len(kill)):
        if em[k] and 10 in (e_ij[k, 0], e_ij[k, 1]) and \
                abs(e_ij[k, 1] - e_ij[k, 0]) == 1:
            kill[k] = True
    g2 = G.remove_edges(g, jnp.asarray(kill))
    assert not bool(CH.chainable(g2))


def test_chain_delta_matches_dense():
    g = _loop_graph()
    eq = gn.build_normal_equations(g)
    dx_dense = gn.solve_normal_equations(eq)
    dx_chain, dropped = CH.chain_delta(g, loop_cap=16)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(dx_chain).reshape(-1),
                               np.asarray(dx_dense), rtol=2e-3, atol=2e-4)


def test_optimize_chain_chi2_matches_dense():
    g = _loop_graph(seed=3)
    c0 = float(chi2(g))
    dense = gn.optimize(g, iterations=5)
    fast = CH.optimize_chain(g, iterations=5, loop_cap=16)
    cd, cf = float(chi2(dense)), float(chi2(fast))
    assert cf < 0.05 * c0                       # actually converged
    assert abs(cf - cd) <= 0.01 * max(cd, 1e-6)


def test_loop_cap_overflow_counted():
    g = _loop_graph(closures=8)
    _, dropped = CH.chain_delta(g, loop_cap=2)
    assert int(dropped) >= 1


def test_batched_vmap_form():
    gs = [_loop_graph(seed=s) for s in range(4)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gs)
    out = jax.vmap(lambda gg: CH.optimize_chain(gg, iterations=3,
                                                loop_cap=16))(batch)
    ref = jax.vmap(lambda gg: gn.optimize(gg, iterations=3))(batch)
    cf = np.asarray(jax.vmap(chi2)(out))
    cd = np.asarray(jax.vmap(chi2)(ref))
    # exact measurements → both converge to ~0; compare at solver-noise
    # scale rather than relative on ~1e-9 values
    assert (cf < 1e-6).all(), cf
    np.testing.assert_allclose(cf, cd, atol=1e-6)
