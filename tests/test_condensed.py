"""Condensed graph property tests: the labeled star must reproduce each
boundary vertex's marginal covariance (conditioned on the gauge) of the
full graph — the defining property of Schur-complement marginalization
reported star-wise (reference condensed_graph_creator.cpp:33-66)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.mr import condensed as CG
from cg_mrslam_tpu.solver import gauss_newton as gn
from cg_mrslam_tpu.utils import se2


def _random_graph(n=24, extra_edges=14, seed=0):
    """Connected random pose graph: chain + random chords."""
    rng = np.random.default_rng(seed)
    g = G.empty(32, 96)
    poses = np.cumsum(rng.normal(0, 1.0, (n, 3)) * [1.0, 0.5, 0.3], axis=0)
    for k in range(n):
        g = G.add_vertex(g, jnp.asarray(poses[k], jnp.float32),
                         fixed=(k == 0))

    def add(i, j):
        z = se2.relative(jnp.asarray(poses[i], jnp.float32),
                         jnp.asarray(poses[j], jnp.float32))
        z = z + rng.normal(0, 0.01, 3).astype(np.float32)
        info = np.diag(rng.uniform(50, 200, 3)).astype(np.float32)
        return G.add_edge(g, i, j, z, info)

    for k in range(n - 1):
        g = add(k, k + 1)
    for _ in range(extra_edges):
        i, j = rng.choice(n, 2, replace=False)
        g = add(int(i), int(j))
    return g


def test_star_reproduces_boundary_marginals():
    g = _random_graph()
    boundary = jnp.asarray([2, 7, 13, 20, 0], jnp.int32)  # last padded
    valid = jnp.asarray([True, True, True, True, False])
    gauge = CG.select_gauge_centroid(g, boundary, valid)
    star = CG.condense(g, boundary, valid, gauge, g.emask)
    assert int(star.valid.sum()) == 3  # gauge slot dropped

    # covariances of the boundary in the FULL graph, gauge fixed
    n = g.poses.shape[0]
    regauged = dataclasses.replace(
        g, fixed=jnp.zeros(n, bool).at[gauge].set(True))
    regauged = gn.gn_step(regauged, g.emask)
    cov_full = np.asarray(gn.marginal_covariance(regauged, boundary))

    # build the star-only graph on the same vertex slots
    sg = G.empty(32, 96)
    sg = dataclasses.replace(
        sg, poses=regauged.poses,
        vmask=jnp.zeros(n, bool).at[boundary].set(valid).at[gauge].set(True),
        fixed=jnp.zeros(n, bool).at[gauge].set(True))
    sg = G.add_edges_masked(
        sg, jnp.broadcast_to(star.gauge, star.boundary.shape),
        star.boundary, star.z, star.info, star.valid)
    cov_star = np.asarray(gn.marginal_covariance(sg, boundary))

    for k in range(4):
        b = int(boundary[k])
        if b == int(gauge):
            continue
        np.testing.assert_allclose(
            cov_star[k], cov_full[k], rtol=2e-2, atol=2e-5,
            err_msg=f"boundary {b}")


def test_splice_star_idempotent_replace():
    g = _random_graph(seed=3)
    boundary = jnp.asarray([3, 9, 15, 0], jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    gauge = CG.select_gauge_centroid(g, boundary, valid)
    star = CG.condense(g, boundary, valid, gauge, g.emask)

    h = _random_graph(seed=4)
    ne0 = int(jnp.sum(h.emask))
    h1 = CG.splice_star(h, star, owner=7)
    assert int(jnp.sum(h1.emask)) == ne0 + int(star.valid.sum())
    # replacing with a new star drops the old one first (idempotence)
    h2 = CG.splice_star(h1, star, owner=7)
    assert int(jnp.sum(h2.emask)) == int(jnp.sum(h1.emask))
    lvl = np.asarray(h2.e_level)[np.asarray(h2.emask)]
    assert (lvl == 8).sum() == int(star.valid.sum())
    # a different peer's star coexists
    h3 = CG.splice_star(h2, star, owner=2)
    assert int(jnp.sum(h3.emask)) == int(jnp.sum(h2.emask)) + int(
        star.valid.sum())


def test_condense_respects_edge_ownership():
    # information received from a peer must not be recondensed back
    g = _random_graph(seed=5)
    # tag half the chords as received from robot 1
    owner = np.array(g.e_owner)
    owner[30:] = 1
    g = dataclasses.replace(g, e_owner=jnp.asarray(owner))
    boundary = jnp.asarray([4, 11, 0], jnp.int32)
    valid = jnp.asarray([True, True, False])
    gauge = CG.select_gauge_centroid(g, boundary, valid)

    own = G.own_edge_mask(g, 0)
    star_own = CG.condense(g, boundary, valid, gauge, own)
    star_all = CG.condense(g, boundary, valid, gauge, g.emask)
    # the own-edges star must carry strictly less information
    i_own = np.asarray(G.unpack_info(star_own.info))
    i_all = np.asarray(G.unpack_info(star_all.info))
    k = int(np.argmax(np.asarray(star_own.valid)))
    assert np.trace(i_own[k]) < np.trace(i_all[k])


def test_optimal_gauge_minimizes_uncertainty():
    # selectOptimalGauge (condensed_graph_buffer.cpp:252-288): among the
    # boundary candidates, the chosen gauge's star has the minimum total
    # uncertainty sum_e det(cov_e) (computeOverallUncertainty, :172-179)
    g = _random_graph(seed=3)
    boundary = jnp.asarray([1, 6, 12, 19, 23], jnp.int32)
    valid = jnp.ones(5, bool)
    best = int(CG.select_gauge_optimal(g, boundary, valid, g.emask))
    assert best in np.asarray(boundary)

    def total_u(gauge):
        star = CG.condense(g, boundary, valid,
                           jnp.asarray(gauge, jnp.int32), g.emask)
        cov = np.linalg.inv(np.asarray(G.unpack_info(star.info)))
        dets = np.linalg.det(cov)
        return float(np.sum(dets[np.asarray(star.valid)]))

    us = {int(b): total_u(int(b)) for b in np.asarray(boundary)}
    assert np.isclose(us[best], min(us.values()), rtol=1e-4)
