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


def _merged_content(cap_n, cap_e, n_own=360, n_foreign=18, seed=3):
    """Same merged-graph content (own chain + own closures + edgeless
    foreign vertices, interleaved) at a configurable capacity."""
    rng = np.random.default_rng(seed)
    g = G.empty(cap_n, cap_e)
    v_owner, v_remote = [], []
    own_slots = []
    kf = 0
    step = max(2, (n_own + n_foreign) // max(n_foreign, 1))
    poses = np.cumsum(rng.normal(0, 0.5, (n_own, 3))
                      * [1.0, 0.4, 0.2], axis=0)
    fi = 0
    for k in range(n_own + n_foreign):
        if fi < n_foreign and k % step == step - 1:
            g = G.add_vertex(g, jnp.asarray(
                rng.normal(0, 5.0, 3), jnp.float32))
            v_owner.append(1)
            v_remote.append(fi)
            fi += 1
        else:
            g = G.add_vertex(g, jnp.asarray(poses[kf], jnp.float32),
                             fixed=(kf == 0))
            v_owner.append(0)
            v_remote.append(kf)
            own_slots.append(k)
            kf += 1
            if kf >= n_own:
                break

    def add(si, sj):
        z = se2.relative(g.poses[si], g.poses[sj])
        z = z + rng.normal(0, 0.01, 3).astype(np.float32)
        info = np.diag(rng.uniform(50, 200, 3)).astype(np.float32)
        return G.add_edge(g, si, sj, z, info, owner=0)

    for a, b in zip(own_slots[:-1], own_slots[1:]):
        g = add(a, b)
    for _ in range(12):
        i, j = rng.choice(len(own_slots), 2, replace=False)
        g = add(own_slots[int(i)], own_slots[int(j)])
    vo = np.zeros(cap_n, np.int32)
    vr = np.zeros(cap_n, np.int32)
    vo[:len(v_owner)] = v_owner
    vr[:len(v_remote)] = v_remote
    return g, jnp.asarray(vo), jnp.asarray(vr), own_slots


def test_condense_chain_band_matches_dense_band():
    """condense past DENSE_MAX capacity (chain-band settle + chain
    marginals under the ownership permutation) must produce the same
    star as the dense band on identical graph content — the chip-safety
    rework (dense [3N,3N] at 1024 capacity is f32 garbage on TPU) may
    not change semantics. Also pins that the own-edge subgraph of a
    merged graph IS chainable under the permutation: edgeless foreign
    vertices do not disqualify the fast path."""
    from cg_mrslam_tpu.solver import chain as CH

    gb, vo, vr, own_slots = _merged_content(1024, 4096)
    gs, _, _, _ = _merged_content(512, 2048)
    own_b = G.own_edge_mask(gb, 0)
    own_s = G.own_edge_mask(gs, 0)
    order = CH.chain_order(vo, vr, gb.vmask)
    assert bool(CH.chainable(gb, own_b, loop_cap=64, order=order))

    boundary = jnp.asarray([own_slots[5], own_slots[100],
                            own_slots[250], own_slots[340]], jnp.int32)
    valid = jnp.ones(4, bool)
    gauge = CG.select_gauge_centroid(gb, boundary, valid)
    star_b = CG.condense(gb, boundary, valid, gauge, own_b, order)
    star_s = CG.condense(gs, boundary, valid, gauge, own_s)

    np.testing.assert_array_equal(np.asarray(star_b.valid),
                                  np.asarray(star_s.valid))
    np.testing.assert_allclose(np.asarray(star_b.z),
                               np.asarray(star_s.z),
                               rtol=1e-3, atol=1e-3)
    keep = np.asarray(star_b.valid)
    np.testing.assert_allclose(np.asarray(star_b.info)[keep],
                               np.asarray(star_s.info)[keep],
                               rtol=0.05, atol=0.05)
