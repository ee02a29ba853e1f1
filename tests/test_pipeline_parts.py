"""Candidate selection (graph distances/components) and closure vote tests."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.pipeline import graph_dist as GD
from cg_mrslam_tpu.pipeline import closure as C
from cg_mrslam_tpu.utils import se2


def _chain_graph(n=20, spacing=1.0, loop=False):
    g = G.empty(32, 64)
    for k in range(n):
        g = G.add_vertex(g, jnp.asarray([k * spacing, 0.0, 0.0]),
                         fixed=(k == 0))
    info = np.array([100.0, 0, 0, 100.0, 0, 1000.0], np.float32)
    for k in range(n - 1):
        g = G.add_edge(g, k, k + 1, jnp.asarray([spacing, 0.0, 0.0]), info)
    if loop:
        g = G.add_edge(g, n - 1, 0,
                       jnp.asarray([-(n - 1) * spacing, 0.0, 0.0]), info)
    return g


def test_bounded_distances_chain():
    g = _chain_graph(n=20, spacing=1.0)
    d = np.asarray(GD.bounded_distances(g, jnp.int32(0)))
    np.testing.assert_allclose(d[:20], np.arange(20.0), atol=1e-4)
    assert np.all(d[20:] > 1e8)  # unused slots


def test_bounded_distances_loop_shortcut():
    g = _chain_graph(n=20, spacing=1.0, loop=True)
    d = np.asarray(GD.bounded_distances(g, jnp.int32(0)))
    # loop edge cost = euclidean distance between estimates = 19
    assert abs(d[19] - 19.0) < 1e-3
    assert abs(d[10] - 10.0) < 1e-3


def test_candidate_sets_semantics():
    # U-shaped trajectory: return leg passes close to the start
    g = G.empty(64, 128)
    poses = []
    for k in range(10):                     # out: y=0, x=0..9
        poses.append([k, 0.0, 0.0])
    for k in range(10):                     # back: y=1, x=9..0
        poses.append([9 - k, 1.0, np.pi])
    info = np.array([100, 0, 0, 100, 0, 1000], np.float32)
    for k, p in enumerate(poses):
        g = G.add_vertex(g, jnp.asarray(p, jnp.float32), fixed=(k == 0))
    for k in range(19):
        z = se2.relative(jnp.asarray(poses[k], jnp.float32),
                         jnp.asarray(poses[k + 1], jnp.float32))
        g = G.add_edge(g, k, k + 1, z, info)

    cur = jnp.int32(19)  # back at (0, 1): vertex 0 is 1 m away but ~19 m in graph
    d = GD.bounded_distances(g, cur)
    sets = GD.candidate_sets(g, cur, d)
    near = np.asarray(sets.near)
    loop = np.asarray(sets.loop)
    assert near[18] and not near[0]
    assert loop[0] and loop[1] and not loop[18]
    assert not near[19] and not loop[19]  # current vertex excluded


def test_components_and_regions():
    g = _chain_graph(n=20, spacing=1.0)
    member = np.zeros(32, bool)
    member[2:5] = True    # component A (connected by chain edges)
    member[10:12] = True  # component B
    labels = np.asarray(GD.components(g, jnp.asarray(member)))
    assert labels[2] == labels[3] == labels[4] == 2
    assert labels[10] == labels[11] == 10
    assert labels[0] == 32 and labels[7] == 32

    regions = GD.pick_regions(g, jnp.asarray(member), jnp.asarray(labels),
                              current=jnp.int32(19), max_regions=4)
    valid = np.asarray(regions.valid)
    reps = np.asarray(regions.rep_vertex)
    assert valid.sum() == 2
    # closest member to vertex 19 (x=19) in comp A is 4, in comp B is 11
    assert set(reps[valid]) == {4, 11}


def _mk_buffer(entries):
    buf = C.empty(16)
    k = len(entries)
    vo = jnp.asarray([e[0] for e in entries], jnp.int32)
    vn = jnp.asarray([e[1] for e in entries], jnp.int32)
    z = jnp.asarray([e[2] for e in entries], jnp.float32)
    info = jnp.tile(jnp.asarray([100, 0, 0, 100, 0, 1000], jnp.float32),
                    (k, 1))
    return C.insert(buf, vo, vn, z, info, jnp.ones(k, bool))


def test_consistency_vote_accepts_consistent_set():
    # true poses: revisit leg shifted by drift (0.5, 0.3); consistent
    # hypotheses all encode the TRUE relative pose; outlier encodes junk
    rng = np.random.default_rng(3)
    n_old, n_new = 8, 8
    old = np.stack([np.arange(n_old), np.zeros(n_old),
                    np.zeros(n_old)], 1).astype(np.float32)
    true_new = old + np.array([0.2, 0.4, 0.1], np.float32)  # true revisit poses
    drift = np.array([0.5, 0.3, 0.08], np.float32)
    est_new = np.asarray(
        se2.compose(jnp.asarray(drift), jnp.asarray(true_new)))

    poses = np.zeros((32, 3), np.float32)
    poses[:n_old] = old
    poses[8:8 + n_new] = est_new

    entries = []
    for k in range(n_old):
        z = np.asarray(se2.relative(jnp.asarray(old[k]),
                                    jnp.asarray(true_new[k])))
        entries.append((k, 8 + k, z))
    # one inconsistent hypothesis
    entries.append((0, 15, np.array([3.0, -2.0, 1.0], np.float32)))

    buf = _mk_buffer(entries)
    vote = C.consistency_vote(buf, jnp.asarray(poses),
                              inlier_threshold=2.0, min_inliers=7)
    acc = np.asarray(vote.accept)
    assert int(vote.n_inliers) == 8
    assert acc[:8].sum() == 8  # slots 0..8 hold insertion order
    assert acc.sum() == 8      # outlier rejected


def test_consistency_vote_rejects_underpopulated():
    entries = [(0, 8, np.array([0.1, 0.0, 0.0], np.float32)),
               (1, 9, np.array([0.1, 0.0, 0.0], np.float32))]
    buf = _mk_buffer(entries)
    poses = np.zeros((32, 3), np.float32)
    vote = C.consistency_vote(buf, jnp.asarray(poses),
                              inlier_threshold=2.0, min_inliers=7)
    assert not bool(np.any(np.asarray(vote.accept)))


def test_buffer_tick_eviction_and_add():
    buf = _mk_buffer([(0, 5, np.zeros(3, np.float32))])
    for _ in range(9):
        buf = C.tick(buf, window=10)
    assert bool(np.asarray(buf.mask)[0])
    buf = C.tick(buf, window=10)
    assert not bool(np.any(np.asarray(buf.mask)))

    # add_accepted scatters into graph slots
    g = _chain_graph(n=10)
    buf2 = _mk_buffer([(0, 7, np.array([0.5, 0, 0], np.float32)),
                       (1, 8, np.array([0.5, 0, 0], np.float32))])
    accept = np.zeros(16, bool)
    accept[:2] = True
    ne0 = int(g.n_edges)
    g2 = C.add_accepted(g, buf2, jnp.asarray(accept))
    assert int(g2.n_edges) == ne0 + 2
    assert bool(g2.emask[ne0]) and bool(g2.emask[ne0 + 1])
    np.testing.assert_array_equal(np.asarray(g2.e_ij[ne0]), [0, 7])
    np.testing.assert_array_equal(np.asarray(g2.e_ij[ne0 + 1]), [1, 8])


def test_warm_start_compiles_every_bucket():
    """prewarm_all enumerates every (vertex, edge) bucket pair the
    capacity can visit and joins the compiles, so steady keyframes never
    share the dispatch path with a background compile (the round-5
    latency-tail root cause, artifacts/latency_tail_probe.json)."""
    import numpy as np

    from cg_mrslam_tpu.config import Config, MatcherConfig
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam

    cfg = Config(close_matcher=MatcherConfig(extent=8.0, resolution=0.1,
                                             kernel_radius=0.2),
                 lc_matcher=MatcherConfig(extent=12.0, resolution=0.2,
                                          kernel_radius=0.5),
                 max_vertices=64, max_edges=256, max_beams=16)
    ranges = np.full(16, 4.0, np.float32)
    slam = SingleRobotSlam(cfg, 16, [0.0, 0.0, 0.0], ranges,
                           2 * np.pi * 0.75, 6.0, warm_start=True)
    # every pair compiled, nothing left inflight
    assert not slam.runner._inflight
    # tiny capacity collapses to a single (64, 256) bucket pair — the
    # point is that it is compiled BEFORE stepping
    assert len(slam.runner._compiled) >= 1
    # stepping lands on a prewarmed executable (no new compile events
    # beyond the recorded first-touch bookkeeping)
    slam.observe([0.3, 0.0, 0.0], ranges)
    assert slam.runner.compile_events == []
