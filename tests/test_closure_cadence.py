"""Closure-vote cadence, multi-hypothesis windows, neighbor expansion.

Pins the round-2 parity fixes against the reference semantics:

* the batch consistency check fires exactly when the oldest hypothesis
  reaches age window-1 (``closure_buffer.cpp:104-110``), once per
  hypothesis lifetime;
* keeping BOTH per-region loop-closure twins (normal best + π best,
  ``scan_matcher.cpp:258-279``) lets the vote accept a closure the
  single-best policy structurally misses;
* candidate components widen by ±gap keyframe ids per owner
  (``addNeighboringVertices``, ``graph_slam.cpp:356-382``).
"""

import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.pipeline import closure as CL
from cg_mrslam_tpu.pipeline import graph_dist as GD

INFO = jnp.tile(jnp.asarray([100.0, 0, 0, 100.0, 0, 1000.0], jnp.float32),
                (4, 1))


def _poses(n):
    # straight-line poses 1 m apart
    p = np.zeros((n, 3), np.float32)
    p[:, 0] = np.arange(n)
    return jnp.asarray(p)


def _consistent_batch(v_old, v_new, poses):
    """Zero-error measurements old->new (mutually consistent)."""
    po = np.asarray(poses)[np.asarray(v_old)]
    pn = np.asarray(poses)[np.asarray(v_new)]
    z = np.zeros((len(v_old), 3), np.float32)
    for k in range(len(v_old)):
        c, s = np.cos(po[k, 2]), np.sin(po[k, 2])
        d = pn[k, :2] - po[k, :2]
        z[k] = [c * d[0] + s * d[1], -s * d[0] + c * d[1],
                pn[k, 2] - po[k, 2]]
    return jnp.asarray(z)


def test_vote_fires_only_at_window_minus_one():
    window = 4
    poses = _poses(16)
    buf = CL.empty(16)
    v_old = jnp.asarray([0, 1, 2, 3], jnp.int32)
    v_new = jnp.asarray([8, 9, 10, 11], jnp.int32)
    z = _consistent_batch(v_old, v_new, poses)
    buf = CL.insert(buf, v_old, v_new, z, INFO,
                    jnp.ones(4, bool))

    fired_at = None
    for k in range(window + 1):
        buf, accept, _ = CL.windowed_vote(
            buf, poses, window=window, inlier_threshold=2.0,
            min_inliers=3)
        if bool(np.asarray(accept).any()):
            assert fired_at is None, "vote fired twice"
            fired_at = k
            assert int(np.asarray(accept).sum()) == 4
    # ages 0,1,2,3 → checkList true when age == window-1 == 3,
    # i.e. on the 4th call (k == 3)
    assert fired_at == window - 1
    # consumed: nothing left in the buffer
    assert not bool(np.asarray(buf.mask).any())


def test_rejected_hypotheses_age_out_silently():
    window = 3
    poses = _poses(16)
    buf = CL.empty(16)
    # 2 consistent + below min_inliers → never accepted
    v_old = jnp.asarray([0, 1, 0, 0], jnp.int32)
    v_new = jnp.asarray([8, 9, 8, 8], jnp.int32)
    z = _consistent_batch(v_old, v_new, poses)
    valid = jnp.asarray([True, True, False, False])
    buf = CL.insert(buf, v_old, v_new, z, INFO, valid)
    for _ in range(window + 1):
        buf, accept, _ = CL.windowed_vote(
            buf, poses, window=window, inlier_threshold=2.0,
            min_inliers=3)
        assert not bool(np.asarray(accept).any())
    assert not bool(np.asarray(buf.mask).any())  # evicted by age


def test_multi_hypothesis_beats_single_best():
    """The VERDICT #4 criterion: with one spurious-but-better-scoring
    match per keyframe, inserting ONLY the best hypothesis never
    accumulates a consistent window, while inserting both twins does."""
    window = 8
    poses = _poses(32)
    spur_rng = np.random.default_rng(3)

    def drive(keep_both: bool):
        buf = CL.empty(32)
        accepted = 0
        for k in range(window + 2):
            v_old = jnp.asarray([k], jnp.int32)
            v_new = jnp.asarray([20 + k], jnp.int32)
            z_good = _consistent_batch(v_old, v_new, poses)
            # spurious twin: a random large offset, different each time
            z_bad = z_good + jnp.asarray(
                spur_rng.normal(0, 3.0, (1, 3)).astype(np.float32))
            # "scores": the spurious one wins the argmin
            if keep_both:
                buf = CL.insert(buf, jnp.tile(v_old, 2), jnp.tile(v_new, 2),
                                jnp.concatenate([z_bad, z_good]),
                                INFO[:2], jnp.ones(2, bool))
            else:
                buf = CL.insert(buf, v_old, v_new, z_bad, INFO[:1],
                                jnp.ones(1, bool))
            buf, accept, _ = CL.windowed_vote(
                buf, poses, window=window, inlier_threshold=2.0,
                min_inliers=5)
            accepted += int(np.asarray(accept).sum())
        return accepted

    assert drive(keep_both=False) == 0
    n = drive(keep_both=True)
    assert n >= 5  # the consistent twins get voted in


def test_expand_neighbors_per_owner():
    n, R, gap = 24, 2, 2
    v_owner = np.zeros(n, np.int32)
    v_owner[12:] = 1
    v_remote = np.concatenate([np.arange(12), np.arange(12)]).astype(
        np.int32)
    vmask = np.ones(n, bool)
    vmask[22] = False           # dead slot: never joins
    member = np.zeros(n, bool)
    member[5] = True            # robot 0, keyframe 5
    member[15] = True           # robot 1, keyframe 3
    out = np.asarray(GD.expand_neighbors(
        jnp.asarray(member), jnp.asarray(v_owner), jnp.asarray(v_remote),
        jnp.asarray(vmask), n_robots=R, gap=gap))
    # robot 0: keyframes 3..7 (slots 3..7)
    assert out[3:8].all() and not out[2] and not out[8]
    # robot 1: keyframes 1..5 (slots 13..17)
    assert out[13:18].all() and not out[12] and not out[18]
    # no cross-owner leakage: robot 0 keyframe 10,11 (near boundary) stay out
    assert not out[10] and not out[11]
    assert not out[22]


def test_capacity_drop_counters():
    """No silent caps: closure-list and star truncation is counted on the
    message; region-overflow counting matches components beyond K."""
    import dataclasses as dc

    from cg_mrslam_tpu.config import Config, MRConfig
    from cg_mrslam_tpu.mr import mrslam as MR

    cfg = Config(mr=MRConfig(n_robots=2), max_vertices=32, max_edges=64)
    ranges = np.full(8, 4.0, np.float32)
    st = MR.init_mr_state(cfg, 8, [0.0, 0.0, 0.0], ranges, np.pi, 5.0,
                          my_id=0)
    # pretend peer 1 owns slots 1..9 and I closed on all of them
    v_owner = np.zeros(32, np.int32)
    v_owner[1:10] = 1
    v_remote = np.full(32, -1, np.int32)
    v_remote[0] = 0
    v_remote[1:10] = np.arange(9)
    vmask = np.zeros(32, bool)
    vmask[:10] = True
    slam = dc.replace(st.slam,
                      graph=dc.replace(st.slam.graph,
                                       vmask=jnp.asarray(vmask)),
                      v_owner=jnp.asarray(v_owner),
                      v_remote=jnp.asarray(v_remote))
    out_c = np.zeros((2, 32), bool)
    out_c[1, 1:10] = True
    st = dc.replace(st, slam=slam, out_closures=jnp.asarray(out_c))
    cl = MR.build_closure_list(st, jnp.asarray(1, jnp.int32), cap=4)
    assert int(np.asarray(cl.valid).sum()) == 4
    assert int(np.asarray(cl.dropped)) == 5

    in_c = np.zeros((2, 32), bool)
    in_c[1, :1] = True   # peer asks for my vertex 0 only — no drop
    st2 = dc.replace(st, in_closures=jnp.asarray(in_c))
    star = MR.build_star(st2, jnp.asarray(1, jnp.int32), cap=4)
    assert int(np.asarray(star.dropped)) == 0

    # region overflow counting: two components, capacity one
    from cg_mrslam_tpu.core import graph as G
    g = G.empty(8, 8)
    for k, p in enumerate(([0.0, 0, 0], [1.0, 0, 0], [8.0, 0, 0],
                           [9.0, 0, 0])):
        g = G.add_vertex(g, jnp.asarray(p, jnp.float32), fixed=(k == 0))
    info = jnp.asarray([1.0, 0, 0, 1.0, 0, 1.0])
    g = G.add_edge(g, 0, 1, jnp.asarray([1.0, 0, 0]), info)
    g = G.add_edge(g, 2, 3, jnp.asarray([1.0, 0, 0]), info)
    member = jnp.asarray([True, True, True, True, False, False, False,
                          False])
    labels = GD.components(g, member)
    regions = GD.pick_regions(g, member, labels,
                              jnp.asarray(0, jnp.int32), max_regions=1)
    idx = jnp.arange(8, dtype=jnp.int32)
    n_comp = int(np.asarray(
        jnp.sum((member & (labels == idx)).astype(jnp.int32))))
    kept = int(np.asarray(regions.valid).sum())
    assert n_comp == 2 and kept == 1 and n_comp - kept == 1


def test_expand_neighbors_boundary_no_leak():
    # a member at the END of owner 0's line must not dilate into owner 1
    n, R, gap = 8, 2, 3
    v_owner = np.asarray([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    v_remote = np.asarray([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    member = np.zeros(n, bool)
    member[3] = True
    out = np.asarray(GD.expand_neighbors(
        jnp.asarray(member), jnp.asarray(v_owner), jnp.asarray(v_remote),
        jnp.ones(n, bool), n_robots=R, gap=gap))
    assert out[:4].all()
    assert not out[4:].any()
