"""Top-k multi-hypothesis loop closure (round-2 verdict item 7).

The reference keeps ALL per-region match results above threshold,
deduped on the (0.5, 0.5, 0.2) merge lattice (``scan_matcher.cpp:
246-277``, ``chargrid.cpp:36-46``); the round-2 rebuild kept exactly
one hypothesis per direction. These tests pin the round-3 fix:

* in a self-similar scene (two identical structures), the per-lattice-
  cell NMS surfaces the SECOND basin as its own hypothesis instead of
  filling the top-k with neighbors of the first minimum;
* a genuine second candidate that enters the window gets accepted by
  the consistency vote in a case where best-only matching never even
  buffers it — the closure the old code structurally could not find.
"""

import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import grid_search
from cg_mrslam_tpu.pipeline import closure as CL
from cg_mrslam_tpu.pipeline.slam import _lattice_topk
from cg_mrslam_tpu.utils import se2


def _l_cluster(ox: float, oy: float = 0.0) -> np.ndarray:
    """An L-shaped point cluster anchored at (ox, oy)."""
    xs = np.linspace(0.0, 1.0, 21)
    leg1 = np.stack([ox + xs, np.full_like(xs, oy)], 1)
    leg2 = np.stack([np.full_like(xs, ox), oy + xs], 1)
    return np.concatenate([leg1, leg2]).astype(np.float32)


def test_lattice_topk_surfaces_second_basin():
    """Two identical structures 3 m apart → the score volume has two
    separated minima; plain top-k returns neighbors of the best basin,
    per-cell NMS returns both basins as distinct hypotheses."""
    ref = np.concatenate([_l_cluster(0.0), _l_cluster(3.0)])
    world = jnp.asarray(ref)
    pv = jnp.ones((ref.shape[0],), bool)
    center = jnp.asarray([1.5, 0.5], jnp.float32)
    grid = build_grid(world, pv, center, cells=200, resolution=0.05,
                      kernel_radius=0.3)

    cur = jnp.asarray(_l_cluster(0.0))          # local frame = one L
    cv = jnp.ones((cur.shape[0],), bool)
    base = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    r = grid_search(grid, center, 0.05, cur, cv, base,
                    th_span=0.1, th_res=0.05, x_span=4.0, y_span=0.5,
                    topk=16)
    q = jnp.asarray([0.5, 0.5, 0.2], jnp.float32)
    poses, scores, valid = _lattice_topk(r.poses, r.scores, q, 2)
    assert bool(valid[0]) and bool(valid[1])
    xs = sorted([float(poses[0, 0]), float(poses[1, 0])])
    # both basins present: one near x=0 (the true pose), one near x=3
    assert abs(xs[0] - 0.0) < 0.5, xs
    assert abs(xs[1] - 3.0) < 0.5, xs
    # raw top-k alone would NOT have surfaced the far basin at k=2
    raw_xs = np.asarray(r.poses[:2, 0])
    assert np.all(np.abs(raw_xs - raw_xs[0]) < 0.5), raw_xs


def test_vote_accepts_hypothesis_single_best_misses():
    """A wrong-but-better-scoring hypothesis A and the true hypothesis B
    from ONE region: with both buffered (top-k), the window vote accepts
    B and rejects A; with best-only buffering, B never exists and the
    true closure is structurally lost."""
    # poses: vertices 0..5 on a line; the window holds 4 correct
    # closures (consistent with identity motion) from earlier keyframes
    n = 8
    poses = jnp.asarray(
        np.stack([np.arange(n, dtype=np.float32),
                  np.zeros(n, np.float32),
                  np.zeros(n, np.float32)], 1))
    info = jnp.tile(jnp.asarray([100.0, 0, 0, 100.0, 0, 1000.0],
                                jnp.float32), (1, 1))

    def hyp(v_old, v_new, z):
        return (jnp.asarray([v_old], jnp.int32),
                jnp.asarray([v_new], jnp.int32),
                jnp.asarray([z], jnp.float32), info,
                jnp.asarray([True]))

    buf = CL.empty(12)
    # 4 consistent closures: measured relative pose == actual
    for (a, b) in ((0, 4), (1, 5), (2, 6), (0, 5)):
        z = se2.relative(poses[a], poses[b])
        buf = CL.insert(buf, *hyp(a, b, np.asarray(z)))
    # hypothesis A (wrong): claims vertex 7 sits 2 m off its true spot
    zA = np.asarray(se2.relative(poses[3], poses[7])) + \
        np.asarray([2.0, 0.0, 0.0], np.float32)
    # hypothesis B (true): the same region's second candidate
    zB = np.asarray(se2.relative(poses[3], poses[7]))

    buf_both = CL.insert(CL.insert(buf, *hyp(3, 7, zA)), *hyp(3, 7, zB))
    vote = CL.consistency_vote(buf_both, poses, inlier_threshold=2.0,
                               min_inliers=4)
    acc = np.asarray(vote.accept)
    zs = np.asarray(buf_both.z)
    pair = ((np.asarray(buf_both.v_old) == 3)
            & (np.asarray(buf_both.v_new) == 7)
            & np.asarray(buf_both.mask))
    is_b = pair & np.all(np.isclose(zs, zB), axis=1)
    is_a = pair & np.all(np.isclose(zs, zA), axis=1)
    assert acc[is_b].all(), "true second hypothesis must be accepted"
    assert not acc[is_a].any(), "wrong hypothesis must be rejected"

    # best-only world: A alone is buffered — the vote still rejects it,
    # and the true closure edge simply never exists anywhere
    buf_a = CL.insert(buf, *hyp(3, 7, zA))
    vote_a = CL.consistency_vote(buf_a, poses, inlier_threshold=2.0,
                                 min_inliers=4)
    acc_a = np.asarray(vote_a.accept)
    zs_a = np.asarray(buf_a.z)
    pair_a = ((np.asarray(buf_a.v_old) == 3)
              & (np.asarray(buf_a.v_new) == 7)
              & np.asarray(buf_a.mask))
    was_a = pair_a & np.all(np.isclose(zs_a, zA), axis=1)
    assert not acc_a[was_a].any()
    has_b = pair_a & np.all(np.isclose(zs_a, zB), axis=1)
    assert not has_b.any(), "B is structurally absent with best-only"
