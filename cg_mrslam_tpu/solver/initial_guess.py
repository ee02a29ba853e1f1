"""Spanning-tree initial guess — g2o ``computeInitialGuess`` equivalent.

The reference runs ``initializeOptimization(edges)`` →
``computeInitialGuess()`` → ``optimize(1)`` before every sub-graph solve
(``/root/reference/src/slam/graph_manipulator.cpp:116-124``), i.e. it
REPLACES all free vertex estimates by composing measurements along a
minimum-hop spanning tree rooted at the fixed (gauge) vertices — g2o's
``EstimatePropagator`` with the uniform edge cost of
``SparseOptimizer::computeInitialGuess``. SURVEY §7 lists matching this as
a chi2-parity hard part: on a badly initialized graph, plain GN from the
raw estimates lands somewhere g2o would not.

TPU realisation: synchronous BFS relaxation. Each sweep settles the next
hop layer — two scatter-mins (distance, then a deterministic per-vertex
winning edge) and one gather of the parent pose composed with the edge
measurement. All shapes static; ``sweeps`` bounds the tree depth (pass
≥ graph diameter for an exact replacement; pose graphs are odometry
chains, so diameter ≈ live vertex count).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.core.graph import PoseGraph
from cg_mrslam_tpu.utils import se2

_BIG = jnp.int32(2**30)


@partial(jax.jit, static_argnames=("sweeps",))
def spanning_tree_guess(g: PoseGraph, edge_mask: jax.Array | None = None,
                        sweeps: int = 64) -> PoseGraph:
    """Re-initialize free vertices by composing measurements along a
    min-hop spanning tree from the fixed vertices.

    ``edge_mask`` restricts the propagation to an edge subset (the
    reference's ``initializeOptimization(edgeSet)`` semantics). Fixed
    vertices and vertices unreachable within ``sweeps`` hops keep their
    current estimates (g2o leaves disconnected vertices untouched too).
    Ties between same-hop parents resolve to the lowest edge index with
    the forward direction preferred — deterministic, matching a fixed
    traversal order.
    """
    mask = g.emask if edge_mask is None else (g.emask & edge_mask)
    n = g.poses.shape[0]
    ecap = g.e_ij.shape[0]
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    eidx = jnp.arange(ecap, dtype=jnp.int32)

    dist0 = jnp.where(g.fixed & g.vmask, 0, _BIG).astype(jnp.int32)

    def sweep(carry, _):
        dist, poses = carry
        di, dj = dist[vi], dist[vj]
        # pass 1: settle the next distance layer
        newd = dist
        newd = newd.at[vj].min(jnp.where(mask & (di < _BIG), di + 1, _BIG))
        newd = newd.at[vi].min(jnp.where(mask & (dj < _BIG), dj + 1, _BIG))
        # pass 2: deterministic winning edge per improved vertex
        # (code = 2·edge + direction; min over codes)
        win_j = mask & (di + 1 == newd[vj]) & (newd[vj] < dist[vj])
        win_i = mask & (dj + 1 == newd[vi]) & (newd[vi] < dist[vi])
        code = jnp.full((n,), _BIG, jnp.int32)
        code = code.at[vj].min(jnp.where(win_j, 2 * eidx, _BIG))
        code = code.at[vi].min(jnp.where(win_i, 2 * eidx + 1, _BIG))
        improved = code < _BIG
        e_sel = jnp.clip(code // 2, 0, ecap - 1)
        side = code % 2
        fwd_pose = se2.compose(poses[vi[e_sel]], g.e_z[e_sel])       # [N,3]
        bwd_pose = se2.compose(poses[vj[e_sel]],
                               se2.inverse(g.e_z[e_sel]))
        prop = jnp.where((side == 0)[:, None], fwd_pose, bwd_pose)
        poses = jnp.where(improved[:, None], prop, poses)
        dist = jnp.where(improved, newd, dist)
        return (dist, poses), None

    (dist, poses), _ = jax.lax.scan(sweep, (dist0, g.poses), None,
                                    length=sweeps)
    return dataclasses.replace(g, poses=poses)


def optimize_with_guess(g: PoseGraph, iterations: int = 1,
                        edge_mask: jax.Array | None = None,
                        sweeps: int = 64) -> PoseGraph:
    """The reference's full ``GraphManipulator::optimize`` sequence:
    spanning-tree initial guess, then ``iterations`` Gauss–Newton steps on
    the edge subset (``graph_manipulator.cpp:116-124``)."""
    from cg_mrslam_tpu.solver import gauss_newton as gn

    g = spanning_tree_guess(g, edge_mask, sweeps=sweeps)
    return gn.optimize(g, iterations, edge_mask)
