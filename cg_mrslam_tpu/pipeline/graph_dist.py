"""Batched bounded graph distances + candidate grouping on the pose graph.

TPU-native replacement for g2o ``HyperDijkstra`` as used by the reference's
``VerticesFinder`` (``/root/reference/src/slam/vertices_finder.cpp:35-114``):
single-source shortest paths with Euclidean edge costs, thresholded into a
"near" set (graph distance ≤ 2 m — scan-match candidates) and a "loop" set
(graph distance > 5 m but Euclidean distance ≤ 50 m — loop-closure
candidates, ``:61-79``), then partitioned into connected components
(``findSetsOfVertices``, ``:82-99``) with a closest-vertex representative
per component (``findClosestVertex``, ``:101-114``).

Instead of a heap-based Dijkstra we run a fixed number of min-plus
relaxation sweeps (Bellman–Ford) — every sweep is one gather + scatter-min
over all edges, so the whole search is a handful of fused XLA ops and
``vmap``s over a batch of graphs. Distances only need to be resolved up to
the loop threshold (5 m); with keyframes ≥ 0.25 m apart that is ≤ ~20 hops,
so a static sweep count of 32 is exact for every quantity consumed
downstream (values beyond the bound saturate at +inf semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.core.graph import PoseGraph

FAR = jnp.float32(1e9)


@partial(jax.jit, static_argnames=("sweeps",))
def bounded_distances(g: PoseGraph, source: jax.Array,
                      sweeps: int = 32) -> jax.Array:
    """Graph distance [N] from ``source`` with Euclidean edge costs.

    Edge cost = Euclidean distance between the endpoint estimates (the
    reference's Dijkstra cost functor, ``vertices_finder.h:54-94``).
    Distances that need more than ``sweeps`` relaxations stay at FAR.
    """
    n = g.poses.shape[0]
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    w = jnp.linalg.norm(g.poses[vi, :2] - g.poses[vj, :2], axis=-1)
    w = jnp.where(g.emask, w, FAR)

    dist0 = jnp.full((n,), FAR).at[source].set(0.0)

    def sweep(dist, _):
        di = dist[vi] + w
        dj = dist[vj] + w
        dist = dist.at[vj].min(di)
        dist = dist.at[vi].min(dj)
        return dist, None

    dist, _ = jax.lax.scan(sweep, dist0, None, length=sweeps)
    return jnp.where(g.vmask, dist, FAR)


class CandidateSets(NamedTuple):
    near: jax.Array  # [N] bool — scan-match candidates (graph dist ≤ sm)
    loop: jax.Array  # [N] bool — loop-closure candidates


@jax.jit
def candidate_sets(g: PoseGraph, current: jax.Array, dist: jax.Array, *,
                   max_graph_dist_sm: float = 2.0,
                   min_graph_dist_lc: float = 5.0,
                   max_euc_dist_lc: float = 50.0) -> CandidateSets:
    """The reference's two candidate sets (``vertices_finder.cpp:35-79``)."""
    euc = jnp.linalg.norm(g.poses[:, :2] - g.poses[current, :2], axis=-1)
    live = g.vmask & (jnp.arange(g.poses.shape[0]) != current)
    near = live & (dist <= max_graph_dist_sm)
    loop = live & (dist > min_graph_dist_lc) & (euc <= max_euc_dist_lc)
    return CandidateSets(near=near, loop=loop)


@partial(jax.jit, static_argnames=("sweeps",))
def components(g: PoseGraph, member: jax.Array,
               sweeps: int = 32) -> jax.Array:
    """Component label [N] of the subgraph induced on ``member`` vertices.

    Label = min vertex index in the component (reference
    ``findSetsOfVertices`` partitions candidates by connectivity through
    the candidate set, ``vertices_finder.cpp:82-99``). Non-members get N.
    Min-label propagation along edges whose BOTH endpoints are members.
    """
    n = g.poses.shape[0]
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    ok = g.emask & member[vi] & member[vj]
    lab0 = jnp.where(member, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))

    def sweep(lab, _):
        li = jnp.where(ok, lab[vi], n)
        lj = jnp.where(ok, lab[vj], n)
        m = jnp.minimum(li, lj)
        lab = lab.at[vj].min(m)
        lab = lab.at[vi].min(m)
        return lab, None

    lab, _ = jax.lax.scan(sweep, lab0, None, length=sweeps)
    return lab


@partial(jax.jit, static_argnames=("n_robots", "gap"))
def expand_neighbors(member: jax.Array, v_owner: jax.Array,
                     v_remote: jax.Array, vmask: jax.Array, *,
                     n_robots: int, gap: int = 8) -> jax.Array:
    """Widen a candidate set by vertices within ±``gap`` keyframe ids of a
    member, per owner (reference ``addNeighboringVertices``,
    ``graph_slam.cpp:356-382``: consecutive ids around each member join
    the set; gap 8 at ``:399``).

    Id adjacency lives in (owner, remote-index) space: members scatter
    into a per-owner index line, a ±gap window-sum dilates it, and every
    live vertex joins if its own line cell is covered. The stride pads
    ``2·gap`` so dilation cannot leak across owner boundaries.
    """
    n = member.shape[0]
    stride = n + 2 * gap + 2
    total = n_robots * stride
    ok = vmask & (v_remote >= 0)
    key = jnp.clip(v_owner, 0, n_robots - 1) * stride \
        + jnp.clip(v_remote, 0, n - 1)
    hist = jnp.zeros((total + 1,), jnp.int32).at[
        jnp.where(member & ok, key, total)].set(1, mode="drop")[:total]
    cs = jnp.cumsum(hist)
    idx = jnp.arange(total)
    hi = cs[jnp.clip(idx + gap, 0, total - 1)]
    lo = jnp.where(idx - gap - 1 >= 0,
                   cs[jnp.clip(idx - gap - 1, 0, total - 1)], 0)
    dilated = (hi - lo) > 0
    return member | (ok & dilated[key])


class Regions(NamedTuple):
    rep_vertex: jax.Array  # [K] int32 — closest member vertex per component
    valid: jax.Array       # [K] bool
    comp_label: jax.Array  # [K] int32 — the component's label


@partial(jax.jit, static_argnames=("max_regions",))
def pick_regions(g: PoseGraph, member: jax.Array, labels: jax.Array,
                 current: jax.Array, max_regions: int = 4) -> Regions:
    """Up to K components, each represented by the member vertex closest
    (Euclidean) to the current estimate (``findClosestVertex``,
    ``vertices_finder.cpp:101-114``). Components beyond K are dropped —
    ``log``ged nowhere, bounded by design (the reference visits all, but
    >4 simultaneous distinct loop regions does not occur in the target
    scenarios; capacity is a config knob)."""
    n = g.poses.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_rep = member & (labels == idx)
    # first K representatives by vertex index
    score = jnp.where(is_rep, -idx, -jnp.int32(2 * n))
    _, reps = jax.lax.top_k(score, max_regions)       # ascending index order
    valid = is_rep[reps]

    euc = jnp.linalg.norm(g.poses[:, :2] - g.poses[current, :2], axis=-1)

    def closest(rep):
        in_comp = member & (labels == labels[rep])
        d = jnp.where(in_comp, euc, FAR)
        return jnp.argmin(d).astype(jnp.int32)

    closest_v = jax.vmap(closest)(reps)
    return Regions(rep_vertex=jnp.where(valid, closest_v, 0),
                   valid=valid, comp_label=labels[reps])
