"""Fixed-capacity, mask-based SE(2) pose-graph state.

TPU-native replacement for the reference's pointer-based g2o graph
(``/root/reference/src/slam/graph_slam.h:49-120`` holds a ``SparseOptimizer``
of heap-allocated ``VertexSE2``/``EdgeSE2`` objects guarded by a mutex).
Here a graph is a pytree of fixed-shape arrays + masks:

* static capacity ``N`` vertices / ``E`` edges → no recompiles as the graph
  grows; a keyframe step is one jitted function application;
* no locks — the state is immutable, updates return new states;
* ``vmap`` over a leading batch axis gives thousands of concurrent graphs;
* g2o's edge "levels" (used to keep condensed edges out of the default
  optimization, reference ``condensed_graph_buffer.cpp:437-473``) become a
  per-edge integer channel, filtered by mask at solve time;
* edge ownership (the reference's "only my own edges" rule for condensed
  graph construction, ``condensed_graph_buffer.cpp:347-366``) is a per-edge
  integer robot id.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

# Edge level convention (mirrors g2o level semantics used by the reference):
#   0           : regular (odometry / scan-match / loop-closure) edge
#   1 + robotId : condensed virtual edge received from `robotId` (tag only —
#                 these DO participate in optimization, since the reference
#                 deserializes received stars at g2o's default level 0,
#                 mr_graph_slam.cpp:352-394; the sender's own outgoing star
#                 copies, which g2o keeps at level robot+1 and excludes from
#                 initializeOptimization(), are NOT stored in this graph at
#                 all — they live in the MR exchange buffer instead).
LEVEL_DEFAULT = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """One SE(2) pose graph in fixed-capacity array form.

    Shapes (no batch): poses ``[N,3]``, vmask/fixed ``[N]``, e_ij ``[E,2]``,
    e_z ``[E,3]``, e_info ``[E,6]`` (packed upper-tri, g2o file order
    ``xx xy xt yy yt tt``), emask/e_level/e_owner ``[E]``.
    All ops broadcast over leading batch dims added by ``vmap``.
    """

    poses: jax.Array    # [N, 3] float
    vmask: jax.Array    # [N] bool — vertex slot in use
    fixed: jax.Array    # [N] bool — gauge-fixed vertex
    e_ij: jax.Array     # [E, 2] int32 — endpoint vertex indices
    e_z: jax.Array      # [E, 3] float — measurement (relative pose i→j)
    e_info: jax.Array   # [E, 6] float — packed information matrix
    emask: jax.Array    # [E] bool — edge slot in use
    e_level: jax.Array  # [E] int32 — optimization level / channel
    e_owner: jax.Array  # [E] int32 — robot id that created the edge
    n_vertices: jax.Array  # [] int32 — number of live vertex slots
    n_edges: jax.Array     # [] int32 — number of live edge slots

    @property
    def capacity(self) -> Tuple[int, int]:
        return self.poses.shape[-2], self.e_ij.shape[-2]


def empty(num_vertices: int, num_edges: int, dtype=jnp.float32) -> PoseGraph:
    """An all-masked graph with the given static capacity."""
    return PoseGraph(
        poses=jnp.zeros((num_vertices, 3), dtype),
        vmask=jnp.zeros((num_vertices,), bool),
        fixed=jnp.zeros((num_vertices,), bool),
        e_ij=jnp.zeros((num_edges, 2), jnp.int32),
        e_z=jnp.zeros((num_edges, 3), dtype),
        e_info=jnp.zeros((num_edges, 6), dtype),
        emask=jnp.zeros((num_edges,), bool),
        e_level=jnp.zeros((num_edges,), jnp.int32),
        e_owner=jnp.zeros((num_edges,), jnp.int32),
        n_vertices=jnp.zeros((), jnp.int32),
        n_edges=jnp.zeros((), jnp.int32),
    )


def pack_info(info: jax.Array) -> jax.Array:
    """``[..., 3, 3]`` symmetric → packed ``[..., 6]`` (xx xy xt yy yt tt)."""
    return jnp.stack(
        [
            info[..., 0, 0], info[..., 0, 1], info[..., 0, 2],
            info[..., 1, 1], info[..., 1, 2], info[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_info(p: jax.Array) -> jax.Array:
    """Packed ``[..., 6]`` → full symmetric ``[..., 3, 3]``."""
    xx, xy, xt, yy, yt, tt = (p[..., k] for k in range(6))
    row0 = jnp.stack([xx, xy, xt], axis=-1)
    row1 = jnp.stack([xy, yy, yt], axis=-1)
    row2 = jnp.stack([xt, yt, tt], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def add_vertex(g: PoseGraph, pose: jax.Array, fixed: bool | jax.Array = False,
               index: jax.Array | None = None) -> PoseGraph:
    """Functionally append (or place at ``index``) one vertex.

    Replaces g2o ``addVertex`` (reference ``graph_slam.cpp:104-113``,
    ``:149-163``). Jit-safe: ``index`` may be a traced scalar; defaults to
    the next free slot ``n_vertices``.
    """
    idx = g.n_vertices if index is None else jnp.asarray(index, jnp.int32)
    return dataclasses.replace(
        g,
        poses=g.poses.at[idx].set(pose),
        vmask=g.vmask.at[idx].set(True),
        fixed=g.fixed.at[idx].set(jnp.asarray(fixed, bool)),
        n_vertices=jnp.maximum(g.n_vertices, idx + 1),
    )


def add_edge(g: PoseGraph, i, j, z: jax.Array, info: jax.Array,
             level=LEVEL_DEFAULT, owner=0,
             index: jax.Array | None = None) -> PoseGraph:
    """Functionally append one edge; ``info`` is ``[3,3]`` or packed ``[6]``.

    Replaces g2o ``addEdge`` (reference ``graph_slam.cpp:170-188``).
    """
    info = jnp.asarray(info)
    if info.shape[-1] == 3 and info.ndim >= 2:
        info = pack_info(info)
    idx = g.n_edges if index is None else jnp.asarray(index, jnp.int32)
    return dataclasses.replace(
        g,
        e_ij=g.e_ij.at[idx].set(jnp.asarray([i, j], jnp.int32)),
        e_z=g.e_z.at[idx].set(z),
        e_info=g.e_info.at[idx].set(info),
        emask=g.emask.at[idx].set(True),
        e_level=g.e_level.at[idx].set(jnp.asarray(level, jnp.int32)),
        e_owner=g.e_owner.at[idx].set(jnp.asarray(owner, jnp.int32)),
        n_edges=jnp.maximum(g.n_edges, idx + 1),
    )


def add_edges_masked(g: PoseGraph, i: jax.Array, j: jax.Array,
                     z: jax.Array, info: jax.Array, accept: jax.Array,
                     level=LEVEL_DEFAULT, owner=0) -> PoseGraph:
    """Insert the ``accept``-masked subset of K candidate edges in one
    scatter (jit-safe batched ``add_edge``). ``info`` is packed ``[K,6]``.

    Slots freed by ``remove_edges`` (e.g. stars replaced wholesale by
    :func:`cg_mrslam_tpu.mr.condensed.splice_star`) are REUSED — lowest
    free slot first — so long-running graphs with edge churn stay within
    their fixed capacity. Entries that find no free slot are dropped
    (fixed-capacity overflow, mirrors the reference's bounded buffers)."""
    cap = g.e_ij.shape[-2]
    k = accept.shape[0]
    free = ~g.emask
    # first-k free slots, ascending index
    score = jnp.where(free, -jnp.arange(cap, dtype=jnp.int32),
                      jnp.int32(-2 * cap))
    _, free_slots = jax.lax.top_k(score, min(k, cap))
    order = jnp.cumsum(accept.astype(jnp.int32)) - 1
    order = jnp.clip(order, 0, free_slots.shape[0] - 1)
    slot = jnp.where(accept, free_slots[order], cap)
    slot = jnp.where(free[jnp.clip(slot, 0, cap - 1)], slot, cap)  # overflow
    placed = (slot < cap).astype(jnp.int32)
    return dataclasses.replace(
        g,
        e_ij=g.e_ij.at[slot].set(
            jnp.stack([i, j], -1).astype(jnp.int32), mode="drop"),
        e_z=g.e_z.at[slot].set(z, mode="drop"),
        e_info=g.e_info.at[slot].set(info, mode="drop"),
        emask=g.emask.at[slot].set(True, mode="drop"),
        e_level=g.e_level.at[slot].set(
            jnp.asarray(level, jnp.int32), mode="drop"),
        e_owner=g.e_owner.at[slot].set(
            jnp.asarray(owner, jnp.int32), mode="drop"),
        n_edges=jnp.maximum(
            g.n_edges,
            jnp.max(jnp.where(placed > 0, slot + 1, 0))).astype(jnp.int32),
    )


def remove_edges(g: PoseGraph, kill: jax.Array) -> PoseGraph:
    """Mask out edges where ``kill`` is True (slots are not compacted)."""
    return dataclasses.replace(g, emask=g.emask & ~kill)


def permute_vertices(g: PoseGraph, order: jax.Array) -> PoseGraph:
    """Relabel vertex slots: slot ``k`` of the result is slot ``order[k]``
    of ``g`` (``order`` must be a permutation of ``arange(N)``). Edge slots
    keep their positions — only the endpoint indices are remapped — so
    per-edge masks stay valid across the permutation.

    This is the enabling transform for the chain+Woodbury fast path on
    REAL multi-robot graphs: foreign vertices arrive interleaved with own
    keyframes (``mr/mrslam.py:receive_combo`` appends at ``n_vertices``),
    so own odometry edges stop being slot-adjacent; gathering slots into
    (owner, keyframe-index) order restores block-tridiagonality. The
    reference gets the same effect implicitly from CSparse's fill-in
    ordering (``/root/reference/src/slam/graph_slam.cpp:44-55``).
    """
    n = g.poses.shape[-2]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return dataclasses.replace(
        g, poses=g.poses[order], vmask=g.vmask[order], fixed=g.fixed[order],
        e_ij=inv[g.e_ij])


def inverse_permutation(order: jax.Array) -> jax.Array:
    """``inv`` with ``inv[order[k]] = k``."""
    n = order.shape[0]
    return jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))


def active_edge_mask(g: PoseGraph, include_condensed: bool = True) -> jax.Array:
    """Edge mask for optimization.

    All stored edges participate by default — this matches the reference,
    where ``initializeOptimization()`` (level 0) sees regular edges plus
    condensed stars received from peers (both at g2o level 0,
    ``graph_slam.cpp:561-574``, ``mr_graph_slam.cpp:352-394``).
    ``include_condensed=False`` drops received condensed edges (tagged with
    ``e_level > 0`` here), e.g. for single-robot sub-solves.
    """
    m = g.emask
    if not include_condensed:
        m = m & (g.e_level == LEVEL_DEFAULT)
    return m


def own_edge_mask(g: PoseGraph, my_id: int | jax.Array) -> jax.Array:
    """The reference's "only my own edges" rule for condensed-graph
    construction (``condensed_graph_buffer.cpp:347-366``): exclude edges
    received from peers to avoid double-counting information."""
    return g.emask & (g.e_owner == jnp.asarray(my_id, jnp.int32))
