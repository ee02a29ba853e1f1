"""Condensed-graph construction: marginalize a robot's graph onto a
boundary vertex set as a star of labeled virtual edges.

TPU-native replacement for the reference's core contribution
(``/root/reference/src/mrslam/condensed_graph/condensed_graph_creator.cpp:33-66``
plus g2o's ``EdgeLabeler``): given the boundary vertices a peer closed on,
a gauge vertex, and the robot's OWN edges only (double-counting rule,
``condensed_graph_buffer.cpp:347-366``), the reference re-gauges, runs one
Gauss–Newton iteration, creates virtual edges gauge→vᵢ, and labels each
with the relative pose and the inverse of vᵢ's marginal covariance
conditioned on the gauge — the Schur complement of all interior vertices
onto the boundary, reported star-wise (boundary–boundary cross information
is dropped; that is the paper's approximation, not ours).

Here the whole computation is one fused program: masked-edge GN step,
one Cholesky + batched triangular solves for all boundary marginals, and
a batched 3×3 congruence to move covariance into each edge's error frame.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from functools import partial as _partial

# full-f32 MXU precision — see solver/gauss_newton.py rationale
_es = _partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from cg_mrslam_tpu.core.graph import PoseGraph, pack_info
from cg_mrslam_tpu.core.linearize import linearize
from cg_mrslam_tpu.solver import gauss_newton as gn
from cg_mrslam_tpu.utils import se2


class Star(NamedTuple):
    """Condensed graph: virtual edges gauge→boundary_k."""

    gauge: jax.Array      # [] int32 — gauge vertex index
    boundary: jax.Array   # [K] int32 — boundary vertex indices
    z: jax.Array          # [K, 3] — labeled measurements (gauge→vᵢ)
    info: jax.Array       # [K, 6] — packed information matrices
    valid: jax.Array      # [K] bool


def select_gauge_centroid(g: PoseGraph, boundary: jax.Array,
                          valid: jax.Array) -> jax.Array:
    """Default gauge choice: the boundary vertex nearest the boundary
    centroid (reference ``selectGaugeCentroid``,
    ``condensed_graph_buffer.cpp:318-345``)."""
    pos = g.poses[boundary, :2]
    w = valid.astype(pos.dtype)[:, None]
    centroid = jnp.sum(pos * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    d = jnp.linalg.norm(pos - centroid, axis=-1)
    d = jnp.where(valid, d, jnp.float32(1e9))
    return boundary[jnp.argmin(d)]


@jax.jit
def select_gauge_optimal(g: PoseGraph, boundary: jax.Array,
                         valid: jax.Array,
                         edge_mask: jax.Array,
                         order: jax.Array | None = None) -> jax.Array:
    """Uncertainty-minimizing gauge (reference ``selectOptimalGauge``,
    ``condensed_graph_buffer.cpp:252-288``): condense once per candidate
    gauge and pick the one whose labeled star has the smallest total
    uncertainty Σₑ det(Ωₑ⁻¹) (``computeOverallUncertainty``, ``:172-179``).
    The reference loops K full marginalizations on the host; here it is
    one ``vmap`` — K dense solves batched on the MXU."""
    def total_uncertainty(cand):
        star = condense(g, boundary, valid, cand, edge_mask, order)
        from cg_mrslam_tpu.core.graph import unpack_info
        omega = unpack_info(star.info)
        u = 1.0 / jnp.maximum(jnp.linalg.det(omega), 1e-30)
        return jnp.sum(jnp.where(star.valid, u, 0.0))

    u = jax.vmap(total_uncertainty)(boundary)
    u = jnp.where(valid, u, jnp.float32(jnp.inf))
    return boundary[jnp.argmin(u)]


@jax.jit
def condense(g: PoseGraph, boundary: jax.Array, valid: jax.Array,
             gauge: jax.Array, edge_mask: jax.Array,
             order: jax.Array | None = None) -> Star:
    """Build the labeled star (reference ``CondensedGraphCreator::compute``).

    ``edge_mask`` selects the edges to marginalize over — callers pass the
    own-edges mask (``core.graph.own_edge_mask``) to honor the
    double-counting rule. ``boundary`` is padded to a static K with
    ``valid``. ``order`` is the (owner, keyframe) slot permutation
    (``solver.chain.chain_order``): the settle and the boundary
    marginals go through the capacity-banded backends, which past
    ``DENSE_MAX`` need it to take the chain fast path — the dense
    [3N,3N] solve at that scale is f32 garbage on the chip (measured:
    one exchange round of NaN star information matrices poisoned every
    robot in the fleet).
    """
    n = g.poses.shape[0]
    # re-gauge: fix only the gauge vertex (graph_manipulator.cpp:90-114)
    regauged = dataclasses.replace(g, fixed=jax.nn.one_hot(gauge, n,
                                                           dtype=bool))
    # one GN settle on the selected edges (condensed_graph_creator.cpp:47-55)
    regauged = gn.optimize_auto(regauged, 1, edge_mask, order=order)

    z = se2.relative(regauged.poses[gauge], regauged.poses[boundary])

    # boundary marginals conditioned on the gauge  [K,3,3]
    cov = gn.marginal_covariance_auto(regauged, boundary, edge_mask,
                                      order=order)

    # move covariance into the edge error frame: e = z⁻¹∘(x_g⁻¹ x_b), so at
    # zero error δe = J_b δx_b with J_b the standard SE(2) edge Jacobian
    # (what g2o's EdgeLabeler does with its J·Σ·Jᵀ congruence)
    e_ij = jnp.stack([jnp.broadcast_to(gauge, boundary.shape), boundary],
                     axis=-1)
    _, _, Jb = linearize(regauged.poses, e_ij, z)
    cov_e = _es("kij,kjl,kml->kim", Jb, cov, Jb)
    # symmetrize + tiny jitter before inversion (near-rigid chains give
    # ill-conditioned covariances)
    cov_e = 0.5 * (cov_e + jnp.swapaxes(cov_e, -1, -2))
    cov_e = cov_e + 1e-9 * jnp.eye(3, dtype=cov_e.dtype)
    omega = jnp.linalg.inv(cov_e)
    omega = 0.5 * (omega + jnp.swapaxes(omega, -1, -2))

    # the gauge's own slot (zero covariance) carries no edge
    ok = valid & (boundary != gauge)
    return Star(gauge=gauge, boundary=boundary, z=z,
                info=pack_info(omega), valid=ok)


@jax.jit
def splice_star(g: PoseGraph, star: Star, owner) -> PoseGraph:
    """Replace-then-insert a peer's condensed star into a graph
    (reference ``insertEdgesFromRobot``,
    ``condensed_graph_buffer.cpp:487-510``: received stars supersede the
    previous set from that robot atomically — idempotent under resend).

    Stars are stored at level ``1 + owner`` (the tag that marks them as
    received condensed information — see ``core.graph`` level convention);
    the previous star from the same robot is masked out first."""
    from cg_mrslam_tpu.core.graph import add_edges_masked, remove_edges

    owner = jnp.asarray(owner, jnp.int32)
    level = 1 + owner
    stale = g.emask & (g.e_owner == owner) & (g.e_level == level)
    g = remove_edges(g, stale)
    return add_edges_masked(
        g, jnp.broadcast_to(star.gauge, star.boundary.shape),
        star.boundary, star.z, star.info, star.valid,
        level=level, owner=owner)
