"""Single-robot SLAM engine: one jitted keyframe step.

TPU-native replacement for the reference's ``GraphSLAM`` engine + ``srslam``
main loop (``/root/reference/src/slam/graph_slam.cpp``,
``src/srslam.cpp:200-215``): per keyframe, the reference runs
``addDataSM`` (new vertex + odometry edge refined by close scan matching,
``graph_slam.cpp:197-267``), ``findConstraints`` (pre-optimize, Dijkstra
candidate sets, covariance gating, per-component matching, windowed closure
vote, ``:388-533``) and ``optimize(5)`` (``:561-574``) as thousands of
small heap operations under a mutex. Here the whole keyframe is ONE jitted
array program over the fixed-capacity state — no recompiles as the graph
grows, ``vmap``-able over a batch of worlds, one device dispatch per
keyframe.

Host-side responsibilities shrink to dead-reckoning scalars between
keyframes and the keyframe gate (``srslam.cpp:200-201``), handled by
:class:`SingleRobotSlam`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.config import Config
from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.core.graph import PoseGraph
from cg_mrslam_tpu.core.scan import ScanSet
from cg_mrslam_tpu.matcher import matching
from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import grid_search
from cg_mrslam_tpu.pipeline import closure as CL
from cg_mrslam_tpu.pipeline import graph_dist as GD
from cg_mrslam_tpu.solver import gauss_newton as gn
from cg_mrslam_tpu.utils import se2

# Per-region loop-closure hypotheses: the reference keeps ALL matches
# above threshold as separate results, deduped on a coarse lattice
# (scan_matcher.cpp:246-279, chargrid.cpp:36-46). Static shapes need a
# cap: top-TOPK_PER_DIR of the normal search and of the π-rotated twin
# (reverse traversals, scan_matcher.cpp:222-241), deduped jointly — a
# region with two genuine same-direction candidate poses contributes
# both, not just its best.
TOPK_PER_DIR = 2
LC_HYPOTHESES = 2 * TOPK_PER_DIR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlamState:
    """Single-robot SLAM state; vertex-ownership arrays support the
    multi-robot layer (foreign vertices interleave in the same slot space —
    the reference namespaces ids as runningId + robotId·baseId,
    ``graph_slam.cpp:155``; here ownership is explicit per slot)."""

    graph: PoseGraph
    scans: ScanSet
    buffer: CL.ClosureBuffer
    my_id: jax.Array     # [] int32
    v_owner: jax.Array   # [N] int32 — robot that created each vertex slot
    v_remote: jax.Array  # [N] int32 — owner-local keyframe index


def init_state(cfg: Config, beams: int, initial_pose, ranges,
               fov: float, max_range: float,
               laser_offset=(0.0, 0.0, 0.0), my_id: int = 0,
               first_beam_angle: float | None = None,
               angular_step: float | None = None) -> SlamState:
    """``setInitialData`` equivalent: gauge-fixed first vertex + its scan
    (reference ``graph_slam.cpp:87-143``). When the sensor's true beam
    geometry is known (e.g. from a CARMEN log's explicit
    ``start_angle``/``ares``), pass ``first_beam_angle``/``angular_step``
    — the fov-derived defaults assume a symmetric fov with
    endpoint-exclusive spacing, which real logs often violate."""
    g = G.empty(cfg.max_vertices, cfg.max_edges)
    g = G.add_vertex(g, jnp.asarray(initial_pose, jnp.float32), fixed=True)
    fba = -fov / 2 if first_beam_angle is None else first_beam_angle
    step = fov / beams if angular_step is None else angular_step
    scans = S.empty(cfg.max_vertices, beams, first_beam_angle=fba,
                    angular_step=step, max_range=max_range)
    scans = dataclasses.replace(
        scans, laser_offset=jnp.asarray(laser_offset, jnp.float32))
    scans = S.set_scan(scans, 0, jnp.asarray(ranges, jnp.float32))
    buf = CL.empty(cfg.slam.window_loop_closure
                   * cfg.max_regions * LC_HYPOTHESES)
    n = cfg.max_vertices
    return SlamState(
        graph=g, scans=scans, buffer=buf,
        my_id=jnp.asarray(my_id, jnp.int32),
        v_owner=jnp.full((n,), my_id, jnp.int32),
        v_remote=jnp.full((n,), -1, jnp.int32).at[0].set(0))


def own_vertices(state: SlamState) -> jax.Array:
    """Mask of live vertices created by this robot."""
    return state.graph.vmask & (state.v_owner == state.my_id)


def newest_own(state: SlamState, k: int):
    """Slots of my newest ``k`` own keyframes, newest first (+valid).
    ``k`` clamps to the slot count (tiny sliced buckets)."""
    score = jnp.where(own_vertices(state), state.v_remote, -1)
    vals, slots = jax.lax.top_k(score, min(k, score.shape[-1]))
    return slots.astype(jnp.int32), vals >= 0


class StepInfo(NamedTuple):
    pose: jax.Array          # [3] optimized pose of the new vertex
    sm_accepted: jax.Array   # [] bool — close match used for the odom edge
    closures_added: jax.Array  # [] int32 — accepted loop closures this step
    chi2: jax.Array          # [] post-optimization chi2
    n_edges: jax.Array       # [] int32 — live edges (host bucket mirror)
    regions_dropped: jax.Array  # [] int32 — components beyond max_regions
    #                             (the one capacity that can silently bind;
    #                             surfaced per SURVEY's no-silent-caps rule)
    solver_backend: jax.Array  # [] int32 — optimize_auto's pick for the
    #                            final optimize (0 dense, 1 chain, 2 PCG)


def _diag_info(d) -> jax.Array:
    return jnp.asarray([d[0], 0.0, 0.0, d[1], 0.0, d[2]], jnp.float32)


def _window_reference(state: SlamState, window: int):
    """World-frame points of my previous ≤``window`` OWN vertices' scans
    (the reference's close-matching vset, ``graph_slam.cpp:227-244``)."""
    idxs, ok = newest_own(state, window)
    pts = S.scan_points(state.scans, idxs)                  # [W,B,2] base
    world = se2.apply(state.graph.poses[idxs], pts)
    valid = (S.beam_valid(state.scans, idxs)
             & ok[:, None] & state.scans.smask[idxs][:, None])
    return world.reshape(-1, 2), valid.reshape(-1)


def _add_keyframe(state: SlamState, est, ranges, cfg: Config):
    """``addDataSM``: vertex from dead-reckoned estimate; odometry edge
    refined by close scan matching (reference ``graph_slam.cpp:197-267``)."""
    g = state.graph
    cur = g.n_vertices
    prevs, _ = newest_own(state, 1)
    prev = prevs[0]                       # my newest own keyframe slot
    prev_pose = g.poses[prev]

    ref_pts, ref_valid = _window_reference(state,
                                           cfg.slam.close_match_window)
    cur_pts, cur_valid = S.points_from_ranges(state.scans, ranges)
    # coverage crop: only score current points inside the previous scan's
    # coverage disk. Frontier points (seen beyond the reference coverage)
    # otherwise reward sliding the match backwards along featureless
    # directions — the mean-distance score counts them as unexplained at
    # the true pose but explained when retreated into covered territory.
    world_cur = se2.apply(est, cur_pts)
    in_cover = jnp.linalg.norm(world_cur - prev_pose[:2], axis=-1) < (
        state.scans.max_range - 0.5)
    cur_valid = cur_valid & in_cover

    m = matching.close_match(ref_pts, ref_valid, cur_pts, cur_valid, est,
                             cfg=cfg.close_matcher, windows=cfg.windows)
    pose_new = jnp.where(m.accepted, m.pose, est)
    z = se2.relative(prev_pose, pose_new)
    info = jnp.where(m.accepted, _diag_info(cfg.slam.sm_info),
                     _diag_info(cfg.slam.odom_info))

    g = G.add_vertex(g, pose_new)
    g = G.add_edge(g, prev, cur, z, info, owner=state.my_id)
    scans = S.set_scan(state.scans, cur, ranges)
    state = dataclasses.replace(
        state, graph=g, scans=scans,
        v_owner=state.v_owner.at[cur].set(state.my_id),
        v_remote=state.v_remote.at[cur].set(state.v_remote[prev] + 1))
    return state, m.accepted


def _covariance_gate(g: PoseGraph, cur, reps, rvalid, cfg: Config,
                     order=None):
    """Mahalanobis gate on region representatives: is the candidate
    statistically within perception range of the current vertex?
    (reference ``checkCovariance``, ``graph_slam.cpp:311-354``: marginal
    covariance with gauge at the current vertex, χ²(2) 5.99 cut, distances
    deflated by 1 m perception range). Marginals go through the
    capacity-banded backend (``order`` = chain permutation) so large
    buckets avoid the dense [3N,3N] factorization."""
    n = g.poses.shape[0]
    regauged = dataclasses.replace(
        g, fixed=jax.nn.one_hot(cur, n, dtype=bool))
    cov = gn.marginal_covariance_auto(
        regauged, reps, order=order,
        loop_cap=cfg.slam.loop_cap,
        chain_cg_iters=cfg.slam.gate_cg_iters,
        chain_cg_tol=cfg.slam.gate_cg_tol,
        pcg_cg_iters=cfg.slam.gate_pcg_iters,
        chol=True)  # live path is batch-1: factorize, don't invert
    delta = g.poses[reps, :2] - g.poses[cur, :2]            # [K,2]
    dist = jnp.linalg.norm(delta, axis=-1)
    scale = jnp.maximum(dist - cfg.slam.perception_range_deflate, 0.0) / (
        dist + 1e-9)
    dd = delta * scale[:, None]
    cxy = cov[:, :2, :2]
    sol = jnp.linalg.solve(cxy, dd[..., None])[..., 0]
    d2 = jnp.sum(dd * sol, axis=-1)
    return rvalid & (d2 <= cfg.slam.chi2_gate)


class RegionMatch(NamedTuple):
    near_pose: jax.Array   # [K,3] close-window match around the estimate
    near_score: jax.Array  # [K]
    loop_pose: jax.Array   # [K,H,3] LC hypotheses (normal best, π best)
    loop_score: jax.Array  # [K,H]
    loop_keep: jax.Array   # [K,H] bool — survives the dedup lattice


def _lattice_topk(poses: jax.Array, scores: jax.Array, q: jax.Array,
                  k: int):
    """Per-merge-cell non-max suppression + top-k: from ``poses [R,3]``
    / ``scores [R]`` in best-first order, keep only the best entry of
    each (dx, dy, dθ) lattice cell (the reference's pruned results map,
    ``chargrid.cpp:36-46``) and return the first ``k`` distinct ones.
    Without this, a flat-bottomed score basin fills the whole top-k with
    neighbors of one minimum and a genuine second candidate pose never
    surfaces. Returns ``(poses [k,3], scores [k], valid [k])``."""
    r = poses.shape[0]
    norm = poses.at[:, 2].set(
        (poses[:, 2] + jnp.pi) % (2 * jnp.pi) - jnp.pi)
    cells = jnp.floor(norm / q + 0.5)                       # [R,3]
    same = jnp.all(cells[:, None, :] == cells[None, :, :], -1)
    earlier = jnp.tril(jnp.ones((r, r), bool), -1)
    dup = jnp.any(same & earlier, axis=1)                   # not cell-best
    rank = jnp.cumsum(~dup) - 1                             # distinct rank
    slot = jnp.where(~dup & (rank < k), rank, k)            # k = trash
    out_p = jnp.zeros((k + 1, 3), poses.dtype).at[slot].set(poses)[:k]
    out_s = jnp.full((k + 1,), jnp.inf,
                     scores.dtype).at[slot].set(scores)[:k]
    out_v = jnp.zeros((k + 1,), bool).at[slot].set(True)[:k]
    return out_p, out_s, out_v


def _match_regions(state: SlamState, est, cand, labels, regions,
                   cur_pts, cur_valid, cfg: Config) -> RegionMatch:
    """Per-component matching (reference ``findConstraints``,
    ``graph_slam.cpp:444-463``). Each region rasterizes the scans of its
    ≤``cfg.region_vertices`` nearest member vertices into an LC grid, then

    * near mode: tight close-matching window around the CURRENT estimate,
      no twin (``closeScanMatching`` path for near components);
    * loop mode: LC window around the representative's pose plus a
      π-rotated twin for reverse traversals (``scanMatchingLC``,
      ``scan_matcher.cpp:222-241``). The normal best and the π best are
      BOTH kept as hypotheses, deduped on the reference's
      (``lc_merge_dx``, ``lc_merge_dy``, ``lc_merge_dth``) lattice
      (``scan_matcher.cpp:246-279``, ``chargrid.cpp:36-46``).
    """
    g = state.graph
    mcfg = cfg.lc_matcher
    w = cfg.windows

    # NOTE (round 4): thinning the MOVING scan to ≤1 point per LC-grid
    # cell was tried here for kernel savings and REVERTED — the
    # reference's CharGrid::subsample (chargrid.cpp:98-122) thins the
    # REFERENCE cloud before rasterization, not the scored scan, and
    # dropping ~45% of scored beams measurably degraded matching
    # discrimination in self-similar corridors (two-robot cross-
    # consistency median 0.60 -> 0.63 m with 5.7 m outliers, and the
    # FleetSim-vs-host structural-equality pin started flipping argmax
    # ties). The pallas kernel still skips invalid beams and per-θ
    # consecutive duplicate cells via its keep mask — semantics-free.

    def one(rep, rvalid):
        in_comp = cand & (labels == labels[rep])
        d = jnp.linalg.norm(g.poses[:, :2] - g.poses[rep, :2], axis=-1)
        score = jnp.where(in_comp, -d, -jnp.float32(1e9))
        # clamp: a sliced bucket can be smaller than region_vertices
        _, mem = jax.lax.top_k(score,
                               min(cfg.region_vertices, score.shape[-1]))
        mem_ok = in_comp[mem] & state.scans.smask[mem]

        pts = S.scan_points(state.scans, mem)               # [M,B,2]
        world = se2.apply(g.poses[mem], pts).reshape(-1, 2)
        pvalid = (S.beam_valid(state.scans, mem)
                  & mem_ok[:, None]).reshape(-1)
        center = g.poses[rep, :2]
        grid = build_grid(world, pvalid, center, cells=mcfg.cells,
                          resolution=mcfg.resolution,
                          kernel_radius=mcfg.kernel_radius)

        # coverage crop around the representative (see _add_keyframe): the
        # region grid only covers what its member scans could see
        world_cur = se2.apply(est, cur_pts)
        in_cover = jnp.linalg.norm(world_cur - center, axis=-1) < (
            state.scans.max_range - 2.0)
        cvalid = cur_valid & in_cover

        far = jnp.float32(mcfg.kernel_radius)
        rn = grid_search(grid, center, mcfg.resolution, cur_pts, cvalid,
                         est, th_span=w.close_dth, th_res=w.lc_th_res,
                         x_span=w.close_dx, y_span=w.close_dy, topk=1,
                         prior_weight=w.close_prior_weight)

        q = jnp.asarray([w.lc_merge_dx, w.lc_merge_dy, w.lc_merge_dth],
                        jnp.float32)

        def lc(base):
            # raw top-16 volume cells, then per-merge-cell NMS → the
            # best TOPK_PER_DIR genuinely distinct candidate poses
            r = grid_search(grid, center, mcfg.resolution, cur_pts,
                            cvalid, base, th_span=w.lc_dth,
                            th_res=w.lc_th_res, x_span=w.lc_dx,
                            y_span=w.lc_dy, topk=16)
            return _lattice_topk(r.poses, r.scores, q, TOPK_PER_DIR)

        base = g.poses[rep]
        twin = base.at[2].add(jnp.pi)
        poses2, scores2, valid2 = jax.vmap(lc)(jnp.stack([base, twin]))
        poses_h = poses2.reshape(-1, 3)          # [H,3]
        scores_h = scores2.reshape(-1)           # [H]
        valid_h = valid2.reshape(-1)             # [H]
        # joint dedup across directions on the same lattice: when a
        # normal-direction hypothesis and a twin land in one cell, keep
        # the better (ties to the lower index — normal before twin,
        # rank order within a direction; scan_matcher.cpp:246-279)
        norm = poses_h.at[:, 2].set(
            (poses_h[:, 2] + jnp.pi) % (2 * jnp.pi) - jnp.pi)
        cells = jnp.floor(norm / q + 0.5)        # [H,3]
        same = (jnp.all(cells[:, None, :] == cells[None, :, :], -1)
                & valid_h[None, :] & valid_h[:, None])
        hidx = jnp.arange(scores_h.shape[0])
        beats = (scores_h[None, :] < scores_h[:, None]) | (
            (scores_h[None, :] == scores_h[:, None])
            & (hidx[None, :] < hidx[:, None]))
        keep = valid_h & ~jnp.any(same & beats, axis=1)
        scores_rep = jnp.where(valid_h, scores_h, far)
        return RegionMatch(
            near_pose=rn.poses[0],
            near_score=jnp.where(rvalid, rn.scores[0], far),
            loop_pose=poses_h,
            loop_score=jnp.where(rvalid, scores_rep, far),
            loop_keep=keep & rvalid,
        )

    return jax.vmap(one)(regions.rep_vertex, regions.valid)


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_step(state: SlamState, est: jax.Array, ranges: jax.Array,
                  cfg: Config):
    """One full keyframe: addDataSM → findConstraints → optimize(5).

    Mirrors the reference main loop body (``srslam.cpp:206-215``) as a
    single fused device program.
    """
    state, sm_ok = _add_keyframe(state, est, ranges, cfg)
    g = state.graph
    cur = g.n_vertices - 1

    # scale-appropriate solver: dense in small buckets; in the chain band
    # (capacity > DENSE_MAX) solve under the (owner, keyframe) slot
    # permutation that makes real merged graphs block-tridiagonal —
    # O(N log N) cyclic reduction instead of dense O(N³) per keyframe
    if g.poses.shape[-2] > gn.DENSE_MAX:
        from cg_mrslam_tpu.solver.chain import chain_order

        order = chain_order(state.v_owner, state.v_remote, g.vmask)
    else:
        order = None

    # --- findConstraints (graph_slam.cpp:388-485) ---
    g = gn.optimize_auto(g, cfg.slam.pre_optimize_iterations, order=order,
                         loop_cap=cfg.slam.loop_cap,
                         chain_cg_iters=cfg.slam.chain_cg_iters,
                         chain_cg_tol=cfg.slam.chain_cg_tol,
                         pcg_iters=cfg.slam.pcg_cg_iters,
                         chol=True)  # batch-1 live path

    dist = GD.bounded_distances(g, cur)
    sets = GD.candidate_sets(
        g, cur, dist, max_graph_dist_sm=cfg.slam.max_graph_dist_sm,
        min_graph_dist_lc=cfg.slam.min_graph_dist_lc,
        max_euc_dist_lc=cfg.slam.max_euc_dist_lc)
    # exclude my own vertices already used by close matching (the odometry
    # window) — their constraint is the refined odometry edge
    own = own_vertices(state)
    recent = own & (state.v_remote
                    > state.v_remote[cur] - (cfg.slam.close_match_window + 1))
    cand = (sets.near | sets.loop) & ~recent
    # widen by ±neighbor_gap ids within each owner's keyframe sequence
    # (addNeighboringVertices, graph_slam.cpp:356-382, gap 8 at :399),
    # then require scans (checkHaveLaser, :301-308)
    cand = GD.expand_neighbors(
        cand, state.v_owner, state.v_remote, g.vmask,
        n_robots=cfg.mr.n_robots, gap=cfg.slam.neighbor_gap)
    cand = cand & state.scans.smask & (jnp.arange(cand.shape[0]) != cur) \
        & ~recent
    labels = GD.components(g, cand)
    regions = GD.pick_regions(g, cand, labels, cur, cfg.max_regions)
    # components beyond capacity are dropped — count them (no silent caps)
    idx = jnp.arange(cand.shape[0], dtype=jnp.int32)
    n_comp = jnp.sum((cand & (labels == idx)).astype(jnp.int32))
    regions_dropped = jnp.maximum(
        n_comp - jnp.sum(regions.valid.astype(jnp.int32)), 0)

    rvalid = _covariance_gate(g, cur, regions.rep_vertex, regions.valid,
                              cfg, order=order)

    cur_pts, cur_valid = S.points_from_ranges(state.scans, ranges)
    state = dataclasses.replace(state, graph=g)
    rm = _match_regions(state, g.poses[cur], cand, labels,
                        regions._replace(valid=rvalid),
                        cur_pts, cur_valid, cfg)

    k = cfg.max_regions
    reps = regions.rep_vertex
    info = jnp.tile(_diag_info(cfg.slam.sm_info), (k, 1))

    # direct edge vs windowed vote: own vertices within direct_id_gap
    # keyframes get an immediate close-match edge; everything else —
    # foreign vertices or distant own vertices — rides the loop-closure
    # vote (graph_slam.cpp:410-463: `!isMyVertex || id gap > 10`)
    id_gap = state.v_remote[cur] - state.v_remote[reps]
    near_mode = own[reps] & (id_gap <= cfg.slam.direct_id_gap)
    direct = (rvalid & near_mode
              & (rm.near_score < cfg.close_matcher.max_score))
    z_near = se2.relative(g.poses[reps], rm.near_pose)      # [K,3]
    g = G.add_edges_masked(g, reps, jnp.full_like(reps, cur), z_near, info,
                           direct, owner=state.my_id)

    # loop hypotheses (both per-region twins) ride the sliding window
    hypo = (rvalid[:, None] & ~near_mode[:, None] & rm.loop_keep
            & (rm.loop_score < cfg.lc_matcher.max_score))   # [K,H]
    reps_h = jnp.repeat(reps, LC_HYPOTHESES)                # [K*H]
    z_loop = se2.relative(g.poses[reps_h],
                          rm.loop_pose.reshape(-1, 3))      # [K*H,3]
    info_h = jnp.tile(_diag_info(cfg.slam.sm_info),
                      (k * LC_HYPOTHESES, 1))
    buf = CL.insert(state.buffer, reps_h, jnp.full_like(reps_h, cur),
                    z_loop, info_h, hypo.reshape(-1))
    buf2, accept, _ = CL.windowed_vote(
        buf, g.poses, window=cfg.slam.window_loop_closure,
        inlier_threshold=cfg.slam.inlier_threshold,
        min_inliers=cfg.slam.min_inliers)
    g = CL.add_accepted(g, buf, accept, owner=state.my_id)
    buf = buf2

    # --- optimize(5) (graph_slam.cpp:561-574) ---
    g = gn.optimize_auto(g, cfg.slam.gn_iterations, order=order,
                         loop_cap=cfg.slam.loop_cap,
                         chain_cg_iters=cfg.slam.chain_cg_iters,
                         chain_cg_tol=cfg.slam.chain_cg_tol,
                         pcg_iters=cfg.slam.pcg_cg_iters,
                         chol=True)  # batch-1 live path

    from cg_mrslam_tpu.core.linearize import chi2
    state = dataclasses.replace(state, graph=g, buffer=buf)
    info_out = StepInfo(
        pose=g.poses[cur], sm_accepted=sm_ok,
        closures_added=jnp.sum(accept.astype(jnp.int32))
        + jnp.sum(direct.astype(jnp.int32)),
        chi2=chi2(g), n_edges=g.n_edges,
        regions_dropped=regions_dropped,
        solver_backend=gn.auto_backend(g, order=order,
                                       loop_cap=cfg.slam.loop_cap,
                                       chol=True))
    return state, info_out


# ---------------------------------------------------------------------------
# Active-size bucketing
#
# The state has static capacity (cfg.max_vertices/max_edges) so steps never
# recompile, but the dense solver is O(N³) in whatever N it is given: at
# capacity 1024 one keyframe spent ~180 ms in Cholesky/assembly on a real
# v5e even when only ~200 vertices were live. The fix is standard XLA
# bucketing: run the step on a power-of-two slice of the state just big
# enough for the live graph + one keyframe's worst-case growth, and splice
# the result back. One recompile per bucket crossing (≤ log2(capacity)
# times per run), >10× latency win early-to-mid run.
# ---------------------------------------------------------------------------

# Smallest bucket 256: at that size the dense solver costs ~1 ms on chip
# (negligible next to dispatch overhead) and typical runs never cross a
# bucket at all. Edge buckets are tied to 4×(vertex bucket) below so a
# crossing happens only when the vertex count doubles — compiles stay rare
# and the prewarmer has geometrically growing time to hide them.
_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384)

# outstanding bucket-prewarm compile threads; joined at interpreter exit —
# tearing down the backend while a compile is in flight aborts the process
_PREWARM_THREADS: list = []


def _join_prewarm_threads() -> None:
    for t in _PREWARM_THREADS:
        t.join(timeout=120.0)
    _PREWARM_THREADS.clear()


import atexit  # noqa: E402  (colocated with the registry it guards)

atexit.register(_join_prewarm_threads)


def _bucket_for(need: int, cap: int) -> int:
    for b in _BUCKETS:
        if b >= need:
            return min(b, cap)
    return cap


def _slice_state(state: SlamState, nb: int, eb: int) -> SlamState:
    g = state.graph
    g = dataclasses.replace(
        g, poses=g.poses[:nb], vmask=g.vmask[:nb], fixed=g.fixed[:nb],
        e_ij=g.e_ij[:eb], e_z=g.e_z[:eb], e_info=g.e_info[:eb],
        emask=g.emask[:eb], e_level=g.e_level[:eb], e_owner=g.e_owner[:eb])
    scans = dataclasses.replace(
        state.scans, ranges=state.scans.ranges[:nb],
        smask=state.scans.smask[:nb])
    return dataclasses.replace(
        state, graph=g, scans=scans,
        v_owner=state.v_owner[:nb], v_remote=state.v_remote[:nb])


def _merge_state(full: SlamState, part: SlamState) -> SlamState:
    nb = part.graph.poses.shape[0]
    eb = part.graph.e_ij.shape[0]
    fg, pg = full.graph, part.graph
    g = dataclasses.replace(
        fg,
        poses=fg.poses.at[:nb].set(pg.poses),
        vmask=fg.vmask.at[:nb].set(pg.vmask),
        fixed=fg.fixed.at[:nb].set(pg.fixed),
        e_ij=fg.e_ij.at[:eb].set(pg.e_ij),
        e_z=fg.e_z.at[:eb].set(pg.e_z),
        e_info=fg.e_info.at[:eb].set(pg.e_info),
        emask=fg.emask.at[:eb].set(pg.emask),
        e_level=fg.e_level.at[:eb].set(pg.e_level),
        e_owner=fg.e_owner.at[:eb].set(pg.e_owner),
        n_vertices=pg.n_vertices, n_edges=pg.n_edges)
    scans = dataclasses.replace(
        full.scans,
        ranges=full.scans.ranges.at[:nb].set(part.scans.ranges),
        smask=full.scans.smask.at[:nb].set(part.scans.smask))
    return dataclasses.replace(
        full, graph=g, scans=scans, buffer=part.buffer,
        v_owner=full.v_owner.at[:nb].set(part.v_owner),
        v_remote=full.v_remote.at[:nb].set(part.v_remote))


# width of the packed StepInfo vector (pose 3 + 6 scalars)
INFO_WIDTH = 9


def _pack_info(i: StepInfo) -> jax.Array:
    """StepInfo as one float32[INFO_WIDTH] so the host fetches it in ONE
    transfer (n_edges is exact in float32 up to 2²⁴)."""
    tail = jnp.stack([
        i.sm_accepted.astype(jnp.float32),
        i.closures_added.astype(jnp.float32),
        i.chi2.astype(jnp.float32),
        i.n_edges.astype(jnp.float32),
        i.regions_dropped.astype(jnp.float32),
        i.solver_backend.astype(jnp.float32)])
    return jnp.concatenate([i.pose.astype(jnp.float32), tail])


def _unpack_info(v: np.ndarray) -> StepInfo:
    return StepInfo(pose=v[:3], sm_accepted=bool(v[3]),
                    closures_added=int(v[4]), chi2=float(v[5]),
                    n_edges=int(v[6]), regions_dropped=int(v[7]),
                    solver_backend=int(v[8]))


@partial(jax.jit, static_argnames=("cfg", "nb", "eb"))
def _sliced_step(state: SlamState, est, ranges, cfg: Config,
                 nb: int, eb: int):
    """slice → keyframe_step → merge as ONE device program. Through the
    remote-execution tunnel every dispatch is a ~30-40 ms round trip, so
    fusing the bucket plumbing into the step jit (instead of three jits)
    is a real latency lever, not a style choice."""
    part, info = keyframe_step(_slice_state(state, nb, eb), est, ranges,
                               cfg)
    return _merge_state(state, part), _pack_info(info)


@partial(jax.jit, static_argnames=("cfg",))
def _full_step(state: SlamState, est, ranges, cfg: Config):
    new_state, info = keyframe_step(state, est, ranges, cfg)
    return new_state, _pack_info(info)


def _bucket_pair(state: SlamState, n_live: int, e_live: int):
    cap_n, cap_e = state.graph.capacity
    # worst-case growth: odometry edge + per-region direct edges (≤ the
    # buffer's per-keyframe insert quota = capacity/window) + a full
    # closure-buffer flush
    buf_cap = state.buffer.mask.shape[0]
    grow_e = 1 + buf_cap + buf_cap // 2
    nb = _bucket_for(n_live + 1, cap_n)
    eb = _bucket_for(max(e_live + grow_e, 4 * nb), cap_e)
    return nb, eb


def keyframe_step_bucketed(state: SlamState, est, ranges, cfg: Config,
                           n_live: int, e_live: int, compiled=None):
    """:func:`keyframe_step` on the smallest power-of-two slice of the
    state that fits the live graph plus this keyframe's worst-case growth
    (1 vertex; 1 odometry edge + ``MAX_REGIONS`` direct edges + a full
    closure-buffer flush). ``n_live``/``e_live`` are host-side ints;
    ``est``/``ranges`` may be host numpy (the transfer rides the dispatch).
    ``compiled`` is an optional {(nb, eb): AOT executable} cache filled by
    the bucket prewarmer. Returns ``(new_state, StepInfo of host
    scalars)`` after one fetch."""
    cap_n, cap_e = state.graph.capacity
    nb, eb = _bucket_pair(state, n_live, e_live)
    if compiled and (nb, eb) in compiled:
        new_state, packed = compiled[(nb, eb)](state, est, ranges)
    elif nb >= cap_n and eb >= cap_e:
        new_state, packed = _full_step(state, est, ranges, cfg)
    else:
        new_state, packed = _sliced_step(state, est, ranges, cfg, nb, eb)
    return new_state, _unpack_info(np.asarray(packed))


def state_from_g2o(cfg: Config, path: str, my_id: int = 0) -> SlamState:
    """Resume: rebuild a SlamState from a saved ``.g2o`` checkpoint
    (the reference's ``loadGraph``, ``graph_slam.cpp:625-628``, which no
    CLI path ever calls — here it is the real resume path). Vertex
    ownership is recovered from the id namespacing
    ``id = runningId + robotId·baseId``."""
    from cg_mrslam_tpu.io import g2o

    loaded = g2o.load(path, max_vertices=cfg.max_vertices,
                      max_edges=cfg.max_edges)
    if loaded.scans is None:
        raise ValueError(f"{path} carries no ROBOTLASER1 scans")
    ids = loaded.ids
    v_owner = np.where(ids >= 0, ids // cfg.slam.base_id, my_id)
    v_remote = np.where(ids >= 0, ids % cfg.slam.base_id, -1)
    buf = CL.empty(cfg.slam.window_loop_closure
                   * cfg.max_regions * LC_HYPOTHESES)
    g = loaded.graph
    if not loaded.has_edge_meta:
        # legacy/external .g2o without CGM_EDGE_META provenance lines:
        # attribute edges to their lower-id endpoint's owner (heuristic —
        # a file saved by this framework carries exact owner/level
        # instead, preserving the own-edges rule across resume)
        e_owner = np.asarray(v_owner)[np.asarray(g.e_ij)[:, 0]]
        g = dataclasses.replace(g, e_owner=jnp.asarray(e_owner, jnp.int32))
    return SlamState(
        graph=g, scans=loaded.scans, buffer=buf,
        my_id=jnp.asarray(my_id, jnp.int32),
        v_owner=jnp.asarray(v_owner, jnp.int32),
        v_remote=jnp.asarray(v_remote, jnp.int32))


class BucketRunner:
    """Host-side bucketed stepping shared by every deployment driver
    (:class:`SingleRobotSlam` and ``mr.node.RobotNode``): tracks the live
    counts, dispatches :func:`keyframe_step_bucketed`, and prewarms
    successor buckets in background compile threads so bucket crossings
    never stall a keyframe. Also the step's compile-event source: the
    latency bench keys its compile exclusion on :attr:`compile_events`
    (actual first-touch dispatches) instead of a magnitude heuristic."""

    def __init__(self, cfg: Config, n_live: int = 1, e_live: int = 0):
        self.cfg = cfg
        self.n_live, self.e_live = n_live, e_live
        self._warmed: set = set()
        self._compiled: dict = {}
        self._inflight: dict = {}
        self._seen: set = set()
        self.compile_events: list = []  # keyframe indices that compiled
        self._kf_index = 0

    def step(self, state: SlamState, est, ranges):
        key = _bucket_pair(state, self.n_live, self.e_live)
        if key not in self._compiled and key in self._inflight:
            # a prewarm for exactly this bucket is in flight — waiting out
            # its remainder beats recompiling the same program in parallel.
            # This wait IS a compile stall (up to a full XLA compile), so
            # it must be recorded as a compile event — otherwise latency
            # benches count a crossing that blocked on the prewarm as a
            # steady-state keyframe (round-4: an unrecorded 3.6 s p99).
            # Only when the thread is still running, though: a finished
            # prewarm whose compile failed (swallowed) joins instantly —
            # that keyframe is steady-state and must stay in the p50/p99.
            th = self._inflight.pop(key)
            if th.is_alive():
                self.compile_events.append(self._kf_index)
            th.join()
        if key not in self._compiled and key not in self._seen:
            # this dispatch traces+compiles (first touch of the bucket)
            if self._kf_index not in self.compile_events:
                self.compile_events.append(self._kf_index)
        self._seen.add(key)
        state, info = keyframe_step_bucketed(
            state, est, ranges, self.cfg, self.n_live, self.e_live,
            compiled=self._compiled)
        self._kf_index += 1
        self.n_live += 1
        self.e_live = info.n_edges
        self._prewarm(state)
        return state, info

    def _prewarm(self, state: SlamState) -> None:
        """Compile the NEXT bucket's step in a background thread before
        the graph grows into it, so bucket crossings never stall a
        keyframe (the first crossing otherwise costs a full trace+XLA
        compile, measured ~18 s through the remote tunnel). Lowering uses
        abstract shapes only; the AOT executable lands in
        ``self._compiled`` and the crossing keyframe calls it directly —
        no re-trace, no compile."""
        cap_n, cap_e = state.graph.capacity
        nb, eb = _bucket_pair(state, self.n_live, self.e_live)
        # compiles take ~16 s through the remote tunnel while buckets are
        # hundreds of keyframes apart — so the moment a bucket pair is in
        # use, start compiling BOTH of its successors (vertex-count
        # doubling and edge-count doubling)
        succ = {(_bucket_for(nb + 1, cap_n),
                 _bucket_for(max(eb, 4 * _bucket_for(nb + 1, cap_n)),
                             cap_e)),
                (nb, _bucket_for(eb + 1, cap_e))}
        self._launch(state, [p for p in succ if p != (nb, eb)])

    def prewarm_all(self, state: SlamState, join: bool = True) -> float:
        """Compile EVERY bucket pair this capacity can visit, up front.

        The successor prewarm (:meth:`_prewarm`) keeps crossings from
        paying a compile, but its background threads share the dispatch
        path with steady keyframes — measured on chip: every steady
        keyframe slower than 150 ms in a 620-keyframe replay had an
        inflight prewarm compile (`artifacts/latency_tail_probe.json`),
        inflating p99 ~10×. Latency-sensitive deployments call this at
        startup instead: all executables land before the first scan, and
        the steady state never shares the tunnel with a compile — the
        same warm-at-boot discipline a production serving stack uses.
        Returns the wall seconds spent (0 when everything was cached)."""
        import time

        cap_n, cap_e = state.graph.capacity
        pairs = []
        nb = _bucket_for(self.n_live + 1, cap_n)
        while True:
            eb = _bucket_for(max(self.e_live + 1, 4 * nb), cap_e)
            while True:
                pairs.append((nb, eb))
                if eb >= cap_e:
                    break
                eb = _bucket_for(eb + 1, cap_e)
            if nb >= cap_n:
                break
            nb = _bucket_for(nb + 1, cap_n)
        t0 = time.perf_counter()
        self._launch(state, pairs)
        if join:
            for k in list(self._inflight):
                self._inflight.pop(k).join()
        return time.perf_counter() - t0

    def _launch(self, state: SlamState, pairs) -> None:
        import threading

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        est = jax.ShapeDtypeStruct((3,), jnp.float32)
        rng = jax.ShapeDtypeStruct(
            (state.scans.ranges.shape[1],), jnp.float32)

        for nxt in pairs:
            if nxt in self._warmed:
                continue
            self._warmed.add(nxt)

            def work(nxt=nxt):
                try:
                    self._compiled[nxt] = _sliced_step.lower(
                        abstract, est, rng, self.cfg,
                        nb=nxt[0], eb=nxt[1]).compile()
                except Exception:   # prewarm is best-effort
                    pass

            t = threading.Thread(target=work, daemon=True)
            self._inflight[nxt] = t
            _PREWARM_THREADS.append(t)
            t.start()


class SingleRobotSlam:
    """Host-side driver: dead-reckoning + keyframe gate around the jitted
    step (the reference's ``srslam.cpp`` main loop)."""

    def __init__(self, cfg: Config, beams: int, initial_pose, ranges,
                 fov: float, max_range: float,
                 laser_offset=(0.0, 0.0, 0.0),
                 first_beam_angle: float | None = None,
                 angular_step: float | None = None,
                 warm_start: bool = False):
        from cg_mrslam_tpu.utils.metrics import Recorder

        self.cfg = cfg
        self.state = init_state(cfg, beams, initial_pose, ranges, fov,
                                max_range, laser_offset,
                                first_beam_angle=first_beam_angle,
                                angular_step=angular_step)
        self._est = np.asarray(initial_pose, np.float64)
        self._kf_est = self._est.copy()
        self.infos: list = []
        self.metrics = Recorder()
        self.runner = BucketRunner(cfg)
        if warm_start:
            # compile every bucket pair before the first scan — steady
            # keyframes must never share the dispatch path with a
            # background compile (see BucketRunner.prewarm_all)
            self.runner.prewarm_all(self.state)

    @classmethod
    def resume(cls, cfg: Config, path: str, my_id: int = 0
               ) -> "SingleRobotSlam":
        """Continue a run from a ``.g2o`` checkpoint."""
        self = cls.__new__(cls)
        from cg_mrslam_tpu.utils.metrics import Recorder

        self.cfg = cfg
        self.state = state_from_g2o(cfg, path, my_id)
        slots, _ = newest_own(self.state, 1)
        last = np.asarray(self.state.graph.poses[slots[0]], np.float64)
        self._est = last
        self._kf_est = last.copy()
        self.infos = []
        self.metrics = Recorder()
        self.runner = BucketRunner(cfg,
                                   n_live=int(self.state.graph.n_vertices),
                                   e_live=int(self.state.graph.n_edges))
        return self

    def observe(self, rel_odom, ranges) -> bool:
        """Feed one odometry increment + scan; returns True when a
        keyframe was processed (gate: >0.25 m or >π/4 since the last —
        ``srslam.cpp:200-201``)."""
        c, s = np.cos(self._est[2]), np.sin(self._est[2])
        self._est = np.array([
            self._est[0] + c * rel_odom[0] - s * rel_odom[1],
            self._est[1] + s * rel_odom[0] + c * rel_odom[1],
            (self._est[2] + rel_odom[2] + np.pi) % (2 * np.pi) - np.pi,
        ])
        dx = self._est[:2] - self._kf_est[:2]
        dth = (self._est[2] - self._kf_est[2] + np.pi) % (2 * np.pi) - np.pi
        if (np.hypot(*dx) <= self.cfg.slam.linear_update
                and abs(dth) <= self.cfg.slam.angular_update):
            return False
        with self.metrics.timer("keyframe_latency"):
            self.state, info = self.runner.step(
                self.state, np.asarray(self._est, np.float32),
                np.asarray(ranges, np.float32))
        self.infos.append(info)
        self.metrics.log("chi2", info.chi2)
        self.metrics.log("closures_added", info.closures_added)
        self.metrics.log("sm_accepted", int(info.sm_accepted))
        if info.regions_dropped:
            self.metrics.log("regions_dropped", info.regions_dropped)
        # re-anchor dead reckoning on the optimized pose
        self._est = np.asarray(info.pose, np.float64)
        self._kf_est = self._est.copy()
        return True

    # host bucketing mirrors (read by tools and tests)
    @property
    def _n_live(self) -> int:
        return self.runner.n_live

    @property
    def _e_live(self) -> int:
        return self.runner.e_live

    @property
    def poses(self) -> np.ndarray:
        n = int(self.state.graph.n_vertices)
        return np.asarray(self.state.graph.poses[:n])
