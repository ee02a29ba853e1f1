"""Multi-robot SLAM: the inter-robot exchange protocol as array programs.

TPU-native replacement for the reference's ``MRGraphSLAM`` + message layer
(``/root/reference/src/mrslam/mr_graph_slam.cpp``, ``msg_factory.h``):

* **ComboMessage** (``mr_graph_slam.cpp:564-605``): a robot's last ≤5 pose
  estimates + its newest scan. Receiver instantiates the unknown newest
  vertex (with scan) in its own graph and parks it for matching
  (``:118-252``).
* **Global matching** of parked foreign vertices against the local map
  (``:254-329``): full-θ hierarchical search; success buffers an
  inter-robot closure hypothesis (info diag(100,100,1000), ``:228-242``)
  in a per-peer sliding window voted like intra-robot closures
  (``:60-112``, ``minInliersMR``).
* **CondensedGraphMessage** (``:607-670``): accepted closures are reported
  to the vertex owner, who condenses its own-edge graph onto exactly those
  boundary vertices and ships the labeled star back; received stars are
  spliced wholesale (``condensed_graph_buffer.cpp:437-510``).

Messages are fixed-shape pytrees; delivery is gated by a connectivity
mask (``mr.network``). Wire framing (float32 arrays) matches the
reference's precision choice (doubles sent as float32,
``msg_factory.h:78-112``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config
from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.matcher import matching
from cg_mrslam_tpu.mr import condensed as CG
from cg_mrslam_tpu.pipeline import closure as CL
from cg_mrslam_tpu.pipeline.slam import (
    SlamState, init_state, newest_own, own_vertices,
)
from cg_mrslam_tpu.utils import se2

# static message capacities (wire shape, not behaviour). The closure-list
# and star capacities live in MRConfig (closure_list_cap/star_edges_cap);
# these remain as defaults for cfg-less call sites.
COMBO_POSES = 5        # reference ships last ≤5 poses (mr_graph_slam.cpp:572)
CLOSURE_LIST = 16      # default MRConfig.closure_list_cap
STAR_EDGES = 16        # default MRConfig.star_edges_cap
GRAPH_MSG_V = 128      # GraphMessage fallback capacities
GRAPH_MSG_E = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MRState:
    """One robot's full multi-robot SLAM state."""

    slam: SlamState
    parked: jax.Array        # [N] bool — foreign vertices awaiting a match
    park_age: jax.Array      # [N] int32 — keyframes since parked
    peer_buf: CL.ClosureBuffer   # [R, W] per-peer hypothesis windows
    in_closures: jax.Array   # [R, N] bool — MY vertices peer r closed on
    out_closures: jax.Array  # [R, N] bool — r-owned slots I closed on


class Combo(NamedTuple):
    """VertexArray + RobotLaser diamond (reference ComboMessage,
    ``msg_factory.h:183-199``). Beam geometry ships with every message
    like the reference's ``minangle/angleincrement/maxrange`` fields
    (``:162-181``) — receivers with different lasers resample instead of
    mis-decoding."""

    robot: jax.Array    # [] int32 — sender id
    poses: jax.Array    # [C, 3] newest first
    idxs: jax.Array     # [C] int32 — sender-local keyframe indices
    valid: jax.Array    # [C] bool
    ranges: jax.Array   # [B] — scan of the newest vertex
    first_beam_angle: jax.Array = jnp.float32(-jnp.pi / 2)  # [] rad
    angular_step: jax.Array = jnp.float32(jnp.pi / 180)     # [] rad
    max_range: jax.Array = jnp.float32(20.0)                # [] m


class VertexArray(NamedTuple):
    """Standalone vertex-estimate message (reference VertexArrayMessage,
    type 1, ``msg_factory.h:141-160``)."""

    robot: jax.Array    # [] int32
    poses: jax.Array    # [C, 3]
    idxs: jax.Array     # [C] int32 sender-local indices
    valid: jax.Array    # [C] bool


class RobotLaser(NamedTuple):
    """Standalone laser message (reference RobotLaserMessage, type 2,
    ``msg_factory.h:162-181``: nodeId + readings + laser params)."""

    robot: jax.Array            # [] int32
    node_id: jax.Array          # [] int32 — sender-local vertex index
    ranges: jax.Array           # [B]
    first_beam_angle: jax.Array  # [] rad (minangle)
    angular_step: jax.Array      # [] rad (angleincrement)
    max_range: jax.Array         # [] m
    accuracy: jax.Array = jnp.float32(0.01)


class EdgeArray(NamedTuple):
    """Standalone edge message (reference EdgeArrayMessage, type 5,
    ``msg_factory.h:200-221``: id pairs + estimate + 6 information
    floats)."""

    robot: jax.Array    # [] int32
    ids: jax.Array      # [E, 2] int32 — sender-local index pairs
    z: jax.Array        # [E, 3]
    info: jax.Array     # [E, 6]
    valid: jax.Array    # [E] bool


class ClosureList(NamedTuple):
    idxs: jax.Array     # [L] int32 — RECEIVER-local vertex indices
    valid: jax.Array    # [L] bool
    dropped: jax.Array = jnp.int32(0)  # [] — closures beyond capacity
    #                                     (sender-side observability only)


class StarMsg(NamedTuple):
    gauge: jax.Array     # [] int32 — SENDER-local index
    boundary: jax.Array  # [K] int32 — SENDER-local indices
    z: jax.Array         # [K, 3]
    info: jax.Array      # [K, 6]
    valid: jax.Array     # [K] bool
    dropped: jax.Array = jnp.int32(0)  # [] — boundary beyond capacity
    #                                     (sender-side observability only)


class GraphMsg(NamedTuple):
    """Full-graph fallback: the sender's own vertices + own edges
    (reference ``constructGraphMessage``/``addInterRobotDataGraph``,
    ``mr_graph_slam.cpp:397-483``, ``:672-739`` — the non-condensed
    protocol, present but not wired into the reference's send loop;
    O(map) bandwidth instead of the condensed star's O(boundary²))."""

    robot: jax.Array    # [] int32
    poses: jax.Array    # [V, 3]
    idxs: jax.Array     # [V] int32 sender-local indices
    vvalid: jax.Array   # [V] bool
    e_ij: jax.Array     # [E, 2] int32 — sender-local index pairs
    e_z: jax.Array      # [E, 3]
    e_info: jax.Array   # [E, 6]
    evalid: jax.Array   # [E] bool


def init_mr_state(cfg: Config, beams: int, initial_pose, ranges,
                  fov: float, max_range: float, my_id: int,
                  laser_offset=(0.0, 0.0, 0.0)) -> MRState:
    slam = init_state(cfg, beams, initial_pose, ranges, fov, max_range,
                      laser_offset, my_id=my_id)
    n = cfg.max_vertices
    r = cfg.mr.n_robots
    w = cfg.mr.window_mr_loop_closure * 2
    peer_buf = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (r,) + a.shape).copy(), CL.empty(w))
    return MRState(
        slam=slam,
        parked=jnp.zeros((n,), bool),
        park_age=jnp.zeros((n,), jnp.int32),
        peer_buf=peer_buf,
        in_closures=jnp.zeros((r, n), bool),
        out_closures=jnp.zeros((r, n), bool),
    )


def mr_state_from_g2o(cfg: Config, path: str, my_id: int) -> MRState:
    """Multi-robot resume from a ``.g2o`` checkpoint written by this
    framework. Edge provenance (owner/level) reloads from the
    ``CGM_EDGE_META`` lines, so ``build_star``'s own-edges rule keeps
    holding after resume — without them, peer-derived condensed edges
    would be re-condensed and information double-counted (the exact
    failure ``condensed_graph_buffer.cpp:347-366`` prevents).

    ``out_closures`` (which peer vertices I accepted closures on — the
    condensed-graph request list) is recovered from the graph itself: my
    own level-0 edges whose far endpoint is peer-owned. ``in_closures``
    (what peers accepted on MY vertices) cannot be recovered locally;
    peers resend their closure lists every round, so it refills on the
    first exchange (the protocol is resend-tolerant by design).
    """
    from cg_mrslam_tpu.pipeline.slam import state_from_g2o

    slam = state_from_g2o(cfg, path, my_id)
    n = cfg.max_vertices
    r = cfg.mr.n_robots
    w = cfg.mr.window_mr_loop_closure * 2
    peer_buf = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (r,) + a.shape).copy(), CL.empty(w))

    g = slam.graph
    mine = G.own_edge_mask(g, my_id) & (g.e_level == 0)
    vo = slam.v_owner
    out_c = jnp.zeros((r, n), bool)
    for endpoint in (0, 1):
        tgt = g.e_ij[:, endpoint]
        foreign = mine & (vo[tgt] != my_id) & g.vmask[tgt]
        owner_row = jnp.where(foreign, vo[tgt], r)       # r = drop
        out_c = out_c.at[owner_row, tgt].set(True, mode="drop")
    return MRState(
        slam=slam,
        parked=jnp.zeros((n,), bool),
        park_age=jnp.zeros((n,), jnp.int32),
        peer_buf=peer_buf,
        in_closures=jnp.zeros((r, n), bool),
        out_closures=out_c,
    )


@jax.jit
def find_slot(state: SlamState, owner, ridx) -> jax.Array:
    """My slot holding vertex ``ridx`` of robot ``owner``; N if absent."""
    n = state.v_owner.shape[0]
    hit = (state.graph.vmask & (state.v_owner == owner)
           & (state.v_remote == ridx))
    return jnp.where(jnp.any(hit), jnp.argmax(hit), n).astype(jnp.int32)


@jax.jit
def build_combo(st: MRState) -> Combo:
    """My last ≤C own keyframes + newest scan
    (``constructComboMessage``, ``mr_graph_slam.cpp:564-605``)."""
    slots, ok = newest_own(st.slam, COMBO_POSES)
    scans = st.slam.scans
    return Combo(
        robot=st.slam.my_id,
        poses=st.slam.graph.poses[slots],
        idxs=st.slam.v_remote[slots],
        valid=ok,
        ranges=scans.ranges[slots[0]],
        first_beam_angle=scans.first_beam_angle,
        angular_step=scans.angular_step,
        max_range=scans.max_range,
    )


@jax.jit
def receive_combo(st: MRState, combo: Combo, live: jax.Array) -> MRState:
    """Instantiate the sender's newest vertex if unknown and park it;
    refresh the estimates of the sender's KNOWN vertices that are still
    awaiting structure (``addInterRobotDataCombo``,
    ``mr_graph_slam.cpp:118-252``: the two "Update estimate" branches at
    ``:131-155`` overwrite the stored estimate of every combo vertex that
    sits in the inter-robot closure buffer or the parked list — so a
    parked vertex retries global matching from the sender's freshest
    optimized pose, not the stale pose it was parked with).

    "Awaiting structure" is realised here as live-edge degree == 0 in my
    graph: parked and hypothesis-buffered foreign vertices have no edges
    yet (exactly the reference's two buffered populations), while
    vertices with accepted closures or spliced stars are constrained by
    MY optimizer and must not be dragged back to the sender's frame."""
    slam = st.slam
    slot = find_slot(slam, combo.robot, combo.idxs[0])
    n = slam.v_owner.shape[0]
    is_new = live & combo.valid[0] & (slot == n)
    tgt = jnp.where(is_new, slam.graph.n_vertices, n)  # n = drop

    g = slam.graph
    g = dataclasses.replace(
        g,
        poses=g.poses.at[tgt].set(combo.poses[0], mode="drop"),
        vmask=g.vmask.at[tgt].set(True, mode="drop"),
        n_vertices=jnp.where(is_new, g.n_vertices + 1, g.n_vertices),
    )
    scans = dataclasses.replace(
        slam.scans,
        ranges=slam.scans.ranges.at[tgt].set(combo.ranges, mode="drop"),
        smask=slam.scans.smask.at[tgt].set(True, mode="drop"),
    )
    slam = dataclasses.replace(
        slam, graph=g, scans=scans,
        v_owner=slam.v_owner.at[tgt].set(combo.robot, mode="drop"),
        v_remote=slam.v_remote.at[tgt].set(combo.idxs[0], mode="drop"))

    # "Update estimate" branches (mr_graph_slam.cpp:131-155): every combo
    # pose whose vertex I already hold and which carries no live edge yet
    # (parked / hypothesis-buffered) snaps to the transmitted estimate.
    g = slam.graph
    em = g.emask.astype(jnp.int32)
    deg = (jnp.zeros((n,), jnp.int32)
           .at[g.e_ij[:, 0]].add(em).at[g.e_ij[:, 1]].add(em))
    slots = jax.vmap(lambda i: find_slot(slam, combo.robot, i))(combo.idxs)
    known = live & combo.valid & (slots < n)
    upd = known & (deg[jnp.minimum(slots, n - 1)] == 0)
    refreshed = jnp.where(upd, slots, n)                   # n = drop
    g = dataclasses.replace(
        g, poses=g.poses.at[refreshed].set(combo.poses, mode="drop"))
    slam = dataclasses.replace(slam, graph=g)
    return dataclasses.replace(
        st, slam=slam,
        parked=st.parked.at[tgt].set(True, mode="drop"),
        park_age=st.park_age.at[tgt].set(0, mode="drop"))


def _local_map_grid(st: MRState, cfg: Config, window: int):
    """LC grid of my last ≤``window`` own scans, centered on my newest
    pose (the reference matches foreign scans against a 21-vertex window
    around its reference vertex, ``mr_graph_slam.cpp:172-213``)."""
    from cg_mrslam_tpu.matcher.grid import build_grid

    slam = st.slam
    slots, ok = newest_own(slam, window)
    pts = S.scan_points(slam.scans, slots)
    world = se2.apply(slam.graph.poses[slots], pts).reshape(-1, 2)
    valid = (S.beam_valid(slam.scans, slots)
             & ok[:, None] & slam.scans.smask[slots][:, None]).reshape(-1)
    center = slam.graph.poses[slots[0], :2]
    mcfg = cfg.lc_matcher
    grid = build_grid(world, valid, center, cells=mcfg.cells,
                      resolution=mcfg.resolution,
                      kernel_radius=mcfg.kernel_radius)
    return grid, center, slots[0], world, valid


@partial(jax.jit, static_argnames=("cfg",))
def try_match_parked(st: MRState, cfg: Config) -> MRState:
    """Attempt global matching of the NEWEST parked foreign vertex
    against my local map (``findInterRobotConstraints``,
    ``mr_graph_slam.cpp:254-329``). The reference retries EVERY parked
    vertex per keyframe; one attempt per keyframe bounds the (expensive)
    hierarchical search, and newest-first picks the vertex most likely
    to overlap the local map (the peer transmitted it from inside comm
    range moments ago — the oldest parked vertex is the one whose
    surroundings the map window has long scrolled past). Unmatched
    vertices age out after ``inter_robot_gap`` keyframes (``:328``).

    The search trusts the TRANSMITTED pose: position to ±(global_dx,
    global_dy) like the reference (scan_matcher.cpp:386-388) and θ to
    ±global_th_span (deviation: the reference searches full θ — see
    config.SearchWindows.global_th_span), and scores candidates on known
    map cells only with a coverage floor (see config.MRConfig.
    global_min_known / matcher.search.hierarchical_search)."""
    from cg_mrslam_tpu.matcher.search import hierarchical_search

    slam = st.slam
    n = slam.v_owner.shape[0]
    freshness = jnp.where(st.parked, -st.park_age, jnp.int32(-(1 << 30)))
    cand = jnp.argmax(freshness).astype(jnp.int32)
    has = st.parked[cand]

    grid, center, my_ref, map_world, map_valid = _local_map_grid(
        st, cfg, 2 * cfg.mr.global_match_window + 1)
    cur_pts, cur_valid = S.points_from_ranges(
        slam.scans, slam.scans.ranges[cand])
    cur_valid = cur_valid & slam.scans.smask[cand]

    w = cfg.windows
    kr = cfg.lc_matcher.kernel_radius
    res = hierarchical_search(
        grid, center, cfg.lc_matcher.resolution, cur_pts, cur_valid,
        slam.graph.poses[cand].at[:2].set(center),
        th_span=w.global_th_span, th_res=w.global_th_res,
        x_span=w.global_dx, y_span=w.global_dy, levels=w.global_levels,
        branch=w.global_branch,
        known_cap=(kr * 0.999 if cfg.mr.global_min_known > 0 else None),
        min_known=cfg.mr.global_min_known, pool_coarse=True)
    pose, score = res.poses[0], res.scores[0]
    ok = has & (score < cfg.mr.max_score_mr)

    if cfg.mr.detect_robot_in_range:
        # visibility gate (mr_graph_slam.cpp:218-226 / :291-299): accept
        # the match only if my scan actually sees the peer's body —
        # points unexplained by its map — at the claimed position
        peer_world = se2.apply(pose, cur_pts)
        detected = matching.verify_match(
            peer_world, cur_valid, map_world, map_valid, pose[:2],
            cfg=cfg.lc_matcher, threshold=cfg.windows.verify_threshold)
        ok = ok & detected

    # matched: move the foreign vertex to the matched pose and buffer the
    # closure hypothesis my_ref -> cand (info diag(100,100,1000),
    # mr_graph_slam.cpp:228-242)
    g = slam.graph
    g = dataclasses.replace(
        g, poses=g.poses.at[jnp.where(ok, cand, n)].set(pose, mode="drop"))
    slam = dataclasses.replace(slam, graph=g)

    z = se2.relative(g.poses[my_ref], pose)
    info = jnp.asarray([cfg.mr.closure_info[0], 0, 0,
                        cfg.mr.closure_info[1], 0,
                        cfg.mr.closure_info[2]], jnp.float32)
    peer = slam.v_owner[cand]
    buf_r = jax.tree_util.tree_map(lambda a: a[peer], st.peer_buf)
    buf_r = CL.insert(buf_r, my_ref[None], cand[None], z[None],
                      info[None], ok[None])
    peer_buf = jax.tree_util.tree_map(
        lambda full, one: full.at[peer].set(one), st.peer_buf, buf_r)

    # retry bookkeeping: matched or aged-out vertices leave the queue
    age2 = st.park_age + st.parked.astype(jnp.int32)
    drop = st.parked & ((age2 > cfg.mr.inter_robot_gap)
                        | ((jnp.arange(n) == cand) & ok))
    return dataclasses.replace(
        st, slam=slam, peer_buf=peer_buf,
        parked=st.parked & ~drop, park_age=age2)


@partial(jax.jit, static_argnames=("cfg",))
def vote_inter_robot(st: MRState, cfg: Config) -> MRState:
    """Per-peer windowed consistency vote (``checkInterRobotClosures``,
    ``mr_graph_slam.cpp:60-112``); accepted closures are recorded for the
    condensed-graph request to that peer (``:86-106``)."""
    slam = st.slam
    r = st.in_closures.shape[0]

    def per_peer(st_slam_outc, peer):
        slam, out_c = st_slam_outc
        buf = jax.tree_util.tree_map(lambda a: a[peer], st.peer_buf)
        # reference cadence: checkList gate + per-keyframe update
        # (mr_graph_slam.cpp:69-76, updateInterRobotClosures)
        buf2, accept, _ = CL.windowed_vote(
            buf, slam.graph.poses,
            window=cfg.mr.window_mr_loop_closure,
            inlier_threshold=cfg.slam.inlier_threshold,
            min_inliers=cfg.mr.min_inliers_mr)
        g = CL.add_accepted(slam.graph, buf, accept, owner=slam.my_id)
        # record accepted foreign targets for the closure list to `peer`
        n = slam.v_owner.shape[0]
        tgt = jnp.where(accept, buf.v_new, n)
        out_c = out_c.at[peer].set(
            out_c[peer].at[tgt].set(True, mode="drop"))
        slam = dataclasses.replace(slam, graph=g)
        return (slam, out_c), buf2

    (slam, out_c), bufs = jax.lax.scan(
        per_peer, (slam, st.out_closures), jnp.arange(r, dtype=jnp.int32))
    return dataclasses.replace(st, slam=slam, out_closures=out_c,
                               peer_buf=bufs)


@partial(jax.jit, static_argnames=("cap",))
def build_closure_list(st: MRState, peer, cap: int = CLOSURE_LIST,
                       off=0) -> ClosureList:
    """Remote indices of ``peer``'s vertices I accepted closures on
    (my condensed-graph request, ``constructCondensedGraphMessage``,
    ``mr_graph_slam.cpp:607-670``). The reference ships the ENTIRE
    accepted set every send; the static wire shape caps one datagram at
    ``cap``, so an overflowing set is covered by ROTATION: ``off``
    shifts the cap-window through the newest-first ranking, and the
    sender advances it by ``cap`` per send (mod set size) — successive
    150 ms rounds cover the full boundary, and the receiver UNIONs
    chunks (:func:`receive_closure_list`). The per-send overflow count
    still rides the message for the sender's Recorder."""
    sel = st.out_closures[peer] & (st.slam.v_owner == peer)
    n = sel.shape[0]
    cap = min(cap, n)
    score = jnp.where(sel, st.slam.v_remote, -1)
    n_sel = jnp.sum(sel.astype(jnp.int32))
    order = jnp.argsort(-score)            # selected first, newest first
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    rot = (rank + jnp.asarray(off, jnp.int32)) % jnp.maximum(n_sel, 1)
    keep = sel & (rot < cap)
    score2 = jnp.where(keep, st.slam.v_remote, -1)
    vals, slots = jax.lax.top_k(score2, cap)
    return ClosureList(idxs=st.slam.v_remote[slots], valid=vals >= 0,
                       dropped=jnp.maximum(n_sel - cap, 0))


@jax.jit
def receive_closure_list(st: MRState, peer, cl: ClosureList,
                         live: jax.Array) -> MRState:
    """Record which of MY vertices ``peer`` closed on — the boundary of
    the star I owe them (``insertOutClosure`` bookkeeping,
    ``condensed_graph_buffer.cpp:131-170``). UNION semantics, matching
    the reference's per-closure inserts into a growing buffer: the
    accepted set only grows on the sender, so accumulating rotated
    cap-window chunks (see :func:`build_closure_list`) converges to the
    full boundary and stays idempotent under resend/reorder."""
    slots = jax.vmap(lambda i: find_slot(st.slam, st.slam.my_id, i))(cl.idxs)
    n = st.slam.v_owner.shape[0]
    mask = jnp.zeros((n + 1,), bool).at[
        jnp.where(cl.valid, slots, n)].set(True)[:n]
    new_row = jnp.where(live, mask | st.in_closures[peer],
                        st.in_closures[peer])
    return dataclasses.replace(
        st, in_closures=st.in_closures.at[peer].set(new_row))


@partial(jax.jit, static_argnames=("gauge_mode", "cap"))
def build_star(st: MRState, peer, gauge_mode: str = "centroid",
               cap: int = STAR_EDGES) -> StarMsg:
    """Condense my own-edge graph onto the boundary ``peer`` requested
    (``computeCondensedGraph``, ``condensed_graph_buffer.cpp:437-485``:
    own edges only). ``gauge_mode`` mirrors the reference's two gauge
    policies: ``"centroid"`` (default, ``selectGaugeCentroid``) or
    ``"optimal"`` (uncertainty-minimizing ``selectOptimalGauge``)."""
    sel = st.in_closures[peer]
    cap = min(cap, sel.shape[0])
    score = jnp.where(sel, st.slam.v_remote, -1)
    vals, slots = jax.lax.top_k(score, cap)
    valid = vals >= 0
    n_sel = jnp.sum(sel.astype(jnp.int32))
    g = st.slam.graph
    own = G.own_edge_mask(g, st.slam.my_id)
    # (owner, keyframe) permutation: past DENSE_MAX capacity the settle
    # + marginals inside condense need it to ride the chain fast path
    # (the own-edge subgraph of a merged graph is never slot-adjacent)
    from cg_mrslam_tpu.solver.chain import chain_order

    order = chain_order(st.slam.v_owner, st.slam.v_remote, g.vmask)
    if gauge_mode == "optimal":
        gauge = CG.select_gauge_optimal(g, slots, valid, own, order)
    else:
        gauge = CG.select_gauge_centroid(g, slots, valid)
    star = CG.condense(g, slots, valid, gauge, own, order)
    any_b = jnp.any(valid)
    return StarMsg(
        gauge=st.slam.v_remote[gauge],
        boundary=st.slam.v_remote[slots],
        z=star.z, info=star.info,
        valid=star.valid & any_b,
        dropped=jnp.maximum(n_sel - cap, 0))


@jax.jit
def build_graph_msg(st: MRState) -> GraphMsg:
    """My newest ≤V own vertices and the own edges among them."""
    slam = st.slam
    n = slam.v_owner.shape[0]
    slots, ok = newest_own(slam, min(GRAPH_MSG_V, n))
    g = slam.graph
    # own edges whose endpoints both sit in the shipped window
    in_win = jnp.zeros((n,), bool).at[jnp.where(ok, slots, n)].set(
        True, mode="drop")
    own = G.own_edge_mask(g, slam.my_id)
    e_ok = own & in_win[g.e_ij[:, 0]] & in_win[g.e_ij[:, 1]]
    score = jnp.where(e_ok, jnp.arange(e_ok.shape[0], dtype=jnp.int32), -1)
    evals, eslots = jax.lax.top_k(score, min(GRAPH_MSG_E,
                                             e_ok.shape[0]))
    evalid = evals >= 0
    return GraphMsg(
        robot=slam.my_id,
        poses=g.poses[slots], idxs=slam.v_remote[slots], vvalid=ok,
        e_ij=jnp.stack([slam.v_remote[g.e_ij[eslots, 0]],
                        slam.v_remote[g.e_ij[eslots, 1]]], axis=-1),
        e_z=g.e_z[eslots], e_info=g.e_info[eslots], evalid=evalid)


@jax.jit
def receive_graph_msg(st: MRState, msg: GraphMsg,
                      live: jax.Array) -> MRState:
    """Merge a peer's full graph: instantiate unknown vertices at their
    reported poses (without scans — the fallback ships none) and replace
    the peer-owned edge set (``addInterRobotDataGraph`` semantics,
    ``mr_graph_slam.cpp:397-483``)."""
    slam = st.slam
    n = slam.v_owner.shape[0]

    def add_one(sl, t):
        idx, pose, ok = t
        slot = find_slot(sl, msg.robot, idx)
        is_new = live & ok & (slot == n)
        tgt = jnp.where(is_new, sl.graph.n_vertices, n)
        g = sl.graph
        g = dataclasses.replace(
            g,
            poses=g.poses.at[tgt].set(pose, mode="drop"),
            vmask=g.vmask.at[tgt].set(True, mode="drop"),
            n_vertices=jnp.where(is_new, g.n_vertices + 1, g.n_vertices))
        return dataclasses.replace(
            sl, graph=g,
            v_owner=sl.v_owner.at[tgt].set(msg.robot, mode="drop"),
            v_remote=sl.v_remote.at[tgt].set(idx, mode="drop")), None

    slam, _ = jax.lax.scan(add_one, slam,
                           (msg.idxs, msg.poses, msg.vvalid))

    vi = jax.vmap(lambda i: find_slot(slam, msg.robot, i))(msg.e_ij[:, 0])
    vj = jax.vmap(lambda i: find_slot(slam, msg.robot, i))(msg.e_ij[:, 1])
    ok = live & msg.evalid & (vi < n) & (vj < n)
    g = slam.graph
    # replace-wholesale like the condensed star (idempotent under resend):
    # previous full-graph edges from this peer are level 1+robot as well
    level = 1 + msg.robot
    stale = (g.emask & (g.e_owner == msg.robot) & (g.e_level == level)
             & live)
    g = G.remove_edges(g, stale)
    g = G.add_edges_masked(g, jnp.minimum(vi, n - 1), jnp.minimum(vj, n - 1),
                           msg.e_z, msg.e_info, ok, level=level,
                           owner=msg.robot)
    return dataclasses.replace(st, slam=dataclasses.replace(slam, graph=g))


@jax.jit
def receive_star(st: MRState, peer, msg: StarMsg,
                 live: jax.Array) -> MRState:
    """Splice ``peer``'s condensed star over its vertices in my graph
    (``insertEdgesFromRobot``, ``condensed_graph_buffer.cpp:487-510``)."""
    slam = st.slam
    n = slam.v_owner.shape[0]
    gauge_slot = find_slot(slam, peer, msg.gauge)
    b_slots = jax.vmap(lambda i: find_slot(slam, peer, i))(msg.boundary)
    ok = msg.valid & (b_slots < n) & (gauge_slot < n)
    star = CG.Star(gauge=jnp.minimum(gauge_slot, n - 1),
                   boundary=jnp.minimum(b_slots, n - 1),
                   z=msg.z, info=msg.info, valid=ok)
    spliced = CG.splice_star(slam.graph, star, owner=peer)
    # no delivery -> no replacement (the reference only replaces a peer's
    # star when a message actually arrives)
    g = jax.tree_util.tree_map(
        lambda a, b: jnp.where(live, a, b), spliced, slam.graph)
    return dataclasses.replace(st, slam=dataclasses.replace(slam, graph=g))
