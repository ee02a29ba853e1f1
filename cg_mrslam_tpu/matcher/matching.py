"""Matching policy layer: the three search modes of the reference.

TPU-native replacement for ``ScanMatcher``
(``/root/reference/src/matcher/scan_matcher.cpp``): (a) ``closeScanMatching``
(``:112-189``) — odometry refinement in a tight window; (b)
``scanMatchingLC`` (``:201-294``) — loop-closure regions around candidate
vertices *plus π-rotated twins* for reverse traversals; (c)
``globalMatching`` (``:358-428``) — inter-robot hierarchical search over an
unknown relative pose; plus ``verifyMatching`` (``:430-505``) visibility
gating. Two matcher configurations mirror the reference's two grids
(close 30 m @ 0.025 m, LC 70 m @ 0.1 m — ``graph_slam.cpp:58-62``).

Everything here is jittable with static config; callers pass world-frame
reference points (scans already composed with vertex poses + laser offset).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.config import MatcherConfig, SearchWindows
from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import (
    SearchResult,
    box_mean,
    grid_search,
    hierarchical_search,
    unmatched_points,
)


class Match(NamedTuple):
    pose: jax.Array      # [3] matched transform (world pose of moving scan)
    score: jax.Array     # [] mean-distance score in [0, 1]
    accepted: jax.Array  # [] bool — score < max_score


def _grid(cfg: MatcherConfig, ref_points, ref_valid, center):
    return build_grid(
        ref_points, ref_valid, center,
        cells=cfg.cells, resolution=cfg.resolution,
        kernel_radius=cfg.kernel_radius,
    )


@partial(jax.jit, static_argnames=("cfg", "windows"))
def close_match(ref_points: jax.Array, ref_valid: jax.Array,
                cur_points: jax.Array, cur_valid: jax.Array,
                guess: jax.Array, *, cfg: MatcherConfig,
                windows: SearchWindows) -> Match:
    """Sequential odometry refinement (``closeScanMatching``): search a
    ±0.3 m / ±0.2 rad window around the odometry guess."""
    center = guess[:2]
    grid = _grid(cfg, ref_points, ref_valid, center)
    res = grid_search(
        grid, center, cfg.resolution, cur_points, cur_valid, guess,
        th_span=windows.close_dth, th_res=windows.close_th_res,
        x_span=windows.close_dx, y_span=windows.close_dy, topk=1,
        prior_weight=windows.close_prior_weight,
    )
    return Match(pose=res.poses[0], score=res.scores[0],
                 accepted=res.scores[0] < cfg.max_score)


@partial(jax.jit, static_argnames=("cfg", "windows"))
def loop_closure_match(ref_points: jax.Array, ref_valid: jax.Array,
                       cur_points: jax.Array, cur_valid: jax.Array,
                       region_poses: jax.Array, region_valid: jax.Array, *,
                       cfg: MatcherConfig,
                       windows: SearchWindows) -> SearchResult:
    """Loop-closure search: one region per candidate vertex pose ``[R, 3]``
    plus a π-rotated twin each (reference ``scanMatchingLC`` builds the
    twins at ``scan_matcher.cpp:222-241`` to catch reverse traversals).
    Returns per-region best poses/scores ``[2R, 3]`` / ``[2R]``; invalid
    regions get score FAR. One shared grid, vmap over regions."""
    center = jnp.sum(
        jnp.where(region_valid[:, None], region_poses[:, :2], 0.0), axis=0
    ) / jnp.maximum(jnp.sum(region_valid), 1)
    grid = _grid(cfg, ref_points, ref_valid, center)

    twins = region_poses.at[:, 2].add(jnp.pi)
    bases = jnp.concatenate([region_poses, twins], axis=0)       # [2R,3]
    bvalid = jnp.concatenate([region_valid, region_valid], axis=0)

    def one(base):
        r = grid_search(
            grid, center, cfg.resolution, cur_points, cur_valid, base,
            th_span=windows.lc_dth, th_res=windows.lc_th_res,
            x_span=windows.lc_dx, y_span=windows.lc_dy, topk=1,
        )
        return r.poses[0], r.scores[0]

    poses, scores = jax.vmap(one)(bases)
    scores = jnp.where(bvalid, scores, cfg.kernel_radius)
    return SearchResult(poses=poses, scores=scores)


@partial(jax.jit, static_argnames=("cfg", "windows"))
def loop_closure_match_hierarchical(
        ref_points: jax.Array, ref_valid: jax.Array,
        cur_points: jax.Array, cur_valid: jax.Array,
        guess: jax.Array, *, cfg: MatcherConfig,
        windows: SearchWindows) -> Match:
    """Alternative loop-closure mode (reference
    ``scanMatchingLChierarchical``, ``scan_matcher.cpp:296-356``; the
    reference keeps it selectable beside ``scanMatchingLC`` at ``:197``):
    ONE coarse-to-fine search over a ±2 m × ±1 rad window around the
    relative-pose guess, θ-res 0.025, 3 levels, on points subsampled to
    0.1 m (``CharGrid::subsample`` semantics via the matcher grid cell
    snap)."""
    from cg_mrslam_tpu.matcher.grid import subsample

    center = guess[:2]
    grid = _grid(cfg, ref_points, ref_valid, center)
    cur_valid = cur_valid & subsample(cur_points, cur_valid, center,
                                      cells=cfg.cells, resolution=0.1)
    res = hierarchical_search(
        grid, center, cfg.resolution, cur_points, cur_valid, guess,
        th_span=1.0, th_res=windows.lc_th_res,
        x_span=2.0, y_span=2.0, levels=3,
    )
    return Match(pose=res.poses[0], score=res.scores[0],
                 accepted=res.scores[0] < cfg.max_score)


@partial(jax.jit, static_argnames=("cfg", "windows"))
def global_match(ref_points: jax.Array, ref_valid: jax.Array,
                 cur_points: jax.Array, cur_valid: jax.Array,
                 guess: jax.Array, *, cfg: MatcherConfig,
                 windows: SearchWindows) -> Match:
    """Inter-robot matching with unknown relative pose
    (``globalMatching``): 4-level hierarchical search over ±10 m × ±5 m ×
    full −π..π around the reference vertex."""
    center = guess[:2]
    grid = _grid(cfg, ref_points, ref_valid, center)
    res = hierarchical_search(
        grid, center, cfg.resolution, cur_points, cur_valid, guess,
        th_span=jnp.pi, th_res=windows.global_th_res,
        x_span=windows.global_dx, y_span=windows.global_dy,
        levels=windows.global_levels,
    )
    return Match(pose=res.poses[0], score=res.scores[0],
                 accepted=res.scores[0] < cfg.max_score)


@partial(jax.jit, static_argnames=("cfg", "threshold"))
def verify_match(map_points: jax.Array, map_valid: jax.Array,
                 my_points: jax.Array, my_valid: jax.Array,
                 other_position: jax.Array, *, cfg: MatcherConfig,
                 threshold: float = 40.0) -> jax.Array:
    """Robot-in-range visibility gate (reference ``verifyMatching``,
    ``scan_matcher.cpp:430-505``): is the peer robot's BODY visible in my
    scan at its claimed position? My points unexplained by the peer's
    static map (grid distance > 0.3 m, ``:466``) are rasterized into a
    second distance grid; the mean of that grid over a ±0.3 m box around
    the claimed position (``countPoints``, ``:493-497``) is LOW exactly
    when unmatched returns — the robot body — cluster there. Detected ⇔
    mean ≤ ``threshold``/kscale meters (reference compares the uint8
    kscale=128 grid mean against 40 at ``:499-502``, i.e. 0.3125 m).
    Both point sets are already in MY world frame (the candidate closure
    transform applied to the peer's map)."""
    grid = _grid(cfg, map_points, map_valid, other_position)
    # grid values saturate at kernel_radius; the reference's 0.3 m cut
    # (scan_matcher.cpp:466) only discriminates on its 0.5 m LC kernel —
    # clamp below saturation so the gate works for any kernel radius
    thr = min(0.3, cfg.kernel_radius * 0.99)
    um = unmatched_points(grid, other_position, cfg.resolution, my_points,
                          my_valid, dist_threshold=thr)
    aux = _grid(cfg, my_points, um, other_position)
    score = box_mean(aux, other_position, cfg.resolution, other_position,
                     box_half=0.3)
    return score <= threshold / 128.0  # kscale, scan_matcher.cpp:34-36
