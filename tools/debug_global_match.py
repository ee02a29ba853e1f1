"""Instrument every global-match attempt of the failing FleetSim seed.

Wraps MR.try_match_parked: before the real call, re-runs the same local
map grid + hierarchical search and reports, for the best candidate AND
for the ground-truth transform of the parked vertex:
  - raw score
  - fraction of points landing on well-mapped cells (dist < 0.25)
  - fraction on frontier cells (saturated kernel_radius value)
  - heading error vs ground truth
This separates 'truth scores worse because of frontier saturation' from
'search never found the true basin'.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config, MatcherConfig, MRConfig, SlamConfig
from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.matcher.search import hierarchical_search, score_volume
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.sim import world as W
from cg_mrslam_tpu.utils import se2

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    mr=MRConfig(n_robots=2, min_inliers_mr=4, sim_comm_range=6.0,
                max_score_mr=0.2),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=96, max_edges=512)

TICKS = int(sys.argv[1]) if len(sys.argv) > 1 else 260

world = W.hospital_world(width=16.0, height=10.0, seed=2)
hs = MRS.MultiRobotSim(CFG, world, beams=120, seed=11, n_loops=2,
                       width=16.0, height=10.0)

orig = MR.try_match_parked
KR = CFG.lc_matcher.kernel_radius


def point_stats(grid, center, res, pts, valid, pose):
    wp = np.asarray(se2.apply(jnp.asarray(pose, jnp.float32), pts))
    cells = grid.shape[0]
    cell = np.floor((wp - np.asarray(center)) / res + cells / 2).astype(int)
    inb = ((cell >= 0) & (cell < cells)).all(-1) & np.asarray(valid)
    v = np.asarray(grid)[np.clip(cell[:, 1], 0, cells - 1),
                         np.clip(cell[:, 0], 0, cells - 1)]
    nv = max(int(np.asarray(valid).sum()), 1)
    explained = float(((v < 0.25) & inb).sum()) / nv
    frontier = float(((v > KR - 1e-6) & inb).sum()) / nv
    offgrid = float((~inb & np.asarray(valid)).sum()) / nv
    score = float(np.where(inb, v, 0.0).sum() / nv)
    return score, explained, frontier, offgrid


def wrapped(st, cfg):
    slam = st.slam
    n = slam.v_owner.shape[0]
    fresh = np.where(np.asarray(st.parked), -np.asarray(st.park_age),
                     -(1 << 30))
    cand = int(fresh.argmax())
    if st.parked[cand]:
        me = int(slam.my_id)
        grid, center, my_ref, _, _ = MR._local_map_grid(
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
        best_pose = np.asarray(res.poses[0])
        best_score = float(res.scores[0])
        # ground truth transform of the parked vertex in MY gt frame
        owner = int(slam.v_owner[cand])
        ridx = int(slam.v_remote[cand])
        if ridx < len(hs.kf_gt[owner]):
            gt_pose = np.asarray(hs.kf_gt[owner][ridx], np.float64)
            resl = CFG.lc_matcher.resolution
            bs, be, bf, bo = point_stats(grid, center, resl, cur_pts,
                                         cur_valid, best_pose)
            ts, te, tf, to = point_stats(grid, center, resl, cur_pts,
                                         cur_valid, gt_pose)
            dth = abs((best_pose[2] - gt_pose[2] + np.pi)
                      % (2 * np.pi) - np.pi)
            dxy = np.hypot(*(best_pose[:2] - gt_pose[:2]))
            acc = best_score < cfg.mr.max_score_mr
            print(f"[r{me}] cand=({owner},{ridx}) "
                  f"best: s={best_score:.3f} expl={be:.2f} fro={bf:.2f} "
                  f"off={bo:.2f} | true: s={ts:.3f} expl={te:.2f} "
                  f"fro={tf:.2f} off={to:.2f} | dxy={dxy:.2f} "
                  f"dth={dth:.2f} {'ACCEPT' if acc else 'reject'}"
                  f"{' WRONG' if acc and (dxy > 1 or dth > 0.5) else ''}",
                  flush=True)
    return orig(st, cfg)


MR.try_match_parked = wrapped
MRS.MR.try_match_parked = wrapped

hs.run(max_ticks=TICKS)
