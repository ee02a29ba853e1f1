"""4-robot configuration (the reference's second experiment config,
4robots-hospital.bag): all pairs exchange, every robot ends with foreign
vertices and finite estimates; at least one condensed star flows."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import numpy as np

from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.sim import world as W

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    mr=MRConfig(n_robots=4, min_inliers_mr=5, sim_comm_range=7.0,
                max_score_mr=0.2),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=224, max_edges=1024)


def test_four_robot_exchange():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(CFG, world, beams=120, seed=21, n_loops=1,
                            width=16.0, height=10.0)
    sim.run(max_ticks=420)

    foreign_counts = []
    stars = 0
    for r, st in enumerate(sim.states):
        vm = np.asarray(st.slam.graph.vmask)
        vo = np.asarray(st.slam.v_owner)[vm]
        foreign_counts.append(int((vo != r).sum()))
        lvl = np.asarray(st.slam.graph.e_level)[
            np.asarray(st.slam.graph.emask)]
        stars += int((lvl > 0).sum())
        p = np.asarray(st.slam.graph.poses)[vm]
        assert np.isfinite(p).all(), f"robot {r} diverged"
    # every robot met someone
    assert all(c > 0 for c in foreign_counts), foreign_counts
    assert stars > 0


@pytest.mark.xfail(reason=(
    "KNOWN GAP (round-5 measurement): dense 4-robot rendezvous in the "
    "16x10 m toy world still drifts. Solo replays of every route are "
    "clean (ATE 0.06-0.07 m) and at the reference-default vote "
    "(minInliersMR=5) two of four robots localize (0.08/0.26 m), but "
    "~5 corridor-slide aliases survive the window vote at one robot, "
    "bend its map, and the bend propagates fleet-wide through its "
    "condensed stars (robot 0: ATE 2.3 m with ZERO wrong closures of "
    "its own). The per-match defenses (coverage floor, pooled bounds, "
    "theta trust) fixed the 2-robot gate; the remaining failure is "
    "cross-robot error CONTAGION through star exchange, which needs an "
    "inter-robot consistency check against already-accepted structure "
    "— out of scope this round, tracked here so the bar stays visible."),
    strict=False)
def test_four_robot_localization_quality():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(CFG, world, beams=120, seed=21, n_loops=1,
                            width=16.0, height=10.0)
    sim.run(max_ticks=420)
    for r, st in enumerate(sim.states):
        vo = np.asarray(st.slam.v_owner)
        vm = np.asarray(st.slam.graph.vmask)
        own = np.where((vo == r) & vm)[0]
        gt = np.asarray(sim.kf_gt[r])
        p = np.asarray(st.slam.graph.poses)[own]
        n = min(len(gt), len(p))
        ate = float(np.linalg.norm(p[:n, :2] - gt[:n, :2],
                                   axis=1).mean())
        assert ate < 0.5, (r, ate)
