"""Viz export, ping-log bag connectivity, and drop-injection robustness."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
from cg_mrslam_tpu.mr import network as NET
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.maps import viz
from cg_mrslam_tpu.sim import world as W


def test_ping_log_bag_connectivity():
    log = NET.PingLog(3)
    log.record(0.0, 0, 1)
    log.record(5.0, 1, 2)
    m = np.asarray(log.connectivity(6.0, timeout=10.0))
    assert m[0, 1] and m[1, 2]
    assert not m[0, 2] and not m[2, 1]
    m = np.asarray(log.connectivity(12.0, timeout=10.0))
    assert not m[0, 1] and m[1, 2]  # first ping aged out


def test_ping_log_from_positions():
    log = NET.PingLog(2)
    log.record_from_positions(1.0, [[0.0, 0.0], [3.0, 0.0]],
                              comm_range=5.0)
    m = np.asarray(log.connectivity(2.0))
    assert m[0, 1] and m[1, 0]


def _small_cfg():
    return Config(
        slam=SlamConfig(min_inliers=4, window_loop_closure=8),
        mr=MRConfig(n_robots=2, min_inliers_mr=4, sim_comm_range=6.0,
                    max_score_mr=0.2),
        close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=192, max_edges=1024)


def test_protocol_survives_50pct_drops():
    """With half the messages dropped each round the exchange still
    completes (idempotent resend design — SURVEY §5 failure row)."""
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(_small_cfg(), world, beams=120, seed=11,
                            n_loops=2, width=16.0, height=10.0)
    sim.drop_prob = 0.5
    sim.run(max_ticks=700)
    st0, st1 = sim.states
    own0 = np.asarray(st0.slam.v_owner)[np.asarray(st0.slam.graph.vmask)]
    assert (own0 == 1).sum() > 3
    lvl0 = np.asarray(st0.slam.graph.e_level)[
        np.asarray(st0.slam.graph.emask)]
    lvl1 = np.asarray(st1.slam.graph.e_level)[
        np.asarray(st1.slam.graph.emask)]
    assert (lvl0 == 2).sum() + (lvl1 == 1).sum() > 0
    # graphs stay finite under loss
    for st in (st0, st1):
        p = np.asarray(st.slam.graph.poses)[np.asarray(st.slam.graph.vmask)]
        assert np.isfinite(p).all()


def test_viz_exports(tmp_path):
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam

    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    wps = W.corridor_waypoints(16.0, 10.0, 0, 1)
    traj = W.simulate_robot(world, wps, seed=5, beams=120, max_range=8.0)
    fov = 2 * np.pi * 0.75
    cfg = _small_cfg()
    slam = SingleRobotSlam(cfg, 120, traj.gt[0], traj.ranges[0], fov, 8.0)
    for t in range(1, 120):
        slam.observe(traj.rel_odom[t - 1], traj.ranges[t])

    tr = viz.trajectory(slam.state)
    assert tr.shape[0] == int(slam.state.graph.n_vertices)
    pts = viz.laser_map_points(slam.state, stride=10)
    assert pts.shape[0] > 50
    corr = viz.map_to_odom(tr[-1], tr[-1])
    np.testing.assert_allclose(corr, [0, 0, 0], atol=1e-5)

    out = str(tmp_path / "m.pgm")
    viz.render_png(out, slam.state)
    data = open(out, "rb").read()
    assert data.startswith(b"P5\n")
