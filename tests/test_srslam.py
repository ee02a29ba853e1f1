"""End-to-end single-robot SLAM: simulate a hospital patrol with odometry
noise, run the fused keyframe pipeline, check drift is corrected by loop
closures (ATE well under raw odometry drift)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import dataclasses

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
from cg_mrslam_tpu.sim import world as W

# scaled-down world + capacities: keeps CPU compile/solve time sane while
# exercising every stage (close match, candidates, vote, optimize)
CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=128,
    max_edges=512,
)


def _ate(est, gt):
    """RMS translational error after SE(2) alignment of the first pose."""
    import cg_mrslam_tpu.utils.se2 as se2
    anchor = se2.compose(jnp.asarray(gt[0], jnp.float32),
                         se2.inverse(jnp.asarray(est[0], jnp.float32)))
    aligned = np.asarray(se2.compose(anchor, jnp.asarray(est, jnp.float32)))
    return float(np.sqrt(np.mean(np.sum((aligned[:, :2] - gt[:, :2]) ** 2,
                                        axis=1))))


def test_single_robot_pipeline_closes_loops():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    wps = W.corridor_waypoints(16.0, 10.0, robot=0, n_loops=2)
    traj = W.simulate_robot(world, wps, seed=5, beams=120, max_range=8.0,
                            odom_noise=(0.02, 0.008))

    fov = 2 * np.pi * 0.75
    slam = SingleRobotSlam(CFG, beams=120, initial_pose=traj.gt[0],
                           ranges=traj.ranges[0], fov=fov, max_range=8.0)

    kf_gt = [traj.gt[0]]
    for t in range(1, len(traj.gt)):
        if slam.observe(traj.rel_odom[t - 1], traj.ranges[t]):
            kf_gt.append(traj.gt[t])
        if int(slam.state.graph.n_vertices) >= CFG.max_vertices - 2:
            break
    kf_gt = np.asarray(kf_gt)

    n = int(slam.state.graph.n_vertices)
    assert n == len(kf_gt)
    assert n > 40, "trajectory too short to exercise the pipeline"

    est = slam.poses
    ate = _ate(est, kf_gt)

    # odometry-only baseline over the same keyframes
    odom_kf = []
    k = 0
    for t in range(len(traj.gt)):
        if k < len(kf_gt) and np.allclose(traj.gt[t], kf_gt[k]):
            odom_kf.append(traj.odom[t])
            k += 1
    odom_kf = np.asarray(odom_kf)
    ate_odom = _ate(odom_kf, kf_gt)

    closures = sum(int(i.closures_added) for i in slam.infos)
    assert closures > 0, "no loop closures were ever accepted"
    assert ate < 0.25, f"ATE {ate:.3f} m too large (odom {ate_odom:.3f})"
    assert ate < ate_odom, (ate, ate_odom)
    # sanity: scan matching refined most odometry edges
    sm_rate = np.mean([bool(i.sm_accepted) for i in slam.infos])
    assert sm_rate > 0.8, sm_rate
