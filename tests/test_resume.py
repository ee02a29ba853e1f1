"""Checkpoint/resume: save mid-run, reload, continue keyframing."""

import numpy as np

from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
from cg_mrslam_tpu.io import g2o
from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
from cg_mrslam_tpu.sim import world as W

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=128, max_edges=512)


def test_save_resume_continue(tmp_path):
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    wps = W.corridor_waypoints(16.0, 10.0, 0, 1)
    traj = W.simulate_robot(world, wps, seed=5, beams=120, max_range=8.0)
    fov = 2 * np.pi * 0.75
    slam = SingleRobotSlam(CFG, 120, traj.gt[0], traj.ranges[0], fov, 8.0)

    cut = 120
    for t in range(1, cut):
        slam.observe(traj.rel_odom[t - 1], traj.ranges[t])
    n_before = int(slam.state.graph.n_vertices)
    assert n_before > 10

    path = str(tmp_path / "ckpt.g2o")
    ids = (np.asarray(slam.state.v_remote)
           + np.asarray(slam.state.v_owner) * CFG.slam.base_id)
    g2o.save(path, slam.state.graph, ids=ids.astype(np.int64),
             scans=slam.state.scans)

    slam2 = SingleRobotSlam.resume(CFG, path)
    assert int(slam2.state.graph.n_vertices) == n_before
    np.testing.assert_allclose(
        np.asarray(slam2.state.graph.poses[:n_before]),
        np.asarray(slam.state.graph.poses[:n_before]), atol=1e-5)
    # scans survived the roundtrip
    assert int(np.asarray(slam2.state.scans.smask).sum()) == n_before

    # continue the run: keyframes append and optimization stays sane
    for t in range(cut, min(cut + 120, len(traj.gt))):
        slam2.observe(traj.rel_odom[t - 1], traj.ranges[t])
    n_after = int(slam2.state.graph.n_vertices)
    assert n_after > n_before
    p = np.asarray(slam2.state.graph.poses)[
        np.asarray(slam2.state.graph.vmask)]
    assert np.isfinite(p).all()
    # continued estimates stay near ground truth (close match anchors on
    # the reloaded map)
    err = np.asarray(slam2.infos[-1].pose)[:2] - traj.gt[
        min(cut + 119, len(traj.gt) - 1)][:2]
    assert np.hypot(*err) < 1.0, err
