"""CARMEN .clf ingestion: round-trip, FLASER parsing, replay into SLAM."""

import numpy as np

from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
from cg_mrslam_tpu.io import carmen
from cg_mrslam_tpu.sim import world as W


def _synthetic_log(tmp_path, beams=90, ticks=60):
    world = W.hospital_world(16.0, 10.0, seed=3)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(16.0, 10.0, 0, 1), seed=4,
        beams=beams, fov=2 * np.pi * 0.75, max_range=8.0,
        odom_noise=(0.01, 0.004))
    path = str(tmp_path / "synthetic.clf")
    carmen.write(path, traj.odom[:ticks], traj.ranges[:ticks],
                 fov=2 * np.pi * 0.75, max_range=8.0)
    return path, traj, ticks


def test_roundtrip_robotlaser1(tmp_path):
    path, traj, T = _synthetic_log(tmp_path)
    log = carmen.read(path)
    assert log.ranges.shape == (T, traj.ranges.shape[1])
    np.testing.assert_allclose(log.odom, traj.odom[:T], atol=1e-5)
    np.testing.assert_allclose(log.ranges, traj.ranges[:T], atol=2e-3)
    assert abs(log.fov - 2 * np.pi * 0.75) < 1e-5
    assert abs(log.max_range - 8.0) < 1e-9
    # relative odometry composes back to absolute
    rel = log.rel_odom()
    p = log.odom[0].copy()
    for r in rel:
        c, s = np.cos(p[2]), np.sin(p[2])
        p = np.array([p[0] + c * r[0] - s * r[1],
                      p[1] + s * r[0] + c * r[1], p[2] + r[2]])
    np.testing.assert_allclose(p[:2], log.odom[-1][:2], atol=1e-4)


def test_flaser_parse_and_resample(tmp_path):
    lines = ["# comment\n", "PARAM robot_frontlaser_offset 0.08\n"]
    for t in range(3):
        r = " ".join(["2.0"] * 181)
        lines.append(
            f"FLASER 181 {r} {0.1*t:.3f} 0.0 0.0 {0.1*t:.3f} 0.0 0.0 "
            f"{100.0+t:.3f} host {100.0+t:.3f}\n")
    path = tmp_path / "intel.clf"
    path.write_text("".join(lines))
    log = carmen.read(str(path), beams=64, max_range=5.0)
    assert log.ranges.shape == (3, 64)
    assert np.all(log.ranges == 2.0)
    assert abs(log.fov - np.pi) < 1e-9
    np.testing.assert_allclose(log.odom[:, 0], [0.0, 0.1, 0.2],
                               atol=1e-9)
    np.testing.assert_allclose(log.rel_odom()[:, 0], 0.1, atol=1e-9)


def test_replay_into_slam(tmp_path):
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam

    path, traj, T = _synthetic_log(tmp_path, beams=90, ticks=50)
    log = carmen.read(path, beams=90)
    cfg = Config(
        slam=SlamConfig(),
        close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=32, max_edges=128)
    slam = SingleRobotSlam(cfg, 90, log.odom[0], log.ranges[0],
                           log.fov, log.max_range)
    rel = log.rel_odom()
    kfs = 0
    for t in range(1, len(log.odom)):
        kfs += bool(slam.observe(rel[t - 1], log.ranges[t]))
    assert int(slam.state.graph.n_vertices) == 1 + kfs
    assert kfs >= 1
