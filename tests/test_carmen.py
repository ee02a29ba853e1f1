"""CARMEN .clf ingestion: round-trip, FLASER parsing, geometry fidelity,
replay into SLAM (ADVICE round-1 items: explicit beam geometry, no
blending across invalid returns, per-record resampling)."""

import numpy as np

from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
from cg_mrslam_tpu.io import carmen
from cg_mrslam_tpu.sim import world as W

FOV = 2 * np.pi * 0.75


def _synthetic_log(tmp_path, beams=90, ticks=60):
    world = W.hospital_world(16.0, 10.0, seed=3)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(16.0, 10.0, 0, 1), seed=4,
        beams=beams, fov=FOV, max_range=8.0, odom_noise=(0.01, 0.004))
    path = str(tmp_path / "synthetic.clf")
    # the simulator's grid is endpoint-EXCLUSIVE (step = fov/B, start
    # −fov/2); declare exactly that instead of assuming fov/(B−1)
    carmen.write(path, traj.odom[:ticks], traj.ranges[:ticks],
                 fov=FOV, max_range=8.0,
                 start_angle=-FOV / 2, angular_step=FOV / beams)
    return path, traj, ticks


def test_roundtrip_robotlaser1(tmp_path):
    beams = 90
    path, traj, T = _synthetic_log(tmp_path, beams=beams)
    log = carmen.read(path)
    assert log.ranges.shape == (T, beams)
    np.testing.assert_allclose(log.odom, traj.odom[:T], atol=1e-5)
    np.testing.assert_allclose(log.ranges, traj.ranges[:T], atol=2e-3)
    # geometry survives EXACTLY: same start angle and beam spacing the
    # data was generated with (the round-1 ADVICE failure mode was a
    # declared ares of fov/(B-1) for fov/B data)
    assert abs(log.start_angle + FOV / 2) < 1e-6
    assert abs(log.angular_step - FOV / beams) < 1e-9
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
    # classic FLASER: endpoint-inclusive π span, start −π/2
    assert abs(log.start_angle + np.pi / 2) < 1e-9
    assert abs(log.angular_step * 63 - np.pi) < 1e-6
    np.testing.assert_allclose(log.odom[:, 0], [0.0, 0.1, 0.2],
                               atol=1e-9)
    np.testing.assert_allclose(log.rel_odom()[:, 0], 0.1, atol=1e-9)


def test_invalid_returns_do_not_blend(tmp_path):
    """A no-return beam next to a short return must not interpolate into
    a phantom mid-range hit when resampling (ADVICE medium #2)."""
    n = 91
    r = ["2.000"] * n
    r[40] = "81.900"                   # SICK no-return
    line = (f"FLASER {n} {' '.join(r)} 0 0 0 0 0 0 100.0 host 100.0\n")
    path = tmp_path / "d.clf"
    path.write_text(line)
    log = carmen.read(str(path), beams=181, max_range=8.0)
    out = log.ranges[0]
    # dst beams bracketing the invalid source beam read max range
    src_a = -np.pi / 2 + (np.pi / (n - 1)) * 40
    dst_a = log.start_angle + log.angular_step * np.arange(181)
    snapped = np.abs(dst_a - src_a) <= np.pi / (n - 1)
    assert snapped.any()
    assert (out[snapped] >= 8.0 - 1e-4).all()
    # far from it: exact 2.0
    far = np.abs(dst_a - src_a) > 3 * np.pi / (n - 1)
    np.testing.assert_allclose(out[far], 2.0, atol=1e-3)


def test_mixed_beam_counts_resample_per_record(tmp_path):
    """181- and 361-beam records in one log each resample on their OWN
    grid (ADVICE low #3: padding a 181-beam scan to 361 would reinterpret
    its angular span)."""
    lines = []
    r181 = " ".join(["3.0"] * 181)
    r361 = " ".join(["4.0"] * 361)
    lines.append(f"FLASER 181 {r181} 0 0 0 0 0 0 1.0 h 1.0\n")
    lines.append(f"FLASER 361 {r361} 0 0 0 0 0 0 2.0 h 2.0\n")
    path = tmp_path / "mixed.clf"
    path.write_text("".join(lines))
    log = carmen.read(str(path), beams=91, max_range=8.0)
    assert log.ranges.shape == (2, 91)
    np.testing.assert_allclose(log.ranges[0], 3.0, atol=1e-4)
    np.testing.assert_allclose(log.ranges[1], 4.0, atol=1e-4)


def test_laser_offset_recovered(tmp_path):
    """laser_pose = odom ∘ (0.08, 0, 0) recovers the front-laser offset
    (ADVICE low #4: the Intel dataset's 0.08 m offset must reach
    scan-matching)."""
    T, B = 5, 45
    rng = np.random.default_rng(0)
    odom = np.cumsum(rng.normal(0, 0.1, (T, 3)), axis=0)
    c, s = np.cos(odom[:, 2]), np.sin(odom[:, 2])
    lp = odom.copy()
    lp[:, 0] += 0.08 * c
    lp[:, 1] += 0.08 * s
    ranges = np.full((T, B), 3.0, np.float32)
    path = str(tmp_path / "off.clf")
    carmen.write(path, odom, ranges, fov=np.pi, max_range=8.0,
                 laser_pose=lp)
    log = carmen.read(path)
    off = log.laser_offset()
    np.testing.assert_allclose(off, [0.08, 0.0, 0.0], atol=1e-5)


def test_replay_into_slam(tmp_path):
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam

    path, traj, T = _synthetic_log(tmp_path, beams=90, ticks=50)
    log = carmen.read(path)
    cfg = Config(
        slam=SlamConfig(),
        close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=32, max_edges=128)
    slam = SingleRobotSlam(cfg, 90, log.odom[0], log.ranges[0],
                           log.fov, log.max_range,
                           laser_offset=tuple(log.laser_offset()),
                           first_beam_angle=log.start_angle,
                           angular_step=log.angular_step)
    rel = log.rel_odom()
    kfs = 0
    for t in range(1, len(log.odom)):
        kfs += bool(slam.observe(rel[t - 1], log.ranges[t]))
    assert int(slam.state.graph.n_vertices) == 1 + kfs
    assert kfs >= 1
