"""Sensor ingestion seam: replay, sim, and LIVE UDP-JSON sources all
drive the same SLAM loop (the RosHandler contract)."""

import json
import socket
import threading
import time

import numpy as np

from cg_mrslam_tpu.config import Config, MatcherConfig
from cg_mrslam_tpu.io import stream as ST

CFG = Config(
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=32, max_edges=128)


def test_sim_source_contract():
    src = ST.SimSource(width=16.0, height=10.0, beams=90, max_range=8.0,
                       loops=1, seed=3)
    geom, pose0, r0 = src.open()
    assert geom.beams == 90 and r0.shape == (90,)
    n = 0
    for rel, ranges in src.read():
        assert rel.shape == (3,) and ranges.shape == (90,)
        n += 1
        if n >= 5:
            break
    assert n == 5


def test_replay_source_runs_slam(tmp_path):
    from cg_mrslam_tpu.io import carmen
    from cg_mrslam_tpu.sim import world as W

    world = W.hospital_world(16.0, 10.0, seed=3)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(16.0, 10.0, 0, 1), seed=4, beams=90,
        fov=2 * np.pi * 0.75, max_range=8.0)
    path = str(tmp_path / "log.clf")
    carmen.write(path, traj.odom[:40], traj.ranges[:40],
                 fov=2 * np.pi * 0.75, max_range=8.0,
                 start_angle=-np.pi * 0.75, angular_step=2 * np.pi * 0.75 / 90)
    slam = ST.run_slam_on_source(ST.ReplaySource(path), cfg=CFG,
                                 max_keyframes=3)
    assert int(slam.state.graph.n_vertices) >= 2


def test_udp_json_live_source():
    """A driver process feeds measurements over a datagram socket; the
    source blocks on the first pair (waitForMessage semantics) and
    derives relative odometry from absolute poses."""
    port = 47211
    src = ST.UdpJsonSource(port, timeout=5.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def driver():
        time.sleep(0.1)
        tx.sendto(json.dumps({"geometry": {
            "beams": 8, "first_beam_angle": -1.5, "angular_step": 0.4,
            "max_range": 5.0, "laser_offset": [0.1, 0.0, 0.0]}}
        ).encode(), ("127.0.0.1", port))
        for k in range(4):
            tx.sendto(json.dumps({
                "odom": [0.3 * k, 0.0, 0.0],
                "ranges": [2.0] * 8}).encode(), ("127.0.0.1", port))
            time.sleep(0.02)

    th = threading.Thread(target=driver)
    th.start()
    try:
        geom, pose0, r0 = src.open()
        assert geom.beams == 8 and abs(geom.laser_offset[0] - 0.1) < 1e-9
        np.testing.assert_allclose(pose0, [0.0, 0.0, 0.0], atol=1e-9)
        rels = []
        src._sock.settimeout(1.0)
        for rel, ranges in src.read():
            rels.append(rel)
            if len(rels) >= 3:
                break
        assert len(rels) == 3
        np.testing.assert_allclose(
            np.asarray(rels)[:, 0], 0.3, atol=1e-6)
    finally:
        th.join()
        src.close()
        tx.close()
