"""Real UDP transport + per-process robot nodes.

Exercises the deployment path of the reference — one process per robot,
datagrams on the wire (``graph_comm.cpp``) — with real localhost sockets:
two RobotNodes exchange beacons, combos, closure lists and condensed
stars over UDP and must reach the same protocol milestones as the
single-process sim (foreign vertices instantiated, stars spliced)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import dataclasses

import numpy as np
import pytest

from cg_mrslam_tpu import native
from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
from cg_mrslam_tpu.mr.transport import UdpTransport, peer_addresses

BASE_PORT = 45711  # away from the reference's 42001 to avoid collisions


def test_peer_addresses_reference_scheme():
    # reference: IP = baseAddr + (robotId+1), shared port 42001
    # (graph_comm.cpp:41-51)
    addrs = peer_addresses(3, "192.168.0.", 42001)
    assert addrs == [("192.168.0.1", 42001), ("192.168.0.2", 42001),
                     ("192.168.0.3", 42001)]
    # localhost scheme: shared IP, per-robot ports
    addrs = peer_addresses(2, "127.0.0.1", 42001)
    assert addrs == [("127.0.0.1", 42002), ("127.0.0.1", 42003)]


def test_native_udp_lib_builds():
    assert native.udp_lib() is not None


def _roundtrip(t0, t1, deadline=5.0):
    import time

    payload = b"\x01\x02" * 500
    assert t0.send(1, payload)
    end = time.time() + deadline
    got = None
    while time.time() < end and got is None:
        got = t1.recv()
        if got is None:
            time.sleep(0.01)
    assert got == payload


def test_transport_roundtrip_native():
    t0 = UdpTransport(0, 2, base_port=BASE_PORT)
    t1 = UdpTransport(1, 2, base_port=BASE_PORT)
    try:
        assert t0.native and t1.native
        _roundtrip(t0, t1)
    finally:
        t0.close()
        t1.close()


def test_transport_roundtrip_python_fallback(monkeypatch):
    monkeypatch.setattr(native, "udp_lib", lambda: None)
    t0 = UdpTransport(0, 2, base_port=BASE_PORT + 10)
    t1 = UdpTransport(1, 2, base_port=BASE_PORT + 10)
    try:
        assert not t0.native and not t1.native
        _roundtrip(t0, t1)
    finally:
        t0.close()
        t1.close()


def test_transport_drain_order_and_bound():
    t0 = UdpTransport(0, 2, base_port=BASE_PORT + 20)
    t1 = UdpTransport(1, 2, base_port=BASE_PORT + 20)
    try:
        import time

        for k in range(8):
            t0.send(1, bytes([k]))
        time.sleep(0.3)
        msgs = t1.drain()
        assert [m[0] for m in msgs] == list(range(8))
    finally:
        t0.close()
        t1.close()


CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    mr=MRConfig(n_robots=2, min_inliers_mr=4, sim_comm_range=6.0,
                max_score_mr=0.2),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=96, max_edges=512)


@pytest.mark.slow
def test_two_nodes_over_udp():
    """Full protocol over real sockets: two nodes, opposite corridor
    patrols, REAL modality (always send, like the reference's radio)."""
    from cg_mrslam_tpu.mr.node import RobotNode
    from cg_mrslam_tpu.sim import world as W

    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    fov = 2 * np.pi * 0.75
    trajs = [
        W.simulate_robot(world, W.corridor_waypoints(16.0, 10.0, r, 2),
                         seed=11 + 7 * r, beams=120, fov=fov,
                         max_range=8.0, odom_noise=(0.02, 0.008))
        for r in range(2)
    ]
    nodes = [
        RobotNode(CFG, r, 120, trajs[r].gt[0], trajs[r].ranges[0], fov,
                  8.0, UdpTransport(r, 2, base_port=BASE_PORT + 30),
                  modality="real", gt_pose=trajs[r].gt[0])
        for r in range(2)
    ]
    try:
        T = min(260, min(len(t.gt) for t in trajs))
        for t in range(1, T):
            any_kf = False
            for r, node in enumerate(nodes):
                kf = node.observe(trajs[r].rel_odom[t - 1],
                                  trajs[r].ranges[t],
                                  gt_pose=trajs[r].gt[t])
                any_kf = any_kf or kf
            if any_kf:
                import time

                for node in nodes:
                    node.comm_round(0.1 * t)
                time.sleep(0.05)  # let datagrams land
                for node in nodes:
                    node.comm_round(0.1 * t + 0.05)

        # each node heard the other's beacons and messages
        for node in nodes:
            assert node.stats["received"] > 0, node.stats
            assert node.stats["decode_errors"] == 0, node.stats
        # foreign vertices instantiated on both sides
        for r, node in enumerate(nodes):
            vo = np.asarray(node.state.slam.v_owner)[
                np.asarray(node.state.slam.graph.vmask)]
            assert (vo == 1 - r).sum() > 0, (r, vo.tolist())
        # at least one side spliced a condensed star (level = 1 + peer)
        lvls = []
        for r, node in enumerate(nodes):
            g = node.state.slam.graph
            lvl = np.asarray(g.e_level)[np.asarray(g.emask)]
            lvls.append(lvl)
        got_star = (lvls[0] == 2).sum() + (lvls[1] == 1).sum()
        assert got_star > 0, [l.tolist() for l in lvls]
        # ping log round-trips for BAG replay
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "pings.jsonl")
            nodes[0].save_pings(p)
            assert os.path.getsize(p) > 0
            nodes[0].load_pings(p)
            nodes[0].bag_tick(1e9)
    finally:
        for node in nodes:
            node.close()


@pytest.mark.slow
def test_heterogeneous_beam_nodes_interop():
    """VERDICT #9 done-criterion: nodes with DIFFERENT beam counts
    interoperate — the combo wire format is self-describing and the
    receiver resamples the peer's scan onto its own grid (the reference
    ships laser params per RobotLaserMessage for the same reason)."""
    from cg_mrslam_tpu.mr.node import RobotNode
    from cg_mrslam_tpu.sim import world as W

    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    fov = 2 * np.pi * 0.75
    beams = [120, 180]
    trajs = [
        W.simulate_robot(world, W.corridor_waypoints(16.0, 10.0, r, 1),
                         seed=11 + 7 * r, beams=beams[r], fov=fov,
                         max_range=8.0, odom_noise=(0.02, 0.008))
        for r in range(2)
    ]
    nodes = [
        RobotNode(CFG, r, beams[r], trajs[r].gt[0], trajs[r].ranges[0],
                  fov, 8.0, UdpTransport(r, 2, base_port=BASE_PORT + 50),
                  modality="real", gt_pose=trajs[r].gt[0])
        for r in range(2)
    ]
    try:
        import time

        T = min(160, min(len(t.gt) for t in trajs))
        for t in range(1, T):
            any_kf = False
            for r, node in enumerate(nodes):
                kf = node.observe(trajs[r].rel_odom[t - 1],
                                  trajs[r].ranges[t],
                                  gt_pose=trajs[r].gt[t])
                any_kf = any_kf or kf
            if any_kf:
                for node in nodes:
                    node.comm_round(0.1 * t)
                time.sleep(0.05)
                for node in nodes:
                    node.comm_round(0.1 * t + 0.16)

        for r, node in enumerate(nodes):
            assert node.stats["decode_errors"] == 0, node.stats
            vo = np.asarray(node.state.slam.v_owner)[
                np.asarray(node.state.slam.graph.vmask)]
            assert (vo == 1 - r).sum() > 0, (r, vo.tolist())
            # the foreign scans were resampled to MY beam count and are
            # usable (finite, within my max range)
            st = node.state.slam
            foreign = (np.asarray(st.graph.vmask)
                       & (np.asarray(st.v_owner) == 1 - r)
                       & np.asarray(st.scans.smask))
            assert foreign.any()
            rr = np.asarray(st.scans.ranges)[foreign]
            assert rr.shape[1] == beams[r]
            assert np.isfinite(rr).all() and (rr <= 8.0 + 1e-4).all()
    finally:
        for node in nodes:
            node.close()


def test_node_bucketed_stepping_and_capacity_counter():
    """Round-2 verdict item 6: the deployment path must (a) run the
    bucketed step (a slice smaller than capacity compiles and serves
    the early run) and (b) COUNT keyframes refused at the capacity
    stop instead of silently dropping them."""
    from cg_mrslam_tpu.mr.node import RobotNode

    cfg = Config(
        slam=SlamConfig(),
        mr=MRConfig(n_robots=1),
        close_matcher=MatcherConfig(extent=8.0, resolution=0.1,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=12.0, resolution=0.2,
                                 kernel_radius=0.5),
        max_vertices=300, max_edges=1200, max_beams=64)
    fov = 2 * np.pi * 0.75
    ranges = np.full((64,), 5.0, np.float32)
    node = RobotNode(cfg, 0, 64, np.zeros(3), ranges, fov, 8.0,
                     UdpTransport(0, 1, base_port=BASE_PORT + 60),
                     modality="real")
    try:
        for _ in range(3):
            assert node.observe(np.asarray([0.3, 0.0, 0.0]), ranges)
        # (a) the step ran on a SLICE: the bucket in use is smaller than
        # the graph capacity (256 < 300), not the full-capacity program
        assert any(nb < cfg.max_vertices
                   for (nb, eb) in node.runner._seen), node.runner._seen

        # (b) capacity stop is counted, not silent
        cfg2 = dataclasses.replace(cfg, max_vertices=8, max_edges=64)
        node2 = RobotNode(cfg2, 0, 64, np.zeros(3), ranges, fov, 8.0,
                          UdpTransport(0, 1, base_port=BASE_PORT + 61),
                          modality="real")
        try:
            for _ in range(8):
                node2.observe(np.asarray([0.3, 0.0, 0.0]), ranges)
            assert node2.stats["keyframes_capacity_stopped"] > 0
            assert int(node2.state.slam.graph.n_vertices) \
                <= cfg2.max_vertices - 4
        finally:
            node2.close()
    finally:
        node.close()
