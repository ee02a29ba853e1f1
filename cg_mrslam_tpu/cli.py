"""Command-line entry points: ``srslam`` and ``cg_mrslam`` equivalents.

Mirrors the reference binaries' flag surface
(``/root/reference/src/srslam.cpp:77-98``, ``src/cg_mrslam.cpp:69-117``:
``-resolution -maxScore -minInliers -windowLoopClosure -inlierThreshold
-angularUpdate -linearUpdate -nRobots -maxScoreMR -minInliersMR
-windowMRLoopClosure -modality -o``), driving the synthetic hospital
world instead of ROS topics (the reference's bagfiles are absent from its
checkout — see SURVEY §6). Outputs match the reference's artifacts:
``robot-<i>-<name>.g2o`` graph dumps (``cg_mrslam.cpp:228-230``) and a
map-server ``.pgm/.yaml`` occupancy map pair
(``occupancy_map_server.cpp:128-169``).

Usage:
    python -m cg_mrslam_tpu srslam  -o out.g2o --ticks 800
    python -m cg_mrslam_tpu cg_mrslam --nRobots 2 --modality sim -o exp
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def _checkpoint_every_keyframe(slam_state, cfg, name: str,
                               robot_id: int = 0):
    """Per-keyframe ``.g2o`` save — the reference's crash-tolerance story
    (``cg_mrslam.cpp:228-230`` rewrites the graph file after every
    keyframe). The device→host fetch happens here (unavoidable — it IS
    the checkpoint), but file IO runs on a background thread with at
    most one write in flight, so the keyframe loop never blocks on disk.
    """
    import threading

    from cg_mrslam_tpu.io import g2o

    vo = np.asarray(slam_state.v_owner)
    vr = np.asarray(slam_state.v_remote)
    ids = (vr + vo * cfg.slam.base_id).astype(np.int64)
    path = f"robot-{robot_id}-{name}.g2o"
    prev = getattr(_checkpoint_every_keyframe, "_thread", None)
    if prev is not None:
        prev.join()
    t = threading.Thread(
        target=g2o.save, args=(path, slam_state.graph),
        kwargs=dict(ids=ids, scans=slam_state.scans), daemon=True)
    _checkpoint_every_keyframe._thread = t
    t.start()


def _common_flags(p: argparse.ArgumentParser):
    p.add_argument("-o", default="out", help="output name stem")
    p.add_argument("--warm-start", action="store_true", dest="warm_start",
                   help="compile every bucket's step before the first "
                        "scan (keyframe latency never shares the "
                        "dispatch path with a background compile)")
    p.add_argument("--save-every-keyframe", action="store_true",
                   help="rewrite the .g2o checkpoint after every "
                        "keyframe (reference cadence, cg_mrslam.cpp:"
                        "228-230); off by default — the end-of-run "
                        "save is the cheap path")
    p.add_argument("--resolution", type=float, default=0.025,
                   help="close-matcher grid resolution [m]")
    p.add_argument("--maxScore", type=float, default=0.15)
    p.add_argument("--minInliers", type=int, default=7)
    p.add_argument("--windowLoopClosure", type=int, default=10)
    p.add_argument("--inlierThreshold", type=float, default=2.0)
    p.add_argument("--angularUpdate", type=float, default=math.pi / 4)
    p.add_argument("--linearUpdate", type=float, default=0.25)
    # simulation source (replaces ROS sensor topics)
    p.add_argument("--world-width", type=float, default=40.0)
    p.add_argument("--world-height", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beams", type=int, default=360)
    p.add_argument("--max-range", type=float, default=10.0)
    p.add_argument("--loops", type=int, default=2)
    p.add_argument("--ticks", type=int, default=0,
                   help="limit simulation ticks (0 = full route)")
    p.add_argument("--odom-noise", type=float, nargs=2,
                   default=(0.01, 0.004))
    p.add_argument("--max-vertices", type=int, default=512)
    p.add_argument("--max-edges", type=int, default=2048)
    # map parameters (reference cg_mrslam.cpp:109-117; infinity filling
    # is hardcoded ON at 5.0 in the reference's live runs, :134)
    p.add_argument("--map-resolution", type=float, default=0.05)
    p.add_argument("--occupied-threshold", type=float, default=0.65)
    p.add_argument("--free-threshold", type=float, default=0.196)
    p.add_argument("--map-gain", type=float, default=3.0)
    p.add_argument("--square-size", type=int, default=0)
    p.add_argument("--map-angle", type=float, default=0.0,
                   help="map base rotation [rad] (reference default pi/2)")
    p.add_argument("--usable-range", type=float, default=-1.0)
    p.add_argument("--infinity-filling-range", type=float, default=5.0)
    p.add_argument("--no-map", action="store_true")


def _build_config(a, n_robots: int = 1):
    from cg_mrslam_tpu.config import (Config, MapConfig, MatcherConfig,
                                      MRConfig, SlamConfig)

    return Config(
        slam=SlamConfig(
            linear_update=a.linearUpdate, angular_update=a.angularUpdate,
            min_inliers=a.minInliers,
            window_loop_closure=a.windowLoopClosure,
            inlier_threshold=a.inlierThreshold),
        mr=MRConfig(
            n_robots=n_robots,
            max_score_mr=getattr(a, "maxScoreMR", 0.15),
            min_inliers_mr=getattr(a, "minInliersMR", 5),
            window_mr_loop_closure=getattr(a, "windowMRLoopClosure", 10),
            sim_comm_range=getattr(a, "commRange", 5.0)),
        map=MapConfig(
            resolution=a.map_resolution,
            occupied_threshold=a.occupied_threshold,
            free_threshold=a.free_threshold,
            gain=a.map_gain, square_size=a.square_size,
            angle=a.map_angle, usable_range=a.usable_range,
            infinity_filling_range=a.infinity_filling_range),
        close_matcher=MatcherConfig(
            extent=30.0, resolution=a.resolution, kernel_radius=0.2,
            max_score=a.maxScore),
        lc_matcher=MatcherConfig(
            extent=70.0, resolution=0.1, kernel_radius=0.5,
            max_score=a.maxScore),
        max_vertices=a.max_vertices,
        max_edges=a.max_edges,
    )


def _save_outputs(name: str, slam_state, cfg, a, robot_id: int = 0):
    import jax.numpy as jnp
    from cg_mrslam_tpu.io import g2o
    from cg_mrslam_tpu.maps import occupancy as OCC

    # id namespacing as in the reference: runningId + robotId*baseId
    # (graph_slam.cpp:155)
    n = slam_state.graph.poses.shape[0]
    vo = np.asarray(slam_state.v_owner)
    vr = np.asarray(slam_state.v_remote)
    ids = (vr + vo * cfg.slam.base_id).astype(np.int64)
    path = f"robot-{robot_id}-{name}.g2o"
    g2o.save(path, slam_state.graph, ids=ids, scans=slam_state.scans)
    print(f"wrote {path}")

    if not a.no_map:
        mc = cfg.map
        poses_np = np.asarray(slam_state.graph.poses)[
            np.asarray(slam_state.graph.vmask)]
        if mc.angle != 0.0:  # bounding box of the rotated poses
            c, s = math.cos(mc.angle), math.sin(mc.angle)
            x, y = poses_np[:, 0].copy(), poses_np[:, 1].copy()
            poses_np = poses_np.copy()
            poses_np[:, 0] = c * x - s * y
            poses_np[:, 1] = s * x + c * y
        center = OCC.map_center(poses_np, pad=a.max_range)
        span = (poses_np[:, :2].max(0) - poses_np[:, :2].min(0)).max() \
            + 2 * a.max_range
        cells = int(np.ceil(span / mc.resolution / 128.0)) * 128
        grid = OCC.integrate(
            slam_state.graph.poses, slam_state.scans,
            jnp.asarray(center), cells=cells,
            resolution=mc.resolution, max_range=a.max_range,
            usable_range=mc.usable_range, gain=mc.gain,
            square_size=mc.square_size,
            infinity_filling_range=mc.infinity_filling_range,
            angle=mc.angle, robot_fill=mc.robot_fill)
        tri = np.asarray(OCC.threshold(
            grid, occupied_threshold=mc.occupied_threshold,
            free_threshold=mc.free_threshold))
        OCC.save_pgm_yaml(f"robot-{robot_id}-{name}-map", tri, center,
                          mc.resolution)
        print(f"wrote robot-{robot_id}-{name}-map.pgm/.yaml")


def cmd_srslam(argv):
    p = argparse.ArgumentParser(prog="srslam")
    _common_flags(p)
    p.add_argument("--load", default=None,
                   help="resume from a .g2o checkpoint")
    p.add_argument("--carmen", default=None,
                   help="replay a CARMEN .clf log instead of the "
                        "synthetic world (the bag-replay path, "
                        "README.md:77-93)")
    a = p.parse_args(argv)

    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
    from cg_mrslam_tpu.sim import world as W

    cfg = _build_config(a)
    if a.carmen:
        from cg_mrslam_tpu.io import carmen

        log = carmen.read(a.carmen, beams=a.beams,
                          max_range=a.max_range)
        # real-log geometry is explicit: true start angle + beam spacing,
        # the measured base→laser offset, and NOISY ODOMETRY as the
        # initial estimate (a log carries no ground truth)
        init_pose = log.odom[0]
        rel_seq = log.rel_odom()
        ranges_seq = log.ranges
        slam_kw = dict(
            fov=log.fov, max_range=log.max_range,
            laser_offset=tuple(log.laser_offset()),
            first_beam_angle=log.start_angle,
            angular_step=log.angular_step)
        beams = log.ranges.shape[1]
    else:
        world = W.hospital_world(a.world_width, a.world_height,
                                 seed=a.seed)
        wps = W.corridor_waypoints(a.world_width, a.world_height, 0,
                                   a.loops)
        fov = 2 * np.pi * 0.75
        traj = W.simulate_robot(world, wps, seed=a.seed + 1,
                                beams=a.beams, fov=fov,
                                max_range=a.max_range,
                                odom_noise=tuple(a.odom_noise))
        init_pose = traj.gt[0]
        rel_seq = traj.rel_odom
        ranges_seq = traj.ranges
        slam_kw = dict(fov=fov, max_range=a.max_range)
        beams = a.beams
    if a.load:
        slam = SingleRobotSlam.resume(cfg, a.load)
        print(f"resumed from {a.load}: "
              f"{int(slam.state.graph.n_vertices)} vertices")
    else:
        slam = SingleRobotSlam(cfg, beams, init_pose, ranges_seq[0],
                               warm_start=a.warm_start, **slam_kw)
    T = len(ranges_seq) if not a.ticks else min(a.ticks, len(ranges_seq))
    for t in range(1, T):
        if slam.observe(rel_seq[t - 1], ranges_seq[t]):
            i = slam.infos[-1]
            print(f"keyframe {int(slam.state.graph.n_vertices)-1}: "
                  f"sm={int(i.sm_accepted)} closures=+{int(i.closures_added)} "
                  f"chi2={float(i.chi2):.2f}")
            if a.save_every_keyframe:
                _checkpoint_every_keyframe(slam.state, cfg, a.o)
        if int(slam.state.graph.n_vertices) >= cfg.max_vertices - 2:
            print("vertex capacity reached; stopping")
            break
    _save_outputs(a.o, slam.state, cfg, a)
    import json
    summary = slam.metrics.summary()
    slam.metrics.to_jsonl(f"robot-0-{a.o}-metrics.jsonl")
    print("metrics:", json.dumps(summary))


def _run_udp_node(a):
    """One robot per process over UDP — the reference's deployment shape
    (``README.md:77-93``: N ``cg_mrslam`` processes, datagrams between
    them). All processes build the same seeded world, so trajectories
    agree without a shared simulator."""
    import time

    from cg_mrslam_tpu.mr.node import RobotNode
    from cg_mrslam_tpu.mr.transport import UdpTransport
    from cg_mrslam_tpu.sim import world as W

    r = a.idRobot
    cfg = _build_config(a, n_robots=a.nRobots)
    world = W.hospital_world(a.world_width, a.world_height, seed=a.seed)
    fov = 2 * np.pi * 0.75
    traj = W.simulate_robot(
        world, W.corridor_waypoints(a.world_width, a.world_height, r,
                                    a.loops),
        seed=a.seed + 7 * r, beams=a.beams, fov=fov,
        max_range=a.max_range, odom_noise=tuple(a.odom_noise))
    transport = UdpTransport(r, a.nRobots, base_addr=a.baseAddr,
                             base_port=a.basePort)
    node = RobotNode(cfg, r, a.beams, traj.gt[0], traj.ranges[0], fov,
                     a.max_range, transport, modality=a.modality,
                     gt_pose=traj.gt[0], warm_start=a.warm_start)
    if a.modality == "bag":
        if not a.pings:
            print("bag modality needs --pings", file=sys.stderr)
            return 2
        node.load_pings(a.pings)
    if a.record_msgs:
        node.record_messages(a.record_msgs)
    print(f"robot {r}/{a.nRobots} on "
          f"{transport.my_addr[0]}:{transport.my_addr[1]} "
          f"({'native' if transport.native else 'python'} transport, "
          f"modality {a.modality})")
    T = len(traj.gt) if not a.ticks else min(a.ticks, len(traj.gt))
    t_wall = time.time()
    for t in range(1, T):
        if a.tick_seconds > 0:
            lag = t_wall + t * a.tick_seconds - time.time()
            if lag > 0:
                time.sleep(lag)
        now = 0.1 * t  # 10 Hz main loop (cg_mrslam.cpp:206)
        if a.modality == "bag":
            node.bag_tick(now)
        kf = node.observe(traj.rel_odom[t - 1], traj.ranges[t],
                          gt_pose=traj.gt[t])
        node.comm_round(now)
        if kf:
            g = node.state.slam.graph
            print(f"t={t} keyframe {int(g.n_vertices) - 1} "
                  f"sent={node.stats['sent']} "
                  f"recv={node.stats['received']}")
            if a.save_every_keyframe:
                _checkpoint_every_keyframe(node.state.slam, cfg, a.o,
                                           robot_id=r)
        if int(node.state.slam.graph.n_vertices) >= cfg.max_vertices - 4:
            print("vertex capacity reached; stopping")
            break
    # drain the tail: peers may still be sending — and the condensed
    # exchange needs round trips (closure list → peer condenses → star
    # → splice), so keep the comm loop alive well past the last tick
    for k in range(60):
        node.comm_round(0.1 * T + 0.1 * k)
        time.sleep(0.25)
    print(f"done in {time.time() - t_wall:.1f}s; stats={node.stats}")
    if a.record_pings:
        node.save_pings(a.record_pings)
        print(f"wrote {a.record_pings}")
    if a.stats_json:
        import json

        import jax

        g = node.state.slam.graph
        out = dict(
            node.stats, robot=r, n_robots=a.nRobots,
            backend=jax.default_backend(),
            transport="native" if transport.native else "python",
            n_vertices=int(g.n_vertices), n_edges=int(g.n_edges),
            foreign_vertices=int(np.sum(
                np.asarray(g.vmask)
                & (np.asarray(node.state.slam.v_owner) != r))),
            inter_robot_accepted=int(
                np.asarray(node.state.out_closures).sum()),
            condensed_star_edges_in=int(np.sum(
                np.asarray(g.emask)
                & (np.asarray(g.e_level) > 0)
                & (np.asarray(g.e_owner) != r))),
            wall_s=round(time.time() - t_wall, 1))
        with open(a.stats_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {a.stats_json}")
    _save_outputs(a.o, node.state.slam, cfg, a, robot_id=r)
    node.close()
    return 0


def cmd_cg_mrslam(argv):
    p = argparse.ArgumentParser(prog="cg_mrslam")
    _common_flags(p)
    p.add_argument("--nRobots", type=int, default=2)
    p.add_argument("--maxScoreMR", type=float, default=0.15)
    p.add_argument("--minInliersMR", type=int, default=5)
    p.add_argument("--windowMRLoopClosure", type=int, default=10)
    p.add_argument("--modality", choices=("sim", "real", "bag"),
                   default="sim")
    p.add_argument("--commRange", type=float, default=5.0)
    # per-process deployment (the reference's shape: one cg_mrslam
    # process per robot, UDP between them — cg_mrslam.cpp + graph_comm)
    p.add_argument("--idRobot", type=int, default=-1,
                   help="run ONE robot in this process over UDP "
                        "(-1 = all robots in-process)")
    p.add_argument("--baseAddr", default="127.0.0.1",
                   help="peer base address; trailing '.' uses the "
                        "reference scheme baseAddr+(id+1) "
                        "(graph_comm.cpp:41-51)")
    p.add_argument("--basePort", type=int, default=42001)
    p.add_argument("--pings", default=None,
                   help="recorded ping log (JSONL) for bag modality")
    p.add_argument("--record-pings", default=None,
                   help="write received beacon log for later bag replay")
    p.add_argument("--record-msgs", default=None,
                   help="JSONL log of every sent/received SLAM message "
                        "(the reference's REAL-modality message "
                        "republishing, ros_handler.cpp:174-179)")
    p.add_argument("--stats-json", default=None,
                   help="write end-of-run node stats (keyframes, "
                        "closures, bytes, capacity counters) as JSON "
                        "— the committable multi-robot run artifact")
    p.add_argument("--tick-seconds", type=float, default=0.0,
                   help="pace the main loop to wall time: tick t runs "
                        "no earlier than start + t*X. Per-process "
                        "peers on heterogeneous backends otherwise "
                        "free-run at different speeds and their "
                        "simulated clocks diverge (the reference's 10 "
                        "Hz loop is real time, cg_mrslam.cpp:206)")
    a = p.parse_args(argv)

    if a.idRobot >= 0:
        return _run_udp_node(a)

    from cg_mrslam_tpu.mr.sim import MultiRobotSim
    from cg_mrslam_tpu.sim import world as W

    cfg = _build_config(a, n_robots=a.nRobots)
    world = W.hospital_world(a.world_width, a.world_height, seed=a.seed)
    sim = MultiRobotSim(cfg, world, beams=a.beams,
                        max_range=a.max_range, seed=a.seed,
                        n_loops=a.loops, odom_noise=tuple(a.odom_noise),
                        width=a.world_width, height=a.world_height)
    if a.modality == "bag":
        if not a.pings:
            print("bag modality needs --pings", file=sys.stderr)
            return 2
        import json

        from cg_mrslam_tpu.mr.network import PingLog
        pl = PingLog(a.nRobots)
        with open(a.pings) as f:
            for line in f:
                e = json.loads(line)
                pl.record(e["t"], e["hearer"], e["sender"])
        sim.ping_log = pl
    sim.run(max_ticks=a.ticks or None, modality=a.modality)
    for r in range(a.nRobots):
        st = sim.states[r]
        print(f"robot {r}: vertices={int(st.slam.graph.n_vertices)} "
              f"closures={int(sim.closure_stats[r])} "
              f"inter-robot accepted={int(np.asarray(st.out_closures).sum())}")
        _save_outputs(a.o, st.slam, cfg, a, robot_id=r)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m cg_mrslam_tpu {srslam|cg_mrslam} [flags]\n"
              "  srslam     single-robot SLAM on the synthetic world\n"
              "  cg_mrslam  multi-robot condensed-graph SLAM")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "srslam":
        cmd_srslam(rest)
    elif cmd == "cg_mrslam":
        cmd_cg_mrslam(rest)
    else:
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
