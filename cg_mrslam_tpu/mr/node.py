"""Per-process robot node: one robot's SLAM state + a real transport.

This is the deployment shape of the reference — one ``cg_mrslam`` process
per robot exchanging UDP datagrams (``/root/reference/src/cg_mrslam.cpp``
+ ``src/mrslam/graph_comm.cpp``) — rebuilt around the framework's
functional state: the node owns an ``MRState``, runs the fused keyframe
step on observations, and runs a communication round per tick that mirrors
the reference's sender/receiver/processor threads
(``graph_comm.cpp:126-208``) synchronously:

1. broadcast a connectivity beacon (the ``comm_publisher`` role,
   ``comm_publisher.cpp:50-82``);
2. drain the inbox and apply each message (combo → instantiate + match,
   closure list → stage my condensed star, star → splice —
   ``mr_graph_slam.cpp:118-501``);
3. retry parked foreign vertices + run the per-peer closure vote
   (``findInterRobotConstraints`` / ``checkInterRobotClosures``);
4. send combo + per-peer closure lists and staged stars to every peer
   currently in range (modality gating of ``robotsInRange``,
   ``graph_comm.cpp:70-101``).

Everything is fire-and-forget and idempotent (stars replace wholesale),
so loss, duplication and reorder are tolerated exactly as in the
reference.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.config import Config
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.mr import wire
from cg_mrslam_tpu.mr.transport import UdpTransport
from cg_mrslam_tpu.pipeline.slam import BucketRunner


class RobotNode:
    """One robot's process-local endpoint."""

    def __init__(self, cfg: Config, robot_id: int, beams: int,
                 initial_pose, ranges, fov: float, max_range: float,
                 transport: UdpTransport, modality: str = "real",
                 gt_pose=None, warm_start: bool = False):
        self.cfg = cfg
        self.id = robot_id
        self.R = cfg.mr.n_robots
        self.beams = beams
        self.modality = modality
        self.transport = transport
        self.state = MR.init_mr_state(cfg, beams, initial_pose, ranges,
                                      fov, max_range, my_id=robot_id)
        self._est = np.asarray(initial_pose, np.float64).copy()
        self._kf_est = self._est.copy()
        self._gt = np.asarray(
            gt_pose if gt_pose is not None else initial_pose,
            np.float64).copy()
        # connectivity bookkeeping from received beacons
        self._ping_time = np.full(self.R, -np.inf)
        self._peer_pos = np.full((self.R, 2), np.inf)
        self._last_combo_sent = -1  # n_vertices at last combo broadcast
        self._last_send_t = -np.inf  # sender-thread cadence bookkeeping
        # closure-list rotation offsets (cover an overflowing accepted
        # set across sends — see MR.build_closure_list) and the
        # unchanged-send cache: between keyframes/receives nothing a
        # list/star depends on changes, so the encoded datagrams are
        # reused instead of re-dispatching build_closure_list/build_star
        # device programs per peer per 150 ms round (round-4 weak spot:
        # those dispatches dominated idle-phase wall time through the
        # tunnel).
        self._list_off = np.zeros(self.R, np.int64)
        self._send_cache: dict = {}
        self.ping_events: List[Tuple[float, int, int]] = []  # (t, me, src)
        self.stats = {"sent": 0, "received": 0, "keyframes": 0,
                      "decode_errors": 0, "closure_list_dropped": 0,
                      "star_dropped": 0, "keyframes_capacity_stopped": 0,
                      # datagram byte counters (the reference logs comm
                      # bytes at graph_comm.cpp:117,164); pings included
                      "bytes_sent": 0, "bytes_received": 0}
        self.infos = []
        # bucketed stepping + AOT prewarm, same engine as SingleRobotSlam
        # (round-2 verdict: the deployment path paid full-capacity latency
        # on every keyframe). Exchange rounds can grow the graph outside
        # observe(), so live counts re-sync from the graph before each step.
        self.runner = BucketRunner(cfg)
        if warm_start:
            self.runner.prewarm_all(self.state)

    # ---------------------------------------------------------- sensing

    def dead_reckon(self, rel_odom) -> None:
        e = self._est
        c, s = np.cos(e[2]), np.sin(e[2])
        self._est = np.array([
            e[0] + c * rel_odom[0] - s * rel_odom[1],
            e[1] + s * rel_odom[0] + c * rel_odom[1],
            (e[2] + rel_odom[2] + np.pi) % (2 * np.pi) - np.pi])

    def keyframe_due(self) -> bool:
        d = np.hypot(*(self._est[:2] - self._kf_est[:2]))
        dth = abs((self._est[2] - self._kf_est[2] + np.pi)
                  % (2 * np.pi) - np.pi)
        return (d > self.cfg.slam.linear_update
                or dth > self.cfg.slam.angular_update)

    def observe(self, rel_odom, ranges, gt_pose=None) -> bool:
        """Dead-reckon; on keyframe run the fused SLAM step. Returns
        whether a keyframe was added (``cg_mrslam.cpp:206-259`` loop)."""
        self.dead_reckon(rel_odom)
        if gt_pose is not None:
            self._gt = np.asarray(gt_pose, np.float64).copy()
        if not self.keyframe_due():
            return False
        if int(self.state.slam.graph.n_vertices) >= self.cfg.max_vertices - 4:
            # capacity binds: count it (no silent caps) — the run keeps
            # dead-reckoning but adds no more keyframes, like the
            # reference simply growing without bound until OOM wouldn't
            self.stats["keyframes_capacity_stopped"] += 1
            return False
        st = self.state
        # exchange rounds add vertices/edges outside observe(): re-sync
        # the runner's live mirrors from the device counts
        self.runner.n_live = int(st.slam.graph.n_vertices)
        self.runner.e_live = int(st.slam.graph.n_edges)
        slam, info = self.runner.step(
            st.slam, np.asarray(self._est, np.float32),
            np.asarray(ranges, np.float32))
        self.state = MR.MRState(
            slam=slam, parked=st.parked, park_age=st.park_age,
            peer_buf=st.peer_buf, in_closures=st.in_closures,
            out_closures=st.out_closures)
        # per-keyframe inter-robot pass (findInterRobotConstraints,
        # cg_mrslam.cpp:223): retry a parked foreign vertex, then run the
        # per-peer windowed vote — the MR window ages per KEYFRAME
        self.state = MR.try_match_parked(self.state, self.cfg)
        self.state = MR.vote_inter_robot(self.state, self.cfg)
        self._est = np.asarray(info.pose, np.float64)
        self._kf_est = self._est.copy()
        self.stats["keyframes"] += 1
        self.infos.append(info)
        return True

    # ----------------------------------------------------- connectivity

    def connected(self, peer: int, t: float) -> bool:
        """modality gate of ``robotsInRange`` (graph_comm.cpp:70-101)."""
        if peer == self.id:
            return False
        if self.modality == "real":
            return True   # the radio decides (:74-78)
        if self.modality == "bag":
            return (t - self._ping_time[peer]
                    ) < self.cfg.mr.ping_timeout  # (:88-98)
        # sim: ground-truth distance < range (:79-87); peer position
        # arrives on the beacon instead of a ROS ground-truth topic
        if not np.isfinite(self._peer_pos[peer]).all():
            return False
        return bool(np.hypot(*(self._gt[:2] - self._peer_pos[peer]))
                    < self.cfg.mr.sim_comm_range)

    # ----------------------------------------------------------- comms

    def _to_my_geometry(self, combo: "MR.Combo") -> "MR.Combo":
        """Resample a peer's scan onto MY beam grid when geometries
        differ (heterogeneous lasers; the reference ships laser params
        per message for the same reason)."""
        s = self.state.slam.scans
        b = s.ranges.shape[1]
        same = (np.asarray(combo.ranges).shape[0] == b
                and abs(float(combo.first_beam_angle)
                        - float(s.first_beam_angle)) < 1e-6
                and abs(float(combo.angular_step)
                        - float(s.angular_step)) < 1e-9
                and abs(float(combo.max_range) - float(s.max_range)) < 1e-6)
        if same:
            return combo
        from cg_mrslam_tpu.core.scan import resample_scan_np

        r = resample_scan_np(
            np.asarray(combo.ranges), float(combo.first_beam_angle),
            float(combo.angular_step), float(combo.max_range), b,
            float(s.first_beam_angle), float(s.angular_step),
            float(s.max_range))
        return combo._replace(ranges=jnp.asarray(r),
                              first_beam_angle=s.first_beam_angle,
                              angular_step=s.angular_step,
                              max_range=s.max_range)

    def _apply(self, sender: int, msg) -> None:
        live = jnp.asarray(True)
        if isinstance(msg, MR.Combo):
            self.state = MR.receive_combo(
                self.state, self._to_my_geometry(msg), live)
        elif isinstance(msg, MR.ClosureList):
            self.state = MR.receive_closure_list(
                self.state, jnp.asarray(sender, jnp.int32), msg, live)
        elif isinstance(msg, MR.StarMsg):
            self.state = MR.receive_star(
                self.state, jnp.asarray(sender, jnp.int32), msg, live)
        elif isinstance(msg, MR.GraphMsg):
            self.state = MR.receive_graph_msg(self.state, msg, live)

    def comm_round(self, t: float) -> None:
        """One synchronous pass of the reference's three comm threads.

        Receiving/processing runs every call (the reference's receiver
        thread blocks on the socket continuously); beacon + data sends
        are gated to the sender-thread cadence ``send_period``
        (150 ms default, ``graph_comm.cpp:152``)."""
        send_due = (t - self._last_send_t) >= self.cfg.mr.send_period
        if send_due:
            self._last_send_t = t
            # 1. beacon (comm_publisher.cpp:50-82; carries my position
            #    for cross-process SIM gating)
            ping = wire.encode(wire.Ping(self.id, float(self._gt[0]),
                                         float(self._gt[1])))
            for peer in range(self.R):
                if peer != self.id:
                    self.transport.send(peer, ping)
                    self.stats["bytes_sent"] += len(ping)
                    self._log_msg("sent", peer, ping, t)

        # 2. drain + process (receiveFromThrd/processQueueThrd)
        for buf in self.transport.drain():
            self.stats["bytes_received"] += len(buf)
            try:
                sender, msg = wire.decode(buf, beams=self.beams)
            except (ValueError, IndexError):
                self.stats["decode_errors"] += 1
                continue
            self._log_msg("recv", int(sender), buf, t)
            if isinstance(msg, wire.Ping):
                self._ping_time[msg.robot] = t
                self._peer_pos[msg.robot] = (msg.x, msg.y)
                self.ping_events.append((t, self.id, msg.robot))
                continue
            self.stats["received"] += 1
            self._apply(sender, msg)

        # 3. retry a parked vertex between keyframes too (the reference's
        #    processor thread handles inbound combos continuously; the
        #    vote itself runs per keyframe in observe())
        self.state = MR.try_match_parked(self.state, self.cfg)

        # 4. gated sends (sendToThrd, graph_comm.cpp:126-154)
        if not send_due:
            return
        peers = [p for p in range(self.R) if self.connected(p, t)]
        if not peers:
            return
        n_now = int(self.state.slam.graph.n_vertices)
        combo = wire.encode(MR.build_combo(self.state)) \
            if n_now != self._last_combo_sent else None
        cap = self.cfg.mr.closure_list_cap
        for p in peers:
            if combo is not None:
                self.transport.send(p, combo)
                self._log_msg("sent", p, combo, t)
                self.stats["sent"] += 1
                self.stats["bytes_sent"] += len(combo)
            # unchanged-send skip: list/star content depends only on the
            # vote (keyframes), applied messages (received) and the
            # rotation offset — same signature, same datagrams
            sig = (self.stats["keyframes"], self.stats["received"],
                   int(self._list_off[p]))
            cached = self._send_cache.get(p)
            if cached is not None and cached[0] == sig:
                _, buf_cl, cl_dropped, buf_star, star_dropped = cached
            else:
                cl = MR.build_closure_list(
                    self.state, jnp.asarray(p, jnp.int32), cap=cap,
                    off=jnp.asarray(self._list_off[p], jnp.int32))
                cl_dropped = int(np.asarray(cl.dropped))
                buf_cl = (wire.encode(cl, robot=self.id)
                          if bool(np.asarray(cl.valid).any()) else None)
                star = MR.build_star(
                    self.state, jnp.asarray(p, jnp.int32),
                    cap=self.cfg.mr.star_edges_cap)
                star_dropped = int(np.asarray(star.dropped))
                buf_star = (wire.encode(star, robot=self.id)
                            if bool(np.asarray(star.valid).any()) else None)
                self._send_cache[p] = (sig, buf_cl, cl_dropped, buf_star,
                                       star_dropped)
            self.stats["closure_list_dropped"] += cl_dropped
            self.stats["star_dropped"] += star_dropped
            if buf_cl is not None:
                self.transport.send(p, buf_cl)
                self._log_msg("sent", p, buf_cl, t)
                self.stats["sent"] += 1
                self.stats["bytes_sent"] += len(buf_cl)
            if buf_star is not None:
                self.transport.send(p, buf_star)
                self._log_msg("sent", p, buf_star, t)
                self.stats["sent"] += 1
                self.stats["bytes_sent"] += len(buf_star)
            if cl_dropped > 0:
                # rotate so the NEXT send covers the next cap-window of
                # the accepted set (n_sel = dropped + cap)
                self._list_off[p] = ((self._list_off[p] + cap)
                                     % (cl_dropped + cap))
        if combo is not None:
            self._last_combo_sent = n_now

    # ------------------------------------------------- message logging

    def record_messages(self, path: str) -> None:
        """REAL-modality offline log of every sent/received SLAM message
        (the reference republishes them as ``msg/SLAM.msg`` ROS topics
        for later bag analysis, ``ros_handler.cpp:174-179,241-264``;
        here: one JSONL line per datagram with direction, wire type,
        peer, and payload size — plus the raw payload hex for exact
        replay)."""
        self._msg_log = open(path, "a")

    def _log_msg(self, direction: str, peer: int, buf: bytes,
                 t: float) -> None:
        log = getattr(self, "_msg_log", None)
        if log is None:
            return
        mtype = wire._HDR.unpack_from(buf, 0)[0] if len(buf) >= 12 else -1
        log.write(json.dumps({
            "t": t, "dir": direction, "me": self.id, "peer": peer,
            "type": mtype, "bytes": len(buf), "payload": buf.hex(),
        }) + "\n")

    # ------------------------------------------------------- ping logs

    def save_pings(self, path: str) -> None:
        """Record received beacons for later BAG-modality replay (the
        reference's REAL runs publish Ping messages into the bag,
        ros_handler.cpp:241-264)."""
        with open(path, "w") as f:
            for (t, hearer, sender) in self.ping_events:
                f.write(json.dumps(
                    {"t": t, "hearer": hearer, "sender": sender}) + "\n")

    def load_pings(self, path: str) -> None:
        """Pre-load a recorded ping log for BAG gating: connectivity at
        time t is decided by the recorded ping ages, not live beacons."""
        self._bag_events = []
        with open(path) as f:
            for line in f:
                e = json.loads(line)
                if e["hearer"] == self.id:
                    self._bag_events.append((e["t"], e["sender"]))

    def bag_tick(self, t: float) -> None:
        """Advance replayed ping ages up to time ``t``."""
        for (ts, sender) in getattr(self, "_bag_events", []):
            if ts <= t:
                self._ping_time[sender] = max(self._ping_time[sender], ts)

    def close(self) -> None:
        log = getattr(self, "_msg_log", None)
        if log is not None:
            log.close()
        self.transport.close()
