"""Binary wire codec for inter-robot messages.

TPU-native replacement for the reference's hand-rolled serialization
(``/root/reference/src/mrslam/msg_factory.h:45-115``): type-tagged
header (int type + int robotId), doubles transmitted as float32
(``msg_factory.h:78-112``), 100 000-byte datagram bound
(``msg_factory.h:115``). Message type tags keep the reference's values
(ComboMessage=4, ClosuresMessage=6, CondensedGraphMessage=7,
GraphMessage=8 — ``msg_factory.h:141-271``).

Messages are fixed-shape array pytrees (``mr.mrslam``), so a codec is a
flat concatenation with a small header — one ``np.tobytes`` per send, one
``np.frombuffer`` per receive. Used by the multi-host transport and by
the REAL-modality logging path; the single-process sim passes pytrees
directly.
"""

from __future__ import annotations

import struct
from typing import Tuple, Union

import numpy as np

from typing import NamedTuple

from cg_mrslam_tpu.mr.mrslam import (ClosureList, Combo, EdgeArray,
                                     GraphMsg, RobotLaser, StarMsg,
                                     VertexArray)

MAX_DATAGRAM = 100_000           # msg_factory.h:115
TYPE_PING = 0                    # comm_publisher beacon ("I am robot N",
#                                  comm_publisher.cpp:50-82) — not in the
#                                  reference's MessageFactory registry
TYPE_VERTEX_ARRAY = 1            # msg_factory.h:141-271 tag values
TYPE_ROBOT_LASER = 2
TYPE_COMBO = 4
TYPE_EDGE_ARRAY = 5
TYPE_CLOSURES = 6
TYPE_CONDENSED = 7
TYPE_GRAPH = 8


class Ping(NamedTuple):
    """Connectivity beacon. The reference's comm_publisher broadcasts a
    bare robot id; ours additionally carries the sender's current
    position so SIM-modality range gating works across process
    boundaries (the reference gets peer positions from per-robot ROS
    ground-truth topics instead, ros_handler.cpp:145-153)."""

    robot: int
    x: float
    y: float

_HDR = struct.Struct("<iii")     # type, robotId, payload float32 count


def _pack(msg_type: int, robot: int, *arrays: np.ndarray) -> bytes:
    flat = np.concatenate(
        [np.asarray(a, np.float32).reshape(-1) for a in arrays])
    out = _HDR.pack(msg_type, robot, flat.size) + flat.tobytes()
    if len(out) > MAX_DATAGRAM:
        raise ValueError(
            f"message {len(out)} B exceeds datagram bound {MAX_DATAGRAM}")
    return out


def _unpack(buf: bytes) -> Tuple[int, int, np.ndarray]:
    t, robot, count = _HDR.unpack_from(buf, 0)
    flat = np.frombuffer(buf, np.float32, count, _HDR.size)
    return t, robot, flat


def encode(msg: Union[Combo, ClosureList, StarMsg, GraphMsg, Ping],
           robot: int = -1) -> bytes:
    """Serialize one message (float32 wire, like the reference)."""
    if isinstance(msg, Ping):
        return _pack(TYPE_PING, int(msg.robot),
                     np.asarray([msg.x, msg.y], np.float32))
    if isinstance(msg, GraphMsg):
        v = np.asarray(msg.poses).shape[0]
        return _pack(TYPE_GRAPH, int(msg.robot),
                     np.asarray([v], np.float32),
                     np.asarray(msg.poses), np.asarray(msg.idxs),
                     np.asarray(msg.vvalid), np.asarray(msg.e_ij),
                     np.asarray(msg.e_z), np.asarray(msg.e_info),
                     np.asarray(msg.evalid))
    if isinstance(msg, Combo):
        c = np.asarray(msg.poses).shape[0]
        b = np.asarray(msg.ranges).shape[0]
        hdr = np.asarray([c, b, float(msg.first_beam_angle),
                          float(msg.angular_step), float(msg.max_range)],
                         np.float32)
        return _pack(TYPE_COMBO, int(msg.robot), hdr,
                     np.asarray(msg.poses), np.asarray(msg.idxs),
                     np.asarray(msg.valid), np.asarray(msg.ranges))
    if isinstance(msg, VertexArray):
        c = np.asarray(msg.poses).shape[0]
        return _pack(TYPE_VERTEX_ARRAY, int(msg.robot),
                     np.asarray([c], np.float32),
                     np.asarray(msg.poses), np.asarray(msg.idxs),
                     np.asarray(msg.valid))
    if isinstance(msg, RobotLaser):
        return _pack(TYPE_ROBOT_LASER, int(msg.robot),
                     np.asarray([float(msg.node_id),
                                 float(msg.first_beam_angle),
                                 float(msg.angular_step),
                                 float(msg.max_range),
                                 float(msg.accuracy)], np.float32),
                     np.asarray(msg.ranges))
    if isinstance(msg, EdgeArray):
        e = np.asarray(msg.ids).shape[0]
        return _pack(TYPE_EDGE_ARRAY, int(msg.robot),
                     np.asarray([e], np.float32),
                     np.asarray(msg.ids), np.asarray(msg.z),
                     np.asarray(msg.info), np.asarray(msg.valid))
    if isinstance(msg, ClosureList):
        return _pack(TYPE_CLOSURES, robot,
                     np.asarray(msg.idxs), np.asarray(msg.valid))
    if isinstance(msg, StarMsg):
        return _pack(TYPE_CONDENSED, robot,
                     np.asarray(msg.gauge)[None], np.asarray(msg.boundary),
                     np.asarray(msg.z), np.asarray(msg.info),
                     np.asarray(msg.valid))
    raise TypeError(type(msg))


def decode(buf: bytes, beams: int | None = None
           ) -> Tuple[int, Union[Combo, ClosureList, StarMsg]]:
    """Deserialize; returns (sender robot id, message). ``beams`` is
    accepted for back-compat but unused: every scan-carrying message is
    self-describing (beam count + geometry ride the payload, like the
    reference's RobotLaserMessage laser params, msg_factory.h:162-181) —
    peers with different lasers decode correctly and the receiver
    resamples (``core.scan.resample_scan_np``)."""
    import jax.numpy as jnp

    t, robot, flat = _unpack(buf)
    if t == TYPE_PING:
        return robot, Ping(robot=robot, x=float(flat[0]), y=float(flat[1]))
    if t == TYPE_GRAPH:
        v = int(flat[0])
        o = 1
        poses = flat[o:o + 3 * v].reshape(v, 3)
        o += 3 * v
        idxs = flat[o:o + v].astype(np.int32)
        o += v
        vvalid = flat[o:o + v] > 0.5
        o += v
        e = (flat.size - o) // 12  # e_ij 2E + e_z 3E + e_info 6E + valid E
        e_ij = flat[o:o + 2 * e].reshape(e, 2).astype(np.int32)
        o += 2 * e
        e_z = flat[o:o + 3 * e].reshape(e, 3)
        o += 3 * e
        e_info = flat[o:o + 6 * e].reshape(e, 6)
        o += 6 * e
        evalid = flat[o:o + e] > 0.5
        return robot, GraphMsg(
            robot=jnp.asarray(robot, jnp.int32),
            poses=jnp.asarray(poses), idxs=jnp.asarray(idxs),
            vvalid=jnp.asarray(vvalid), e_ij=jnp.asarray(e_ij),
            e_z=jnp.asarray(e_z), e_info=jnp.asarray(e_info),
            evalid=jnp.asarray(evalid))
    if t == TYPE_COMBO:
        # self-describing: header [C, B, fba, step, maxr] (beam geometry
        # ships per message like the reference's RobotLaserMessage params)
        c, b = int(flat[0]), int(flat[1])
        fba, step, maxr = float(flat[2]), float(flat[3]), float(flat[4])
        o = 5
        poses = flat[o:o + 3 * c].reshape(c, 3)
        o += 3 * c
        idxs = flat[o:o + c].astype(np.int32)
        o += c
        valid = flat[o:o + c] > 0.5
        o += c
        ranges = flat[o:o + b]
        return robot, Combo(robot=jnp.asarray(robot, jnp.int32),
                            poses=jnp.asarray(poses),
                            idxs=jnp.asarray(idxs),
                            valid=jnp.asarray(valid),
                            ranges=jnp.asarray(ranges),
                            first_beam_angle=jnp.float32(fba),
                            angular_step=jnp.float32(step),
                            max_range=jnp.float32(maxr))
    if t == TYPE_VERTEX_ARRAY:
        c = int(flat[0])
        o = 1
        poses = flat[o:o + 3 * c].reshape(c, 3)
        o += 3 * c
        idxs = flat[o:o + c].astype(np.int32)
        o += c
        valid = flat[o:o + c] > 0.5
        return robot, VertexArray(robot=jnp.asarray(robot, jnp.int32),
                                  poses=jnp.asarray(poses),
                                  idxs=jnp.asarray(idxs),
                                  valid=jnp.asarray(valid))
    if t == TYPE_ROBOT_LASER:
        node_id = int(flat[0])
        return robot, RobotLaser(robot=jnp.asarray(robot, jnp.int32),
                                 node_id=jnp.asarray(node_id, jnp.int32),
                                 ranges=jnp.asarray(flat[5:]),
                                 first_beam_angle=jnp.float32(flat[1]),
                                 angular_step=jnp.float32(flat[2]),
                                 max_range=jnp.float32(flat[3]),
                                 accuracy=jnp.float32(flat[4]))
    if t == TYPE_EDGE_ARRAY:
        e = int(flat[0])
        o = 1
        ids = flat[o:o + 2 * e].reshape(e, 2).astype(np.int32)
        o += 2 * e
        z = flat[o:o + 3 * e].reshape(e, 3)
        o += 3 * e
        info = flat[o:o + 6 * e].reshape(e, 6)
        o += 6 * e
        valid = flat[o:o + e] > 0.5
        return robot, EdgeArray(robot=jnp.asarray(robot, jnp.int32),
                                ids=jnp.asarray(ids), z=jnp.asarray(z),
                                info=jnp.asarray(info),
                                valid=jnp.asarray(valid))
    if t == TYPE_CLOSURES:
        half = flat.size // 2
        return robot, ClosureList(
            idxs=jnp.asarray(flat[:half].astype(np.int32)),
            valid=jnp.asarray(flat[half:] > 0.5))
    if t == TYPE_CONDENSED:
        k = (flat.size - 1) // 11  # gauge 1 + K(1 + 3 + 6 + 1)
        gauge = flat[0].astype(np.int32)
        o = 1
        boundary = flat[o:o + k].astype(np.int32)
        o += k
        z = flat[o:o + 3 * k].reshape(k, 3)
        o += 3 * k
        info = flat[o:o + 6 * k].reshape(k, 6)
        o += 6 * k
        valid = flat[o:o + k] > 0.5
        return robot, StarMsg(gauge=jnp.asarray(gauge),
                              boundary=jnp.asarray(boundary),
                              z=jnp.asarray(z), info=jnp.asarray(info),
                              valid=jnp.asarray(valid))
    raise ValueError(f"unknown message type {t}")
