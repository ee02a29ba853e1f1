"""``.g2o`` text format reader/writer (VERTEX_SE2 / EDGE_SE2 / FIX /
ROBOTLASER1), host-side numpy.

Replaces the reference's g2o ``save``/``load`` usage
(``/root/reference/src/slam/graph_slam.cpp:620-628`` saves after every
keyframe; ROBOTLASER1 userData lines follow each vertex). Needed for
checkpoint/resume and for parity testing on externally produced graphs.

g2o ids may be sparse/namespaced (``id = runningId + idRobot*baseId``,
``graph_slam.cpp:155``); they are kept in a side ``ids`` array while graph
slots stay dense.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core import scan as S


@dataclasses.dataclass
class LoadedGraph:
    graph: G.PoseGraph
    ids: np.ndarray                # [N] int64 original g2o vertex ids (-1 unused)
    scans: Optional[S.ScanSet]     # aligned with graph slots, or None
    laser_meta: Dict               # raw ROBOTLASER1 trailing fields per slot
    has_edge_meta: bool = False    # CGM_EDGE_META provenance lines present


def _parse_robotlaser(tok: List[str]):
    """Parse a ROBOTLASER1 payload (g2o robot_laser.cpp field order)."""
    k = 0
    def take(n):
        nonlocal k
        out = tok[k : k + n]
        k += n
        return out

    (ltype, first_beam, fov, ang_step, max_range, accuracy, remission) = take(7)
    nbeams = int(take(1)[0])
    ranges = np.array([float(x) for x in take(nbeams)], np.float32)
    nrem = int(take(1)[0])
    take(nrem)
    laser_pose = np.array([float(x) for x in take(3)])
    odom_pose = np.array([float(x) for x in take(3)])
    trailing = tok[k:]
    return dict(
        type=int(float(ltype)),
        first_beam_angle=float(first_beam),
        fov=float(fov),
        angular_step=float(ang_step),
        max_range=float(max_range),
        accuracy=float(accuracy),
        remission_mode=int(float(remission)),
        ranges=ranges,
        laser_pose=laser_pose,
        odom_pose=odom_pose,
        trailing=trailing,
    )


def _read_edge_meta(path: str) -> Dict[int, Tuple[int, int]]:
    """Collect ``# CGM_EDGE_META <ordinal> <owner> <level>`` comment
    lines (written by :func:`save`; ordinal = position among EDGE_SE2
    lines in file order). External .g2o files simply have none."""
    meta: Dict[int, Tuple[int, int]] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("# CGM_EDGE_META"):
                tok = line.split()
                meta[int(tok[2])] = (int(tok[3]), int(tok[4]))
    return meta


def _apply_edge_meta(loaded: "LoadedGraph", path: str) -> "LoadedGraph":
    meta = _read_edge_meta(path)
    if not meta:
        return loaded
    g = loaded.graph
    e_owner = np.asarray(g.e_owner).copy()
    e_level = np.asarray(g.e_level).copy()
    for ordinal, (owner, level) in meta.items():
        e_owner[ordinal] = owner
        e_level[ordinal] = level
    g = dataclasses.replace(g, e_owner=jnp.asarray(e_owner, jnp.int32),
                            e_level=jnp.asarray(e_level, jnp.int32))
    return dataclasses.replace(loaded, graph=g, has_edge_meta=True)


def load(path: str, max_vertices: int | None = None,
         max_edges: int | None = None, beams: int | None = None,
         dtype=jnp.float32, native: bool = True) -> LoadedGraph:
    if native:
        from cg_mrslam_tpu import native as N

        parsed = N.parse_g2o(path)
        if parsed is not None:
            return _apply_edge_meta(
                _from_native(parsed, max_vertices, max_edges, beams,
                             dtype), path)
    vertices: List[Tuple[int, np.ndarray]] = []
    fixed_ids = set()
    edges = []
    lasers: Dict[int, dict] = {}
    last_vid = None

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            tag = tok[0]
            if tag == "VERTEX_SE2":
                vid = int(tok[1])
                vertices.append((vid, np.array([float(x) for x in tok[2:5]])))
                last_vid = vid
            elif tag == "FIX":
                fixed_ids.update(int(t) for t in tok[1:])
            elif tag == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                z = np.array([float(x) for x in tok[3:6]])
                info6 = np.array([float(x) for x in tok[6:12]])
                edges.append((i, j, z, info6))
            elif tag == "ROBOTLASER1" and last_vid is not None:
                lasers[last_vid] = _parse_robotlaser(tok[1:])

    n, e = len(vertices), len(edges)
    cap_v = max_vertices or n
    cap_e = max_edges or max(e, 1)
    if n > cap_v or e > cap_e:
        raise ValueError(f"graph ({n} v, {e} e) exceeds capacity ({cap_v}, {cap_e})")

    id2slot = {vid: k for k, (vid, _) in enumerate(vertices)}
    ids = np.full((cap_v,), -1, np.int64)
    poses = np.zeros((cap_v, 3), np.float64)
    vmask = np.zeros((cap_v,), bool)
    fix = np.zeros((cap_v,), bool)
    for k, (vid, p) in enumerate(vertices):
        ids[k] = vid
        poses[k] = p
        vmask[k] = True
        fix[k] = vid in fixed_ids
    if n and not fix.any():
        fix[0] = True  # g2o requires a gauge; reference fixes the first pose

    e_ij = np.zeros((cap_e, 2), np.int32)
    e_z = np.zeros((cap_e, 3), np.float64)
    e_info = np.zeros((cap_e, 6), np.float64)
    emask = np.zeros((cap_e,), bool)
    for k, (i, j, z, info6) in enumerate(edges):
        e_ij[k] = (id2slot[i], id2slot[j])
        e_z[k] = z
        e_info[k] = info6
        emask[k] = True

    g = G.PoseGraph(
        poses=jnp.asarray(poses, dtype),
        vmask=jnp.asarray(vmask),
        fixed=jnp.asarray(fix),
        e_ij=jnp.asarray(e_ij),
        e_z=jnp.asarray(e_z, dtype),
        e_info=jnp.asarray(e_info, dtype),
        emask=jnp.asarray(emask),
        e_level=jnp.zeros((cap_e,), jnp.int32),
        e_owner=jnp.zeros((cap_e,), jnp.int32),
        n_vertices=jnp.asarray(n, jnp.int32),
        n_edges=jnp.asarray(e, jnp.int32),
    )

    scans = None
    laser_meta: Dict = {}
    if lasers:
        any_l = next(iter(lasers.values()))
        b = beams or max(len(l["ranges"]) for l in lasers.values())
        scans = S.empty(
            cap_v, b,
            first_beam_angle=any_l["first_beam_angle"],
            angular_step=any_l["angular_step"],
            max_range=any_l["max_range"],
            fov=any_l["fov"],
        )
        ranges = np.asarray(scans.ranges).copy()
        smask = np.zeros((cap_v,), bool)
        for vid, l in lasers.items():
            slot = id2slot[vid]
            r = l["ranges"][:b]
            ranges[slot, : len(r)] = r
            smask[slot] = True
            laser_meta[slot] = l
        # base→laser offset from the first scan: offset = odom⁻¹ ∘ laserPose
        lp, op = any_l["laser_pose"], any_l["odom_pose"]
        from cg_mrslam_tpu.utils import se2
        off = se2.relative(jnp.asarray(op, jnp.float32), jnp.asarray(lp, jnp.float32))
        scans = dataclasses.replace(
            scans, ranges=jnp.asarray(ranges), smask=jnp.asarray(smask),
            laser_offset=off,
        )

    return _apply_edge_meta(
        LoadedGraph(graph=g, ids=ids, scans=scans, laser_meta=laser_meta),
        path)


def _from_native(p: dict, max_vertices, max_edges, beams,
                 dtype) -> LoadedGraph:
    """Assemble a LoadedGraph from the C++ parser's arrays (one pass of
    vectorized numpy instead of per-line Python; see
    ``cg_mrslam_tpu/native/g2o_parser.cpp``)."""
    n = p["v_ids"].shape[0]
    e = p["e_ids"].shape[0]
    cap_v = max_vertices or n
    cap_e = max_edges or max(e, 1)
    if n > cap_v or e > cap_e:
        raise ValueError(
            f"graph ({n} v, {e} e) exceeds capacity ({cap_v}, {cap_e})")

    ids = np.full((cap_v,), -1, np.int64)
    ids[:n] = p["v_ids"]
    poses = np.zeros((cap_v, 3), np.float64)
    poses[:n] = p["v_pose"]
    vmask = np.zeros((cap_v,), bool)
    vmask[:n] = True
    fix = np.zeros((cap_v,), bool)
    fix[:n] = p["v_fixed"].astype(bool)
    if n and not fix.any():
        fix[0] = True

    # id -> slot via sorted lookup (ids may be sparse/namespaced)
    order = np.argsort(p["v_ids"], kind="stable")
    sorted_ids = p["v_ids"][order]

    def slot_of(raw_ids):
        pos = np.searchsorted(sorted_ids, raw_ids)
        pos = np.clip(pos, 0, n - 1)
        ok = sorted_ids[pos] == raw_ids
        if not ok.all():
            raise ValueError("edge references unknown vertex id")
        return order[pos]

    e_ij = np.zeros((cap_e, 2), np.int32)
    e_z = np.zeros((cap_e, 3), np.float64)
    e_info = np.zeros((cap_e, 6), np.float64)
    emask = np.zeros((cap_e,), bool)
    if e:
        e_ij[:e, 0] = slot_of(p["e_ids"][:, 0])
        e_ij[:e, 1] = slot_of(p["e_ids"][:, 1])
        e_z[:e] = p["e_z"]
        e_info[:e] = p["e_info"]
        emask[:e] = True

    g = G.PoseGraph(
        poses=jnp.asarray(poses, dtype),
        vmask=jnp.asarray(vmask),
        fixed=jnp.asarray(fix),
        e_ij=jnp.asarray(e_ij),
        e_z=jnp.asarray(e_z, dtype),
        e_info=jnp.asarray(e_info, dtype),
        emask=jnp.asarray(emask),
        e_level=jnp.zeros((cap_e,), jnp.int32),
        e_owner=jnp.zeros((cap_e,), jnp.int32),
        n_vertices=jnp.asarray(n, jnp.int32),
        n_edges=jnp.asarray(e, jnp.int32),
    )

    scans = None
    laser_meta: Dict = {}
    nl = p["l_vertex"].shape[0]
    if nl:
        meta = p["l_meta"]
        b = beams or p["l_ranges"].shape[1]
        scans = S.empty(
            cap_v, b,
            first_beam_angle=float(meta[0, 0]),
            angular_step=float(meta[0, 2]),
            max_range=float(meta[0, 3]),
            fov=float(meta[0, 1]),
        )
        ranges = np.asarray(scans.ranges).copy()
        smask = np.zeros((cap_v,), bool)
        slots = p["l_vertex"].astype(np.int64)
        w = min(b, p["l_ranges"].shape[1])
        ranges[slots, :w] = p["l_ranges"][:, :w]
        smask[slots] = True
        for k in range(nl):
            laser_meta[int(slots[k])] = {
                "first_beam_angle": meta[k, 0], "fov": meta[k, 1],
                "angular_step": meta[k, 2], "max_range": meta[k, 3],
                "laser_pose": meta[k, 4:7], "odom_pose": meta[k, 7:10],
                "ranges": p["l_ranges"][k],
            }
        from cg_mrslam_tpu.utils import se2
        off = se2.relative(jnp.asarray(meta[0, 7:10], jnp.float32),
                           jnp.asarray(meta[0, 4:7], jnp.float32))
        scans = dataclasses.replace(
            scans, ranges=jnp.asarray(ranges, jnp.float32),
            smask=jnp.asarray(smask), laser_offset=off)

    return LoadedGraph(graph=g, ids=ids, scans=scans, laser_meta=laser_meta)


def save(path: str, g: G.PoseGraph, ids: np.ndarray | None = None,
         scans: S.ScanSet | None = None) -> None:
    """Write a g2o-compatible text file (reference ``saveGraph`` analogue)."""
    poses = np.asarray(g.poses, np.float64)
    vmask = np.asarray(g.vmask)
    fix = np.asarray(g.fixed)
    e_ij = np.asarray(g.e_ij)
    e_z = np.asarray(g.e_z, np.float64)
    e_info = np.asarray(g.e_info, np.float64)
    emask = np.asarray(g.emask)
    n = poses.shape[0]
    if ids is None:
        ids = np.arange(n, dtype=np.int64)

    if scans is not None:
        ranges = np.asarray(scans.ranges, np.float64)
        smask = np.asarray(scans.smask)
        fba = float(scans.first_beam_angle)
        step = float(scans.angular_step)
        mr = float(scans.max_range)
        fov = step * ranges.shape[1]
        off = np.asarray(scans.laser_offset, np.float64)

    with open(path, "w") as f:
        for k in range(n):
            if not vmask[k]:
                continue
            f.write(
                f"VERTEX_SE2 {ids[k]} {poses[k,0]:.6f} {poses[k,1]:.6f} {poses[k,2]:.6f}\n"
            )
            if scans is not None and smask[k]:
                from cg_mrslam_tpu.utils import se2
                import jax.numpy as _j
                lpose = np.asarray(
                    se2.compose(_j.asarray(poses[k]), _j.asarray(off)), np.float64
                )
                rs = " ".join(f"{r:.4f}" for r in ranges[k])
                f.write(
                    f"ROBOTLASER1 0 {fba:.6f} {fov:.6f} {step:.6f} {mr:.2f} 0.01 0 "
                    f"{ranges.shape[1]} {rs} 0 "
                    f"{lpose[0]:.6f} {lpose[1]:.6f} {lpose[2]:.6f} "
                    f"{poses[k,0]:.6f} {poses[k,1]:.6f} {poses[k,2]:.6f} "
                    f"0 0 0 0 0 0 hostname 0\n"
                )
            if fix[k]:
                f.write(f"FIX {ids[k]}\n")
        e_owner = np.asarray(g.e_owner)
        e_level = np.asarray(g.e_level)
        ordinal = 0
        for k in range(e_ij.shape[0]):
            if not emask[k]:
                continue
            i, j = e_ij[k]
            z = e_z[k]
            w = e_info[k]
            f.write(
                f"EDGE_SE2 {ids[i]} {ids[j]} "
                f"{z[0]:.6f} {z[1]:.6f} {z[2]:.6f} "
                f"{w[0]:.6f} {w[1]:.6f} {w[2]:.6f} {w[3]:.6f} {w[4]:.6f} {w[5]:.6f}\n"
            )
            # edge provenance as a comment (external g2o tools skip '#'):
            # owner (creating robot, the own-edges rule input) + level
            # (condensed-star channel). The .g2o format itself carries
            # neither, which breaks multi-robot resume — a resumed graph
            # would re-condense peer-derived information
            # (condensed_graph_buffer.cpp:347-366's failure mode).
            if e_owner[k] != 0 or e_level[k] != 0:
                f.write(f"# CGM_EDGE_META {ordinal} "
                        f"{int(e_owner[k])} {int(e_level[k])}\n")
            ordinal += 1
