"""Occupancy-grid mapping: batched ray-cast integration of all scans.

TPU-native replacement for the reference's map publisher stack
(``/root/reference/src/ros_map_publisher/``): ``Graph2occupancy::computeMap``
rebuilds the grid from the whole graph each keyframe
(``graph2occupancy.cpp:29-164``), ``FrequencyMap::integrateScan`` walks a
Bresenham line per beam (``frequency_map.cpp:27-76``,
``grid_line_traversal.cpp:3-126``) incrementing per-cell miss counts and
splatting endpoint hits with a gain, and ``OccupancyMapServer`` thresholds
hit ratios into trinary free/unknown/occupied (free < 0.196,
occupied > 0.65 — defaults at ``cg_mrslam.cpp:110-117``).

Here the whole map is ONE fused program: every (scan × beam × sample)
triple is generated as a 3-D lattice, free-space samples scatter-add into
a miss grid and endpoints into a hit grid. Sampling along rays at
``resolution/√2`` with consecutive-duplicate-cell masking visits each cell
approximately once, matching Bresenham counts closely enough for the
threshold semantics. All scans integrate in a single device call —
the reference's per-keyframe full rebuild becomes cheap instead of the
hottest loop.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.core.scan import ScanSet, beam_angles
from cg_mrslam_tpu.utils import se2

FREE = 0
UNKNOWN = -1
OCCUPIED = 100


class OccupancyGrid(NamedTuple):
    hits: jax.Array    # [C, C] float32
    misses: jax.Array  # [C, C] float32
    center: jax.Array  # [2] world center of the grid
    resolution: float


def _cell_of(p, center, cells, resolution):
    rel = (p - center) / resolution + cells / 2.0
    return jnp.floor(rel).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cells", "resolution", "max_range",
                                   "usable_range", "gain", "square_size",
                                   "infinity_filling_range", "angle",
                                   "robot_fill"))
def integrate(poses: jax.Array, scans: ScanSet, center: jax.Array, *,
              cells: int, resolution: float, max_range: float,
              usable_range: float = -1.0, gain: float = 3.0,
              square_size: int = 0,
              infinity_filling_range: float = -1.0,
              angle: float = 0.0, robot_fill: int = 4) -> OccupancyGrid:
    """Hit/miss grids from every stored scan at its (optimized) pose.

    ``poses [N,3]`` are the graph estimates; scans/mask come from the
    ScanSet aligned with the vertex slots. Beam classification follows the
    reference's exact branch order (``frequency_map.cpp:31-50``):

    1. ``usable_range < 0`` → use the sensor max range
       (``cg_mrslam.cpp:110`` default, ``frequency_map.cpp:29-30``);
    2. ``r > usable`` → crop to usable, trace free space, score no hit;
    3. then ``r >= max_range or r <= 0`` (note: a beam cropped to
       ``usable == max_range`` ALSO lands here): with
       ``infinity_filling_range > 0`` the beam traces free space to that
       range and scores no hit; otherwise it is skipped entirely
       (``frequency_map.cpp:39-50``). The reference's live runs set
       5.0 m unconditionally (``cg_mrslam.cpp:134``).

    Endpoints splat hits over a ``(2·square_size+1)²`` cell square with
    ``gain`` (``frequency_map.cpp:63-71``); the Bresenham line includes
    the endpoint cell, so every reaching beam also scores one endpoint
    miss (``grid_line_traversal`` inclusive of ``end``). ``angle``
    pre-rotates all poses (``graph2occupancy.cpp:52`` base transform,
    default π/2 at ``cg_mrslam.cpp:116``). ``robot_fill`` marks a
    ``(2·robot_fill+1)²`` square of misses at each robot pose
    (``fillRobotPose``, ``frequency_map.cpp:89-103``; 4 px hardcoded) —
    pass <0 to disable.
    """
    usable = usable_range if usable_range > 0 else max_range
    if angle != 0.0:
        base = jnp.asarray([0.0, 0.0, angle], poses.dtype)
        poses = se2.compose(base, poses)
    trace_cap = usable if infinity_filling_range <= 0 else max(
        usable, infinity_filling_range)
    step = resolution / math.sqrt(2.0)
    n_samples = int(math.ceil(trace_cap / step)) + 1

    a = beam_angles(scans)                                   # [B]
    world_ang = poses[:, 2:3] + a[None, :]                   # [N,B]
    origin = se2.apply(poses, scans.laser_offset[None, :2])[:, 0, :]  # [N,2]

    r_raw = scans.ranges
    cropped = r_raw > usable                                 # [N,B]
    r = jnp.minimum(r_raw, usable)
    invalid = (r >= max_range) | (r <= 0.0)                  # post-crop test
    if infinity_filling_range > 0:
        r = jnp.where(invalid, infinity_filling_range, r)
        cropped = cropped | invalid
        beam_ok = scans.smask[:, None]
    else:
        beam_ok = scans.smask[:, None] & ~invalid
    is_hit = beam_ok & ~cropped

    dirx = jnp.cos(world_ang)
    diry = jnp.sin(world_ang)

    t = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) * step  # [S]
    free = t[None, None, :] < (r[..., None] - resolution)        # [N,B,S]
    sx = origin[:, None, None, 0] + dirx[..., None] * t[None, None, :]
    sy = origin[:, None, None, 1] + diry[..., None] * t[None, None, :]
    cell = _cell_of(jnp.stack([sx, sy], -1), center, cells, resolution)
    # consecutive-duplicate-cell mask along the sample axis (≈ Bresenham
    # one-visit-per-cell counting)
    same = jnp.all(cell == jnp.roll(cell, 1, axis=-2), axis=-1)
    same = same.at[..., 0].set(False)
    use = free & beam_ok[..., None] & ~same
    inb = jnp.all((cell >= 0) & (cell < cells), axis=-1)
    cidx = jnp.where((use & inb)[..., None], cell, cells)    # OOB -> drop

    misses = jnp.zeros((cells + 1, cells + 1), jnp.float32)
    misses = misses.at[cidx[..., 1].reshape(-1),
                       cidx[..., 0].reshape(-1)].add(1.0, mode="drop")

    ex = origin[:, 0:1] + dirx * r
    ey = origin[:, 1:2] + diry * r
    ecell = _cell_of(jnp.stack([ex, ey], -1), center, cells, resolution)
    einb = jnp.all((ecell >= 0) & (ecell < cells), axis=-1)
    # the Bresenham line is endpoint-inclusive: every reaching beam puts
    # one miss on its endpoint cell (grid_line_traversal.cpp + :56-58)
    emiss = jnp.where((beam_ok & einb)[..., None], ecell, cells)
    misses = misses.at[emiss[..., 1].reshape(-1),
                       emiss[..., 0].reshape(-1)].add(1.0, mode="drop")

    # robot-footprint misses (fillRobotPose; per integrated scan)
    if robot_fill >= 0:
        rf = robot_fill
        roff = jnp.stack(jnp.meshgrid(
            jnp.arange(-rf, rf + 1), jnp.arange(-rf, rf + 1),
            indexing="ij"), -1).reshape(-1, 2)               # [(2rf+1)²,2]
        rcell = _cell_of(poses[:, :2], center, cells, resolution)  # [N,2]
        rsq = rcell[:, None, :] + roff[None, :, :]           # [N,F,2]
        rinb = jnp.all((rsq >= 0) & (rsq < cells), axis=-1) \
            & scans.smask[:, None]
        ridx = jnp.where(rinb[..., None], rsq, cells)
        misses = misses.at[ridx[..., 1].reshape(-1),
                           ridx[..., 0].reshape(-1)].add(1.0, mode="drop")

    # endpoint hit splat over the (2s+1)² square (frequency_map.cpp:63-71;
    # square cells are bounds-checked individually, so only the center
    # cell's in-bounds test gates the whole splat — matching `continue`)
    s = square_size
    off = jnp.stack(jnp.meshgrid(
        jnp.arange(-s, s + 1), jnp.arange(-s, s + 1),
        indexing="ij"), -1).reshape(-1, 2)                   # [(2s+1)²,2]
    esq = ecell[:, :, None, :] + off[None, None, :, :]       # [N,B,F,2]
    sinb = jnp.all((esq >= 0) & (esq < cells), axis=-1)
    eidx = jnp.where((is_hit & einb)[..., None, None] & sinb[..., None],
                     esq, cells)
    hits = jnp.zeros((cells + 1, cells + 1), jnp.float32)
    hits = hits.at[eidx[..., 1].reshape(-1),
                   eidx[..., 0].reshape(-1)].add(gain, mode="drop")

    return OccupancyGrid(hits=hits[:cells, :cells],
                         misses=misses[:cells, :cells],
                         center=center, resolution=resolution)


@partial(jax.jit, static_argnames=("occupied_threshold", "free_threshold"))
def threshold(grid: OccupancyGrid, occupied_threshold: float = 0.65,
              free_threshold: float = 0.196) -> jax.Array:
    """Trinary map ``[C, C]`` int8: FREE(0) / UNKNOWN(-1) / OCCUPIED(100)
    (reference ``graph2occupancy.cpp:133-151`` + nav_msgs convention)."""
    total = grid.hits + grid.misses
    ratio = grid.hits / jnp.maximum(total, 1e-9)
    out = jnp.full(ratio.shape, UNKNOWN, jnp.int8)
    out = jnp.where((total > 0) & (ratio < free_threshold),
                    jnp.int8(FREE), out)
    out = jnp.where((total > 0) & (ratio > occupied_threshold),
                    jnp.int8(OCCUPIED), out)
    return out


def map_center(poses: np.ndarray, pad: float = 1.0) -> np.ndarray:
    """World center for a grid covering all poses (host helper; the
    reference recomputes the bounding box each keyframe,
    ``graph2occupancy.cpp:40-96``)."""
    lo = poses[:, :2].min(axis=0) - pad
    hi = poses[:, :2].max(axis=0) + pad
    return ((lo + hi) / 2.0).astype(np.float32)


def save_pgm_yaml(path_base: str, tri: np.ndarray, center: np.ndarray,
                  resolution: float) -> None:
    """ROS map-server compatible .pgm + .yaml pair (reference
    ``occupancy_map_server.cpp:128-169`` writes .png + .yaml; PGM avoids
    an image dependency). Row 0 is the map's top (y max), as map servers
    expect."""
    c = tri.shape[0]
    img = np.full(tri.shape, 205, np.uint8)      # unknown -> grey
    img[tri == FREE] = 254
    img[tri == OCCUPIED] = 0
    img = img[::-1]                               # flip rows for image order
    with open(path_base + ".pgm", "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (c, c))
        f.write(img.tobytes())
    ox = float(center[0]) - resolution * c / 2.0
    oy = float(center[1]) - resolution * c / 2.0
    with open(path_base + ".yaml", "w") as f:
        f.write(
            "image: %s.pgm\nresolution: %f\norigin: [%f, %f, 0.0]\n"
            "negate: 0\noccupied_thresh: 0.65\nfree_thresh: 0.196\n"
            % (path_base.rsplit("/", 1)[-1], resolution, ox, oy)
        )
