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


@partial(jax.jit, static_argnames=("cells", "resolution", "max_range"))
def integrate(poses: jax.Array, scans: ScanSet, center: jax.Array, *,
              cells: int, resolution: float, max_range: float,
              usable_range: float = -1.0, gain: float = 3.0
              ) -> OccupancyGrid:
    """Hit/miss grids from every stored scan at its (optimized) pose.

    ``poses [N,3]`` are the graph estimates; scans/mask come from the
    ScanSet aligned with the vertex slots. ``usable_range < 0`` means use
    the sensor max range (reference ``cg_mrslam.cpp:110``,
    ``frequency_map.cpp:39-50`` crop semantics: beams beyond usable range
    trace free space up to the crop but score no hit).
    """
    usable = usable_range if usable_range > 0 else max_range
    step = resolution / math.sqrt(2.0)
    n_samples = int(math.ceil(usable / step)) + 1

    a = beam_angles(scans)                                   # [B]
    world_ang = poses[:, 2:3] + a[None, :]                   # [N,B]
    origin = se2.apply(poses, scans.laser_offset[None, :2])[:, 0, :]  # [N,2]

    r = jnp.minimum(scans.ranges, usable)                    # [N,B]
    beam_ok = scans.smask[:, None] & (scans.ranges > 0.0)
    is_hit = beam_ok & (scans.ranges < usable * 0.9999) & (
        scans.ranges < scans.max_range * 0.9999)

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
    eidx = jnp.where((is_hit & einb)[..., None], ecell, cells)
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
