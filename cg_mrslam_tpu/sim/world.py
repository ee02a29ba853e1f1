"""Synthetic hospital-like 2D world + lidar + multi-robot trajectory sim.

The reference validates on ``bagfiles/{2,4}robots-hospital.bag`` (absent from
the checkout, ``.MISSING_LARGE_BLOBS``), replayed through ROS
(``README.md:77-93``). This module is the replacement data source: a
deterministic, seedable corridor/room floorplan made of line segments, an
exact vectorized ray-cast lidar, and unicycle trajectory generation with
configurable odometry noise — so every N-robot experiment is a
single-process, reproducible array program.

The lidar is one jitted ``[B beams × S segments]`` intersection reduce —
thousands of scans simulate in a single device call.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.utils import se2


@dataclasses.dataclass(frozen=True)
class World:
    """Axis-aligned wall segments ``[S, 4]`` = (x1, y1, x2, y2)."""

    segments: np.ndarray

    def as_jax(self) -> jax.Array:
        return jnp.asarray(self.segments, jnp.float32)


def hospital_world(width: float = 40.0, height: float = 20.0,
                   corridor: float = 3.0, room: float = 5.0,
                   door: float = 1.2, seed: int = 0) -> World:
    """A hospital-like floorplan: central E-W corridor with rooms on both
    sides connected by doors, plus a few corridor obstacles for scan-match
    texture. Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    segs: List[Tuple[float, float, float, float]] = []
    # outer walls
    segs += [
        (0, 0, width, 0), (width, 0, width, height),
        (width, height, 0, height), (0, height, 0, 0),
    ]
    cy0 = height / 2 - corridor / 2
    cy1 = height / 2 + corridor / 2
    # room partitions + corridor walls with doors
    x = 0.0
    while x + room <= width + 1e-6:
        nx = x + room
        # corridor walls with a door gap per room (bottom and top)
        for (y, sgn) in ((cy0, -1), (cy1, +1)):
            dpos = x + rng.uniform(0.8, room - 0.8 - door)
            segs.append((x, y, dpos, y))
            segs.append((dpos + door, y, nx, y))
            # room dividing wall (perpendicular), skip at building edges
            if nx < width - 1e-6:
                y_far = 0.0 if sgn < 0 else height
                segs.append((nx, y, nx, y_far))
        x = nx
    # a few random obstacles (cabinets/beds) inside rooms for texture
    for _ in range(10):
        ox = rng.uniform(1, width - 2)
        oy = rng.uniform(1, cy0 - 1) if rng.uniform() < 0.5 else rng.uniform(
            cy1 + 1, height - 2
        )
        w, h = rng.uniform(0.4, 1.5, 2)
        segs += [
            (ox, oy, ox + w, oy), (ox + w, oy, ox + w, oy + h),
            (ox + w, oy + h, ox, oy + h), (ox, oy + h, ox, oy),
        ]
    # corridor clutter hugging the corridor walls (outside the patrol
    # lanes at cy ± 0.5): a rectangular corridor is otherwise globally
    # π-symmetric, which NO correlative matcher can disambiguate — the
    # π-rotated twin hypotheses of scanMatchingLC would be exactly as
    # consistent as the truth. Real hospital corridors have carts and
    # door frames; these boxes are their stand-in.
    for _ in range(max(4, int(width / 8))):
        ox = rng.uniform(1.0, width - 2.0)
        side = rng.uniform() < 0.5
        oy = cy0 + 0.05 if side else cy1 - 0.45
        w = rng.uniform(0.3, 0.9)
        h = 0.4
        segs += [
            (ox, oy, ox + w, oy), (ox + w, oy, ox + w, oy + h),
            (ox + w, oy + h, ox, oy + h), (ox, oy + h, ox, oy),
        ]
    return World(segments=np.asarray(segs, np.float32))


@partial(jax.jit, static_argnames=("beams",))
def raycast(segments: jax.Array, pose: jax.Array, beams: int,
            first_beam_angle: float, angular_step: float,
            max_range: float) -> jax.Array:
    """Exact lidar: ranges ``[beams]`` from ``pose`` against ``[S,4]`` walls.

    Closed-form ray/segment intersection, min-reduced over segments; fully
    batched (vmap over poses for whole trajectories).
    """
    a = pose[2] + first_beam_angle + angular_step * jnp.arange(
        beams, dtype=jnp.float32
    )
    d = jnp.stack([jnp.cos(a), jnp.sin(a)], axis=-1)          # [B,2]
    o = pose[:2]
    p = segments[:, 0:2]                                       # [S,2]
    q = segments[:, 2:4]
    v = q - p                                                  # [S,2]
    po = p - o                                                 # [S,2]

    # cross products: denom[b,s] = d[b] × v[s]
    denom = d[:, None, 0] * v[None, :, 1] - d[:, None, 1] * v[None, :, 0]
    t_num = po[None, :, 0] * v[None, :, 1] - po[None, :, 1] * v[None, :, 0]
    u_num = po[None, :, 0] * d[:, None, 1] - po[None, :, 1] * d[:, None, 0]
    safe = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    hit = (jnp.abs(denom) >= 1e-9) & (t > 1e-6) & (u >= 0.0) & (u <= 1.0)
    t = jnp.where(hit, t, jnp.inf)
    r = jnp.min(t, axis=1)
    return jnp.minimum(r, max_range).astype(jnp.float32)


def corridor_waypoints(world_w: float, world_h: float, robot: int,
                       n_loops: int = 1) -> np.ndarray:
    """A rectangular patrol route in the corridor, phase-shifted per robot
    (reverse direction for odd robots) so robots meet and separate."""
    cy = world_h / 2
    m = 4.0
    pts = np.array(
        [[m, cy - 0.5], [world_w - m, cy - 0.5],
         [world_w - m, cy + 0.5], [m, cy + 0.5]]
    )
    if robot % 2 == 1:
        pts = pts[::-1]
    pts = np.roll(pts, shift=robot, axis=0)
    return np.tile(pts, (n_loops + 1, 1))[: 4 * n_loops + 1]


@dataclasses.dataclass
class Trajectory:
    """Ground truth + noisy odometry + scans for one robot."""

    gt: np.ndarray          # [T, 3]
    odom: np.ndarray        # [T, 3] integrated noisy odometry
    rel_odom: np.ndarray    # [T-1, 3] noisy relative motions
    ranges: np.ndarray      # [T, B]


def simulate_robot(world: World, waypoints: np.ndarray, seed: int,
                   step: float = 0.08, beams: int = 180,
                   fov: float = 2 * np.pi * 0.75, max_range: float = 10.0,
                   odom_noise: Tuple[float, float] = (0.01, 0.004),
                   ) -> Trajectory:
    """Drive through waypoints with a unicycle model; emit gt poses, noisy
    odometry, and exact lidar scans (the experiment data the reference gets
    from the hospital bagfiles)."""
    rng = np.random.default_rng(seed)
    pos = waypoints[0].astype(np.float64)
    heading = float(
        np.arctan2(*(waypoints[1] - waypoints[0])[::-1])
    )
    gt = [np.array([pos[0], pos[1], heading])]
    k = 1
    max_steps = 20000
    while k < len(waypoints) and len(gt) < max_steps:
        tgt = waypoints[k]
        d = tgt - pos
        dist = np.hypot(*d)
        if dist < step:
            pos = tgt.astype(np.float64)
            k += 1
            continue
        want = np.arctan2(d[1], d[0])
        dth = (want - heading + np.pi) % (2 * np.pi) - np.pi
        dth = np.clip(dth, -0.15, 0.15)
        heading = (heading + dth + np.pi) % (2 * np.pi) - np.pi
        pos = pos + step * np.array([np.cos(heading), np.sin(heading)])
        gt.append(np.array([pos[0], pos[1], heading]))
    gt = np.asarray(gt)

    # noisy relative odometry (numpy on host — cheap, avoids device dispatch)
    def np_rel(a, b):
        c, s = np.cos(a[..., 2]), np.sin(a[..., 2])
        dx, dy = b[..., 0] - a[..., 0], b[..., 1] - a[..., 1]
        th = (b[..., 2] - a[..., 2] + np.pi) % (2 * np.pi) - np.pi
        return np.stack([c * dx + s * dy, -s * dx + c * dy, th], axis=-1)

    rel = np_rel(gt[:-1], gt[1:])
    sig_t, sig_r = odom_noise
    noise = np.concatenate(
        [rng.normal(0, sig_t, (len(rel), 2)), rng.normal(0, sig_r, (len(rel), 1))],
        axis=1,
    )
    rel_noisy = rel + noise
    odom = np.zeros_like(gt)
    odom[0] = gt[0]
    for k2, r in enumerate(rel_noisy):
        a = odom[k2]
        c, s = np.cos(a[2]), np.sin(a[2])
        odom[k2 + 1] = [
            a[0] + c * r[0] - s * r[1],
            a[1] + s * r[0] + c * r[1],
            (a[2] + r[2] + np.pi) % (2 * np.pi) - np.pi,
        ]

    segs = world.as_jax()
    scan_fn = jax.vmap(
        lambda p: raycast(segs, p, beams, -fov / 2, fov / beams, max_range)
    )
    ranges = np.asarray(scan_fn(jnp.asarray(gt, jnp.float32)))
    return Trajectory(gt=gt, odom=odom, rel_odom=np.asarray(rel_noisy), ranges=ranges)
