"""Fixed-shape laser scan storage + geometry.

TPU-native replacement for g2o ``RobotLaser``/``LaserParameters`` userData
attached per vertex (reference ``ros_handler.cpp:90-110`` builds them from
ROS LaserScans; every matcher entry point consumes them). Scans live in one
``[N, B]`` ranges array aligned with the pose-graph vertex slots — a whole
trajectory's scans convert to Cartesian points in a single fused op.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.utils import se2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScanSet:
    """Scans for every vertex slot of a graph (masked like the graph).

    ``ranges`` is ``[N, B]``; invalid/out-of-range beams are stored as
    ``max_range`` (they are masked by ``beam_valid``). The angular layout
    (``first_beam_angle`` + k·``angular_step``) and the base→laser offset
    are shared per robot, matching the reference where LaserParameters is
    captured once at init (``ros_handler.cpp:112-143``).
    """

    ranges: jax.Array            # [N, B] float32
    smask: jax.Array             # [N] bool — vertex slot has a scan
    first_beam_angle: jax.Array  # [] float
    angular_step: jax.Array      # [] float
    max_range: jax.Array         # [] float
    usable_range: jax.Array      # [] float — beams beyond it are cropped
    laser_offset: jax.Array      # [3] — base→laser SE(2) transform


def empty(num_vertices: int, beams: int, first_beam_angle=-jnp.pi / 2,
          angular_step=None, max_range=20.0, usable_range=None,
          fov=jnp.pi) -> ScanSet:
    if angular_step is None:
        angular_step = fov / beams
    if usable_range is None:
        usable_range = max_range
    return ScanSet(
        ranges=jnp.full((num_vertices, beams), max_range, jnp.float32),
        smask=jnp.zeros((num_vertices,), bool),
        first_beam_angle=jnp.asarray(first_beam_angle, jnp.float32),
        angular_step=jnp.asarray(angular_step, jnp.float32),
        max_range=jnp.asarray(max_range, jnp.float32),
        usable_range=jnp.asarray(usable_range, jnp.float32),
        laser_offset=jnp.zeros((3,), jnp.float32),
    )


def set_scan(s: ScanSet, index, ranges: jax.Array) -> ScanSet:
    return dataclasses.replace(
        s,
        ranges=s.ranges.at[index].set(ranges),
        smask=s.smask.at[index].set(True),
    )


def resample_scan_np(ranges, src_fba: float, src_step: float,
                     src_maxr: float, dst_beams: int, dst_fba: float,
                     dst_step: float, dst_maxr: float):
    """Angle-exact host-side resample of one scan ``[B_src]`` (or a stack
    ``[T, B_src]``) onto a different beam grid.

    Used when a peer's laser geometry differs from the receiver's (the
    reference ships ``minangle/angleincrement/maxrange`` per
    RobotLaserMessage, ``msg_factory.h:162-181``) and when ingesting logs
    whose geometry differs from the pipeline's ScanSet. Correctness
    details that a naive ``np.interp`` over a normalized [0,1] axis gets
    wrong:

    * interpolation is over REAL beam angles, honoring both start angles
      and both steps (endpoint-inclusive vs exclusive conventions enter
      only through the caller's ``step`` values);
    * invalid returns (``<= 0`` or ``>= max_range``) must not blend into
      neighbours — any destination beam whose bracketing source beams
      include an invalid one snaps to ``dst_maxr`` (no phantom hits at
      depth discontinuities);
    * destination beams outside the source fov read ``dst_maxr``.
    """
    import numpy as np

    ranges = np.asarray(ranges, np.float32)
    squeeze = ranges.ndim == 1
    rows = ranges[None] if squeeze else ranges
    b_src = rows.shape[-1]
    src_a = src_fba + src_step * np.arange(b_src)
    dst_a = dst_fba + dst_step * np.arange(dst_beams)
    out = np.empty((rows.shape[0], dst_beams), np.float32)
    for t in range(rows.shape[0]):
        r = rows[t]
        invalid = (r <= 0.0) | (r >= src_maxr * 0.9999)
        vals = np.interp(dst_a, src_a, np.minimum(r, src_maxr))
        inv = np.interp(dst_a, src_a, invalid.astype(np.float64))
        oob = (dst_a < src_a[0] - 1e-9) | (dst_a > src_a[-1] + 1e-9)
        vals = np.where((inv > 1e-9) | oob, dst_maxr, vals)
        out[t] = np.minimum(vals, dst_maxr)
    return out[0] if squeeze else out


def beam_angles(s: ScanSet) -> jax.Array:
    b = s.ranges.shape[-1]
    return s.first_beam_angle + s.angular_step * jnp.arange(b, dtype=jnp.float32)


def beam_valid(s: ScanSet, indices=None) -> jax.Array:
    r = s.ranges if indices is None else s.ranges[indices]
    return (r > 0.0) & (r < jnp.minimum(s.max_range, s.usable_range) * 0.9999)


def points_from_ranges(s: ScanSet, ranges: jax.Array):
    """One raw scan ``[B]`` → (points ``[B,2]`` in base frame, valid ``[B]``)
    using the ScanSet's shared laser geometry."""
    a = beam_angles(s)
    pts = jnp.stack([ranges * jnp.cos(a), ranges * jnp.sin(a)], axis=-1)
    valid = (ranges > 0.0) & (
        ranges < jnp.minimum(s.max_range, s.usable_range) * 0.9999
    )
    return se2.apply(s.laser_offset, pts), valid


def scan_points(s: ScanSet, indices=None) -> jax.Array:
    """Cartesian endpoints ``[..., B, 2]`` in the *robot base* frame.

    Mirrors the reference's point pipeline: ranges → laser-frame Cartesian
    (RawLaser cartesian), then through the base→laser offset
    (``scan_matcher.cpp:89-110`` composes vertex pose ∘ laser offset).
    Invalid beams still produce points — mask with :func:`beam_valid`.
    """
    r = s.ranges if indices is None else s.ranges[indices]
    a = beam_angles(s)
    pts = jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], axis=-1)
    return se2.apply(s.laser_offset, pts)
