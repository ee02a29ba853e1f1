"""CARMEN log (.clf) ingestion — the real-data path.

The reference feeds sensors from ROS bagfiles replayed into RosHandler
(``/root/reference/src/ros_utils/ros_handler.cpp:90-110`` converts a ROS
LaserScan to a g2o RobotLaser; ``README.md:77-93`` describes the bag
replay experiment setup). Its bagfiles are absent from the checkout, and
this build has no ROS — the public interchange format for 2D laser+odom
logs is the CARMEN log format (Freiburg/Intel/MIT datasets), so this
module is the RosHandler equivalent: parse a .clf, normalize the scans to
a fixed beam count (the pipeline's scan store is fixed-shape), and expose
relative odometry the keyframe loop consumes directly.

Two record families are supported:

* ``FLASER num [ranges...] lx ly lth ox oy oth ts host lts`` — classic
  180-degree SICK logs; beam geometry is implicit (fov = pi, start angle
  -pi/2 in the laser frame).
* ``ROBOTLASER1 type start fov ares maxr acc rem num [ranges...] <0 rem>
  lx ly lth ox oy oth tv rv fwd side turn ts host lts`` — carries beam
  geometry explicitly; what :func:`write` emits, so round-trips are
  lossless.

Host-side numpy only: ingestion is I/O, not compute.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CarmenLog:
    """One robot's laser+odometry stream in array form."""

    odom: np.ndarray        # [T, 3] robot odometry pose per scan
    laser_pose: np.ndarray  # [T, 3] laser pose per scan (world frame)
    ranges: np.ndarray      # [T, B]
    timestamps: np.ndarray  # [T]
    fov: float
    start_angle: float      # relative to robot heading
    max_range: float

    def rel_odom(self) -> np.ndarray:
        """[T-1, 3] relative motions x_i^{-1} x_{i+1} (the dead-reckoning
        increments the keyframe loop consumes)."""
        a, b = self.odom[:-1], self.odom[1:]
        c, s = np.cos(a[:, 2]), np.sin(a[:, 2])
        dx, dy = b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]
        dth = (b[:, 2] - a[:, 2] + np.pi) % (2 * np.pi) - np.pi
        return np.stack([c * dx + s * dy, -s * dx + c * dy, dth], 1)


def _resample(ranges: np.ndarray, beams: int) -> np.ndarray:
    """Angle-linear resample of each scan row to ``beams`` beams."""
    T, B = ranges.shape
    if B == beams:
        return ranges
    src = np.linspace(0.0, 1.0, B)
    dst = np.linspace(0.0, 1.0, beams)
    return np.stack([np.interp(dst, src, r) for r in ranges]).astype(
        ranges.dtype)


def read(path: str, beams: int | None = None,
         max_range: float | None = None) -> CarmenLog:
    """Parse a CARMEN .clf into a :class:`CarmenLog`.

    ``beams`` resamples every scan to a fixed count (required when the
    log mixes laser models); ``max_range`` overrides/clips the sensor
    range (invalid returns in CARMEN logs are encoded as huge ranges).
    """
    odom, lpose, rows, ts = [], [], [], []
    fov = np.pi
    start = -np.pi / 2
    maxr = 81.9  # classic SICK "no return" is >= 81.9 m

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "FLASER":
                n = int(tok[1])
                r = np.array(tok[2:2 + n], np.float32)
                vals = tok[2 + n:2 + n + 7]
                lpose.append([float(v) for v in vals[0:3]])
                odom.append([float(v) for v in vals[3:6]])
                ts.append(float(vals[6]))
                rows.append(r)
            elif tok[0] == "ROBOTLASER1":
                start = float(tok[2])
                fov = float(tok[3])
                maxr = float(tok[5])
                n = int(tok[8])
                r = np.array(tok[9:9 + n], np.float32)
                k = 9 + n
                nrem = int(tok[k])
                k += 1 + nrem
                vals = tok[k:k + 6]
                lpose.append([float(v) for v in vals[0:3]])
                odom.append([float(v) for v in vals[3:6]])
                ts.append(float(tok[k + 11]) if len(tok) > k + 11 else 0.0)
                rows.append(r)
    if not rows:
        raise ValueError(f"no FLASER/ROBOTLASER1 records in {path}")

    nb = max(len(r) for r in rows)
    ranges = np.stack([
        r if len(r) == nb else np.pad(r, (0, nb - len(r)),
                                      constant_values=maxr)
        for r in rows])
    if beams is not None:
        ranges = _resample(ranges, beams)
    if max_range is not None:
        maxr = float(max_range)
    ranges = np.minimum(ranges, maxr).astype(np.float32)

    return CarmenLog(
        odom=np.asarray(odom, np.float64),
        laser_pose=np.asarray(lpose, np.float64),
        ranges=ranges, timestamps=np.asarray(ts, np.float64),
        fov=float(fov), start_angle=float(start), max_range=float(maxr))


def write(path: str, odom: np.ndarray, ranges: np.ndarray, fov: float,
          max_range: float, laser_pose: np.ndarray | None = None,
          timestamps: np.ndarray | None = None) -> None:
    """Emit ROBOTLASER1 records (explicit beam geometry → lossless
    round-trip). Useful for exporting synthetic worlds as real-format
    logs and for cross-tool comparisons."""
    T, B = ranges.shape
    if laser_pose is None:
        laser_pose = odom
    if timestamps is None:
        timestamps = 0.1 * np.arange(T)
    start = -fov / 2
    ares = fov / max(B - 1, 1)
    with open(path, "w") as f:
        f.write("# carmen log written by cg_mrslam_tpu\n")
        for t in range(T):
            r = " ".join(f"{v:.3f}" for v in ranges[t])
            lp = " ".join(f"{v:.6f}" for v in laser_pose[t])
            op = " ".join(f"{v:.6f}" for v in odom[t])
            f.write(
                f"ROBOTLASER1 0 {start:.6f} {fov:.6f} {ares:.6f} "
                f"{max_range:.3f} 0.01 0 {B} {r} 0 {lp} {op} "
                f"0 0 0 0 0 {timestamps[t]:.6f} nohost "
                f"{timestamps[t]:.6f}\n")
