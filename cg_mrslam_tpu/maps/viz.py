"""Trajectory + laser-map visualization export.

TPU-native replacement for ``GraphRosPublisher``
(``/root/reference/src/ros_utils/graph_ros_publisher.cpp``): instead of
RViz topics it produces arrays and image files —

* :func:`trajectory` — all vertex estimates (the ``trajectory`` PoseArray,
  ``graph_ros_publisher.cpp:58-66``);
* :func:`laser_map_points` — every ``stride``-th laser point transformed
  to the map frame (the ``lasermap`` PointCloud, ``:68-91``; reference
  stride is 10);
* :func:`map_to_odom` — the map→odom correction transform the reference
  broadcasts on tf at 10 Hz (``:95-116``): estimate ∘ odom⁻¹;
* :func:`render_png` — a PPM/PNG-style raster of trajectory + laser map
  (the visual the reference screenshots in its README).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.pipeline.slam import SlamState
from cg_mrslam_tpu.utils import se2


def trajectory(state: SlamState, own_only: bool = True) -> np.ndarray:
    """Vertex estimates ``[K, 3]`` in slot order."""
    mask = np.asarray(state.graph.vmask)
    if own_only:
        mask = mask & (np.asarray(state.v_owner) == int(state.my_id))
    return np.asarray(state.graph.poses)[mask]


def laser_map_points(state: SlamState, stride: int = 10) -> np.ndarray:
    """World-frame laser endpoints ``[M, 2]``, every ``stride``-th beam."""
    pts = S.scan_points(state.scans)                   # [N,B,2]
    world = se2.apply(state.graph.poses, pts)
    valid = (S.beam_valid(state.scans) & state.scans.smask[:, None]
             & state.graph.vmask[:, None])
    world = np.asarray(world)[np.asarray(valid)]
    return world[::stride]


def map_to_odom(estimate: np.ndarray, odom: np.ndarray) -> np.ndarray:
    """The tf correction map→odom = estimate ∘ odom⁻¹."""
    return np.asarray(
        se2.compose(jnp.asarray(estimate, jnp.float32),
                    se2.inverse(jnp.asarray(odom, jnp.float32))))


def render_png(path: str, state: SlamState, resolution: float = 0.05,
               pad: float = 2.0) -> None:
    """Rasterize laser map (grey) + trajectory (black) to a PGM image."""
    traj = trajectory(state, own_only=False)
    pts = laser_map_points(state, stride=1)
    if len(traj) == 0:
        return
    allp = np.concatenate([traj[:, :2], pts]) if len(pts) else traj[:, :2]
    lo = allp.min(0) - pad
    hi = allp.max(0) + pad
    w = int(np.ceil((hi[0] - lo[0]) / resolution))
    h = int(np.ceil((hi[1] - lo[1]) / resolution))
    img = np.full((h, w), 255, np.uint8)

    def cells(p):
        c = np.floor((p - lo) / resolution).astype(int)
        ok = (c[:, 0] >= 0) & (c[:, 0] < w) & (c[:, 1] >= 0) & (c[:, 1] < h)
        return c[ok]

    for c in cells(pts):
        img[c[1], c[0]] = 160
    for c in cells(traj[:, :2]):
        img[max(c[1] - 1, 0):c[1] + 2, max(c[0] - 1, 0):c[0] + 2] = 0

    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img[::-1].tobytes())
