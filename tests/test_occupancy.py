"""Occupancy map: ray integration semantics + end-to-end from the sim."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.maps import occupancy as OCC
from cg_mrslam_tpu.sim import world as W


def _one_beam_scans():
    # one robot at origin, one beam along +x of range 2.0 (hit), max 5;
    # the remaining beams read exactly max_range ("no return")
    scans = S.empty(4, 8, first_beam_angle=0.0, angular_step=0.1,
                    max_range=5.0)
    ranges = np.full(8, 5.0, np.float32)
    ranges[0] = 2.0
    return S.set_scan(scans, 0, jnp.asarray(ranges))


def _cell(x, y, res=0.1, half=64):
    return (int(np.floor(y / res + half)), int(np.floor(x / res + half)))


def test_single_beam_semantics():
    scans = _one_beam_scans()
    poses = jnp.zeros((4, 3), jnp.float32)
    grid = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                         cells=128, resolution=0.1, max_range=5.0)
    tri = np.asarray(OCC.threshold(grid))

    # beam 0: free along the ray, occupied at the endpoint
    for x in (0.3, 1.0, 1.7):
        assert tri[_cell(x, 0.0)] == OCC.FREE, x
    assert tri[_cell(2.0, 0.0)] == OCC.OCCUPIED
    # beyond the endpoint: unknown
    assert tri[_cell(3.0, 0.0)] == OCC.UNKNOWN
    # invalid (>= maxRange) beams are skipped entirely when infinity
    # filling is off (frequency_map.cpp:39-50 `continue` branch)
    iy, ix = _cell(3.0 * np.cos(0.3), 3.0 * np.sin(0.3))
    assert tri[iy, ix] == OCC.UNKNOWN


def test_infinity_filling_range():
    # reference live runs: invalid beams trace free space to 5.0 m
    # (cg_mrslam.cpp:134); here fill to 3.0 on a 5.0 max-range sensor
    scans = _one_beam_scans()
    poses = jnp.zeros((4, 3), jnp.float32)
    grid = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                         cells=128, resolution=0.1, max_range=5.0,
                         infinity_filling_range=3.0)
    tri = np.asarray(OCC.threshold(grid))
    # along an invalid beam: free up to the filling range, no hit at it,
    # unknown beyond
    iy, ix = _cell(2.0 * np.cos(0.3), 2.0 * np.sin(0.3))
    assert tri[iy, ix] == OCC.FREE
    iy, ix = _cell(3.05 * np.cos(0.3), 3.05 * np.sin(0.3))
    assert tri[iy, ix] != OCC.OCCUPIED
    iy, ix = _cell(4.0 * np.cos(0.3), 4.0 * np.sin(0.3))
    assert tri[iy, ix] == OCC.UNKNOWN
    # the real beam still hits
    assert tri[_cell(2.0, 0.0)] == OCC.OCCUPIED


def test_square_size_splat():
    scans = _one_beam_scans()
    poses = jnp.zeros((4, 3), jnp.float32)
    g0 = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                       cells=128, resolution=0.1, max_range=5.0)
    g1 = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                       cells=128, resolution=0.1, max_range=5.0,
                       square_size=1)
    h0 = np.asarray(g0.hits)
    h1 = np.asarray(g1.hits)
    iy, ix = _cell(2.0, 0.0)
    # endpoint splat covers the full (2s+1)^2 square with gain
    # (frequency_map.cpp:63-71)
    assert h0[iy, ix] > 0 and h0[iy + 1, ix] == 0
    assert (h1[iy - 1:iy + 2, ix - 1:ix + 2] > 0).all()
    assert np.isclose(h1[iy - 1:iy + 2, ix - 1:ix + 2].sum(),
                      9 * h0[iy, ix])


def test_robot_fill_and_angle():
    scans = _one_beam_scans()
    poses = jnp.zeros((4, 3), jnp.float32).at[0, :2].set(
        jnp.asarray([1.0, 1.0], jnp.float32))
    # robot footprint reads FREE (fillRobotPose misses splat)
    grid = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                         cells=128, resolution=0.1, max_range=5.0,
                         robot_fill=4)
    tri = np.asarray(OCC.threshold(grid))
    assert tri[_cell(1.0, 1.0)] == OCC.FREE
    grid_no = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                            cells=128, resolution=0.1, max_range=5.0,
                            robot_fill=-1)
    tri_no = np.asarray(OCC.threshold(grid_no))
    assert tri_no[_cell(1.0, 0.7)] == OCC.UNKNOWN  # off-ray, no footprint
    # angle: pi/2 base transform rotates the whole map
    # (graph2occupancy.cpp:52) — the robot sits at (1,1)->(-1,1)
    grid_rot = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                             cells=128, resolution=0.1, max_range=5.0,
                             robot_fill=4, angle=float(np.pi / 2))
    tri_rot = np.asarray(OCC.threshold(grid_rot))
    assert tri_rot[_cell(-1.0, 1.0)] == OCC.FREE
    # the hit endpoint (3,1) rotates to (-1,3)
    assert tri_rot[_cell(-1.0, 3.0)] == OCC.OCCUPIED


def test_map_from_sim_matches_world():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    segs = world.as_jax()
    beams, fov, mr = 180, 2 * np.pi * 0.75, 8.0
    # a few poses along the corridor
    gt = np.array([[5, 5, 0], [7, 5, 0], [9, 5, np.pi / 2],
                   [11, 5, np.pi]], np.float32)
    scans = S.empty(8, beams, first_beam_angle=-fov / 2,
                    angular_step=fov / beams, max_range=mr)
    for k, p in enumerate(gt):
        r = W.raycast(segs, jnp.asarray(p), beams, -fov / 2, fov / beams, mr)
        scans = S.set_scan(scans, k, r)
    poses = jnp.zeros((8, 3), jnp.float32).at[:4].set(jnp.asarray(gt))

    center = jnp.asarray([8.0, 5.0], jnp.float32)
    # infinity filling ON at 5.0 like the reference's live runs
    # (cg_mrslam.cpp:134): corridor-axis beams beyond max range still
    # trace free space near the robot
    grid = OCC.integrate(poses, scans, center, cells=400, resolution=0.05,
                         max_range=mr, infinity_filling_range=5.0)
    tri = np.asarray(OCC.threshold(grid))

    # corridor interior should be FREE, wall cells OCCUPIED
    def cell(x, y):
        return (int(np.floor((y - 5.0) / 0.05 + 200)),
                int(np.floor((x - 8.0) / 0.05 + 200)))

    assert tri[cell(8.0, 5.0)] == OCC.FREE
    assert tri[cell(6.0, 5.3)] == OCC.FREE
    # corridor walls at y = 5 ± 1.5 (height/2 ± corridor/2)
    wall_hits = 0
    for x in np.arange(5.2, 10.8, 0.25):
        iy, ix = cell(x, 6.5)
        patch = tri[iy - 1:iy + 2, ix - 1:ix + 2]
        wall_hits += int((patch == OCC.OCCUPIED).any())
    assert wall_hits > 15, wall_hits

    # occupied fraction sane (not everything marked occupied)
    occ_frac = (tri == OCC.OCCUPIED).mean()
    assert 0.001 < occ_frac < 0.2, occ_frac


def test_save_pgm_yaml(tmp_path):
    tri = np.full((32, 32), OCC.UNKNOWN, np.int8)
    tri[10, 5] = OCC.OCCUPIED
    tri[4, 4] = OCC.FREE
    base = str(tmp_path / "m")
    OCC.save_pgm_yaml(base, tri, np.zeros(2, np.float32), 0.05)
    data = open(base + ".pgm", "rb").read()
    assert data.startswith(b"P5\n32 32\n255\n")
    img = np.frombuffer(data.split(b"255\n", 1)[1], np.uint8).reshape(32, 32)
    assert img[::-1][10, 5] == 0 and img[::-1][4, 4] == 254
    assert "resolution: 0.05" in open(base + ".yaml").read()
