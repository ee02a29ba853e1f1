"""Occupancy map: ray integration semantics + end-to-end from the sim."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.core import scan as S
from cg_mrslam_tpu.maps import occupancy as OCC
from cg_mrslam_tpu.sim import world as W


def test_single_beam_semantics():
    # one robot at origin, one beam along +x of range 2.0 (hit), max 5
    scans = S.empty(4, 8, first_beam_angle=0.0, angular_step=0.1,
                    max_range=5.0)
    ranges = np.full(8, 5.0, np.float32)
    ranges[0] = 2.0
    scans = S.set_scan(scans, 0, jnp.asarray(ranges))
    poses = jnp.zeros((4, 3), jnp.float32)
    grid = OCC.integrate(poses, scans, jnp.zeros(2, jnp.float32),
                         cells=128, resolution=0.1, max_range=5.0)
    tri = np.asarray(OCC.threshold(grid))

    def cell(x, y):
        return (int(np.floor(y / 0.1 + 64)), int(np.floor(x / 0.1 + 64)))

    # beam 0: free along the ray, occupied at the endpoint
    for x in (0.3, 1.0, 1.7):
        assert tri[cell(x, 0.0)] == OCC.FREE, x
    assert tri[cell(2.0, 0.0)] == OCC.OCCUPIED
    # beyond the endpoint: unknown
    assert tri[cell(3.0, 0.0)] == OCC.UNKNOWN
    # max-range beams trace free space but score no hit
    iy, ix = cell(3.0 * np.cos(0.3), 3.0 * np.sin(0.3))
    assert tri[iy, ix] == OCC.FREE


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
    grid = OCC.integrate(poses, scans, center, cells=400, resolution=0.05,
                         max_range=mr)
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
