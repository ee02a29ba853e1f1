"""Correlative matcher tests: grid vs brute-force distance field, and
planted-transform recovery for all three search modes."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import MatcherConfig, SearchWindows
from cg_mrslam_tpu.matcher.grid import build_grid, world_to_cell
from cg_mrslam_tpu.matcher import matching
from cg_mrslam_tpu.sim import world as W
from cg_mrslam_tpu.utils import se2

CFG = MatcherConfig(extent=20.0, resolution=0.05, kernel_radius=0.2)
LC_CFG = MatcherConfig(extent=30.0, resolution=0.1, kernel_radius=0.5)
WIN = SearchWindows()


def test_grid_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (40, 2)).astype(np.float32)
    valid = np.ones(40, bool)
    valid[-5:] = False
    cfg = MatcherConfig(extent=10.0, resolution=0.1, kernel_radius=0.3)
    center = np.zeros(2, np.float32)
    g = np.asarray(
        build_grid(jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(center),
                   cells=cfg.cells, resolution=cfg.resolution,
                   kernel_radius=cfg.kernel_radius)
    )
    c = cfg.cells
    # brute force: value = min(r, min_p dist(cell_of_p, cell)) in meters
    # (the kernel quantizes distances between *cells*, point snapped to cell)
    ref = np.full((c, c), cfg.kernel_radius)
    cell = np.asarray(world_to_cell(jnp.asarray(pts), jnp.asarray(center),
                                    c, cfg.resolution))
    for p in range(40):
        if not valid[p]:
            continue
        px, py = cell[p]
        if not (0 <= px < c and 0 <= py < c):
            continue
        for iy in range(max(0, py - 4), min(c, py + 5)):
            for ix in range(max(0, px - 4), min(c, px + 5)):
                d = np.hypot(iy - py, ix - px) * cfg.resolution
                ref[iy, ix] = min(ref[iy, ix], min(d, cfg.kernel_radius))
    np.testing.assert_allclose(g, ref, atol=1e-6)


def test_subsample_preserves_grid():
    from cg_mrslam_tpu.matcher.grid import subsample

    rng = np.random.default_rng(1)
    # clustered points: many land in the same cells
    pts = np.repeat(rng.uniform(-3, 3, (30, 2)), 4, axis=0).astype(
        np.float32) + rng.normal(0, 0.005, (120, 2)).astype(np.float32)
    valid = np.ones(120, bool)
    valid[-7:] = False
    cfg = MatcherConfig(extent=10.0, resolution=0.1, kernel_radius=0.3)
    center = jnp.zeros(2)
    keep = subsample(jnp.asarray(pts), jnp.asarray(valid), center,
                     cells=cfg.cells, resolution=cfg.resolution)
    assert int(keep.sum()) < valid.sum()
    g_full = build_grid(jnp.asarray(pts), jnp.asarray(valid), center,
                        cells=cfg.cells, resolution=cfg.resolution,
                        kernel_radius=cfg.kernel_radius)
    g_sub = build_grid(jnp.asarray(pts), keep, center, cells=cfg.cells,
                       resolution=cfg.resolution,
                       kernel_radius=cfg.kernel_radius)
    np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_full))


def _scene():
    w = W.hospital_world(seed=1)
    segs = w.as_jax()
    beams, fov, mr = 240, 2 * np.pi * 0.75, 10.0

    def scan(pose):
        r = W.raycast(segs, jnp.asarray(pose, jnp.float32), beams,
                      -fov / 2, fov / beams, mr)
        a = -fov / 2 + (fov / beams) * jnp.arange(beams)
        pts = jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], -1)
        valid = (r > 0.05) & (r < mr * 0.999)
        return pts.astype(jnp.float32), valid

    return scan


def test_close_match_recovers_planted_offset():
    scan = _scene()
    pose_a = np.array([8.0, 10.0, 0.3], np.float32)
    true_b = np.array([8.15, 10.1, 0.35], np.float32)
    pts_a, va = scan(pose_a)
    pts_b, vb = scan(true_b)

    ref_world = se2.apply(jnp.asarray(pose_a), pts_a)
    guess = jnp.asarray([8.05, 10.0, 0.28])  # noisy odometry guess
    m = matching.close_match(ref_world, va, pts_b, vb, guess,
                             cfg=CFG, windows=WIN)
    err = np.asarray(m.pose) - true_b
    assert bool(m.accepted), float(m.score)
    assert abs(err[0]) <= 0.06 and abs(err[1]) <= 0.06, err
    assert abs(err[2]) <= 0.02, err


def test_global_match_recovers_large_rotation():
    scan = _scene()
    pose_a = np.array([20.0, 10.0, 0.0], np.float32)
    true_b = np.array([21.0, 9.4, 2.4], np.float32)
    pts_a, va = scan(pose_a)
    pts_b, vb = scan(true_b)

    ref_world = se2.apply(jnp.asarray(pose_a), pts_a)
    m = matching.global_match(ref_world, va, pts_b, vb,
                              jnp.asarray(pose_a), cfg=LC_CFG, windows=WIN)
    err = np.asarray(m.pose) - true_b
    err[2] = (err[2] + np.pi) % (2 * np.pi) - np.pi
    # score stays above max_score here: the two viewpoints genuinely see
    # different geometry (occlusion), as in the reference, whose inter-robot
    # protocol tolerates rejects by retrying. Recovery itself must be exact.
    assert float(m.score) < 0.25, float(m.score)
    assert abs(err[0]) <= 0.2 and abs(err[1]) <= 0.2, err
    assert abs(err[2]) <= 0.06, err


def test_loop_closure_match_regions():
    scan = _scene()
    pose_a = np.array([12.0, 10.0, 0.1], np.float32)
    true_b = np.array([12.3, 10.4, 0.5], np.float32)
    pts_a, va = scan(pose_a)
    pts_b, vb = scan(true_b)
    ref_world = se2.apply(jnp.asarray(pose_a), pts_a)

    regions = jnp.asarray([[12.0, 10.0, 0.4], [30.0, 10.0, 0.0]], jnp.float32)
    rvalid = jnp.asarray([True, False])
    res = matching.loop_closure_match(ref_world, va, pts_b, vb,
                                      regions, rvalid, cfg=LC_CFG, windows=WIN)
    # region 0 (and/or its π twin) searched; masked region scores the max
    assert float(res.scores[1]) == LC_CFG.kernel_radius
    assert float(res.scores[3]) == LC_CFG.kernel_radius
    best = int(np.argmin(np.asarray(res.scores)))
    err = np.asarray(res.poses[best]) - true_b
    err[2] = (err[2] + np.pi) % (2 * np.pi) - np.pi
    assert float(res.scores[best]) < 0.2  # 0.1 m grid quantization floor
    assert abs(err[0]) <= 0.25 and abs(err[1]) <= 0.25 and abs(err[2]) <= 0.1, err


def test_verify_match_gate():
    # reference semantics (scan_matcher.cpp:430-505): the gate passes
    # exactly when my scan contains points UNEXPLAINED by the peer's map
    # clustered at the peer's claimed position — i.e. I see its body there.
    scan = _scene()
    pose_a = np.array([8.0, 10.0, 0.3], np.float32)
    pose_b = np.array([9.0, 10.0, 1.0], np.float32)
    pts_a, va = scan(pose_a)
    pts_b, vb = scan(pose_b)
    map_pts = se2.apply(jnp.asarray(pose_b), pts_b)   # peer's map, world
    my_pts = np.asarray(se2.apply(jnp.asarray(pose_a), pts_a))

    # the gate discriminates through the grid's far value (=kernel
    # radius): the reference only calls it on its 0.5 m LC grid, where
    # "no unmatched points" reads 0.5 > 40/128 (scan_matcher.cpp:34-36,
    # graph_slam.cpp:58-62)
    lc_cfg = MatcherConfig(extent=20.0, resolution=0.1, kernel_radius=0.5)

    # my scan also sees the peer's BODY: a small cluster at its position
    # that its own (static) map cannot explain → detected
    body = pose_b[:2] + np.array([[0.05, 0.0], [-0.05, 0.05], [0.0, -0.06],
                                  [0.08, 0.06], [-0.04, -0.04]], np.float32)
    my_with_body = jnp.asarray(np.concatenate([my_pts, body]))
    va_with_body = jnp.concatenate([va, jnp.ones(len(body), bool)])
    ok = matching.verify_match(map_pts, vb, my_with_body, va_with_body,
                               jnp.asarray(pose_b[:2]), cfg=lc_cfg,
                               threshold=40.0)
    assert bool(ok)

    # same scene WITHOUT body returns: everything near the claimed
    # position is explained by the peer's map → no robot there → rejected
    bad = matching.verify_match(map_pts, vb, jnp.asarray(my_pts), va,
                                jnp.asarray(pose_b[:2]), cfg=lc_cfg,
                                threshold=40.0)
    assert not bool(bad)


def test_lc_hierarchical_mode():
    # scanMatchingLChierarchical equivalent: recovers a loop transform
    # from a guess within its ±2 m / ±1 rad window
    scan = _scene()
    true_pose = np.array([8.0, 10.0, 0.4], np.float32)
    ref_pose = np.array([7.0, 9.5, 0.1], np.float32)
    pts_ref, vr = scan(ref_pose)
    pts_cur, vc = scan(true_pose)
    ref_world = se2.apply(jnp.asarray(ref_pose), pts_ref)
    guess = jnp.asarray(true_pose + np.array([0.8, -0.6, 0.3], np.float32))
    m = matching.loop_closure_match_hierarchical(
        ref_world, vr, pts_cur, vc, guess, cfg=CFG, windows=WIN)
    err = np.asarray(m.pose) - true_pose
    err[2] = (err[2] + np.pi) % (2 * np.pi) - np.pi
    assert bool(m.accepted)
    assert abs(err[0]) <= 0.3 and abs(err[1]) <= 0.3 and abs(err[2]) <= 0.1
