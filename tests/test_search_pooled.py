"""Properties of the round-5 global-match machinery:

* min-pooled coarse scoring is a LOWER BOUND on every fine score inside
  the step block (Olson's multi-resolution bound) — so a narrow true
  basin survives coarse pruning that plain point sampling loses;
* coverage-normalized scoring excludes saturated (unknown) cells from
  both the sum and the count and gates on the known fraction.
"""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import (hierarchical_search,
                                          score_volume)


def _narrow_basin_setup(seed=3):
    """A sparse dotted wall: the matching basin is ~1 cell wide, so a
    step-8 coarse lattice almost always straddles it."""
    rng = np.random.default_rng(seed)
    xs = np.arange(-6.0, 6.0, 0.25)
    pts = np.stack([xs, np.full_like(xs, 2.0)], -1)
    pts = np.concatenate([pts, np.stack(
        [np.full(30, -3.0), np.linspace(-4, 4, 30)], -1)])
    pts = pts + rng.normal(0, 0.01, pts.shape)
    pts = jnp.asarray(pts.astype(np.float32))
    valid = jnp.ones(len(pts), bool)
    center = jnp.zeros(2, jnp.float32)
    res = 0.1
    grid = build_grid(pts, valid, center, cells=160, resolution=res,
                      kernel_radius=0.2)
    return grid, center, res, pts, valid


def test_pooled_coarse_finds_offset_narrow_basin():
    grid, center, res, pts, valid = _narrow_basin_setup()
    # the moving scan is the same points shifted by an offset that is
    # NOT a multiple of the coarse step (8 cells = 0.8 m): point
    # sampling at step 8 sees the basin only if a sample lands within
    # the 0.2 m kernel; 0.35 m offset guarantees a miss at level 0
    true_off = jnp.asarray([0.35, -0.35], jnp.float32)
    moving = pts - true_off[None, :]
    base = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

    res_pool = hierarchical_search(
        grid, center, res, moving, valid, base, th_span=0.1,
        th_res=0.025, x_span=2.0, y_span=2.0, levels=4, branch=8,
        pool_coarse=True)
    best = np.asarray(res_pool.poses[0])
    assert np.hypot(best[0] - 0.35, best[1] + 0.35) < 0.15, best
    assert float(res_pool.scores[0]) < 0.1


def test_pooled_level0_is_lower_bound():
    grid, center, res, pts, valid = _narrow_basin_setup()
    import jax.lax as lax

    step = 8
    g = -lax.reduce_window(-grid, -jnp.inf, lax.max, (step, 1), (1, 1),
                           "SAME")
    g = -lax.reduce_window(-g, -jnp.inf, lax.max, (1, step), (1, 1),
                           "SAME")
    thetas = jnp.asarray([0.0], jnp.float32)
    base = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    coarse_cells = jnp.arange(-2, 3, dtype=jnp.int32) * step
    pooled = np.asarray(score_volume(g, center, res, pts, valid, base,
                                     thetas, coarse_cells, coarse_cells))
    # every fine offset within +-step/2 of each coarse sample must score
    # >= the pooled (lower-bound) score at that sample
    for iy, cy in enumerate(np.asarray(coarse_cells)):
        for ix, cx in enumerate(np.asarray(coarse_cells)):
            sub = jnp.arange(-(step // 2), step // 2 + 1,
                             dtype=jnp.int32)
            fine = np.asarray(score_volume(
                grid, center, res, pts, valid, base, thetas,
                sub + cy, sub + cx))
            assert fine.min() >= pooled[0, iy, ix] - 1e-5


def test_known_cap_scoring_matches_manual():
    grid, center, res, pts, valid = _narrow_basin_setup()
    # a candidate placing half the scan on frontier: manual coverage-
    # normalized score == (sum over known cells)/(count on known cells)
    moving = jnp.concatenate([pts[:40], pts[:40] + 30.0])  # half off-map
    mvalid = jnp.ones(len(moving), bool)
    base = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    cap = 0.2 * 0.999
    res_cov = hierarchical_search(
        grid, center, res, moving, mvalid, base, th_span=0.05,
        th_res=0.05, x_span=0.2, y_span=0.2, levels=1, branch=1,
        known_cap=cap, min_known=0.3)
    # identity candidate: first 40 points sit on the wall (known,
    # near-zero distance), the +30 m copies land outside the grid
    # (excluded by inb) — coverage ~0.5 >= 0.3, score ~ small
    assert float(res_cov.scores[0]) < 0.05
    # a min_known above the achievable fraction gates the same pose out
    res_gated = hierarchical_search(
        grid, center, res, moving, mvalid, base, th_span=0.05,
        th_res=0.05, x_span=0.2, y_span=0.2, levels=1, branch=1,
        known_cap=cap, min_known=0.9)
    assert float(res_gated.scores[0]) > 100.0
