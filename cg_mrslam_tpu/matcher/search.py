"""Correlative search over (x, y, θ) candidate transforms.

TPU-native replacement for the reference's exhaustive matchers
(``/root/reference/src/matcher/chargrid.cpp``: ``greedySearch`` at
``:208-308`` scores every pose in a region with OpenMP threads;
``hierarchicalSearch`` at ``:310-413`` runs it coarse-to-fine). Here a
whole score *volume* ``[T, Dy, Dx]`` is computed as a θ-scan of batched
gathers — one fused device program per search, no host loops:

* rotation is applied once per θ (as in the reference, ``:236-258``);
* integer translations reuse the same rotated cells (pure index offsets);
* consecutive duplicate cells are dropped from the normalization exactly
  like the reference's dedup (``chargrid.cpp:242-258``);
* score = mean grid distance IN METERS, lower is better; points that land
  outside the grid are skipped from the sum but still normalize the mean,
  matching the reference (``chargrid.cpp:270-276``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.matcher.grid import world_to_cell


class SearchResult(NamedTuple):
    poses: jax.Array   # [K, 3] candidate transforms, best first
    scores: jax.Array  # [K] mean-distance scores (lower = better)


@partial(jax.jit, static_argnames=("resolution",))
def score_volume(grid: jax.Array, center: jax.Array, resolution: float,
                 points: jax.Array, valid: jax.Array, base: jax.Array,
                 thetas: jax.Array, ty_cells: jax.Array,
                 tx_cells: jax.Array) -> jax.Array:
    """Scores ``[T, Dy, Dx]`` for poses (base ⊕ (tx·res, ty·res, θ)).

    ``points [P,2]`` are in the moving scan's frame; candidate pose
    ``(base_x + tx·res, base_y + ty·res, base_θ + θ)`` maps them to world.
    """
    cells = grid.shape[0]

    def per_theta(th):
        ang = base[2] + th
        c, s = jnp.cos(ang), jnp.sin(ang)
        wx = c * points[:, 0] - s * points[:, 1] + base[0]
        wy = s * points[:, 0] + c * points[:, 1] + base[1]
        cell = world_to_cell(jnp.stack([wx, wy], -1), center, cells,
                             resolution)                        # [P,2] (ix,iy)
        # consecutive-duplicate-cell dedup (reference chargrid.cpp:242-258)
        same = jnp.all(cell == jnp.roll(cell, 1, axis=0), axis=-1)
        same = same.at[0].set(False)
        keep = valid & ~same

        iy = cell[:, 1, None, None] + ty_cells[None, :, None]   # [P,Dy,1]
        ix = cell[:, 0, None, None] + tx_cells[None, None, :]   # [P,1,Dx]
        iy, ix = jnp.broadcast_arrays(iy, ix)                    # [P,Dy,Dx]
        inb = (iy >= 0) & (iy < cells) & (ix >= 0) & (ix < cells)
        v = grid[jnp.clip(iy, 0, cells - 1), jnp.clip(ix, 0, cells - 1)]
        v = jnp.where(inb, v, 0.0)  # out-of-grid skipped from the sum
        w = keep.astype(v.dtype)[:, None, None]
        count = jnp.maximum(jnp.sum(keep), 1)
        return jnp.sum(v * w, axis=0) / count                    # [Dy,Dx]

    return jax.lax.map(per_theta, thetas)                        # [T,Dy,Dx]


def _use_pallas() -> bool:
    return (jax.default_backend() == "tpu"
            and os.environ.get("CG_MRSLAM_PALLAS", "1") != "0")


def _strided_fits_vmem(cells: int, ry: int, rx: int) -> bool:
    """Conservative VMEM bound for the strided kernel: padded grid +
    output block + scratch must fit comfortably (the padded grid gains a
    margin the size of the full window span on every side)."""
    dyp = ((2 * ry + 1 + 7) // 8) * 8
    dxp = ((2 * rx + 1 + 127) // 128) * 128
    hp = cells + 2 * dyp + 8
    wp = ((cells + 2 * dxp + 127) // 128) * 128 + 128
    grid_b = hp * wp * 4
    out_b = 8 * dyp * dxp * 4
    scratch_b = (dyp + 8) * (dxp + 128) * 4
    return grid_b + out_b + 2 * scratch_b < 12 * 2**20


def score_volume_auto(grid, center, resolution, points, valid, base,
                      thetas, ty_cells, tx_cells, *,
                      kind: str) -> jax.Array:
    """Backend dispatch for the score volume. ``kind`` is a trace-time
    tag: ``"contiguous"`` (step-1 symmetric lattice), ``"strided"``
    (arbitrary static lattice — hierarchical coarse levels; requires
    numpy ``ty_cells``/``tx_cells``), or ``"xla"`` (tiny vmapped refine
    windows where kernel launch overhead dominates).

    On TPU the Pallas patch-accumulation kernel (`ops/correlate.py`)
    serves both pallas kinds: measured on a real v5e chip it runs the
    close-match volume (65×25×25 lattice × 1024 points, 1200² grid) in
    **9.5 ms vs 426 ms** for the jitted XLA gather path — the gather's
    random access defeats XLA's VMEM staging, while the kernel's aligned
    full-width tile fetches keep the VPU busy despite their
    (dyp+8)(dxp+128)/(dy·dx) padding tax. A strided lattice accumulates
    the full contiguous span and slices the kept offsets (the tile fetch
    covers the span either way). Set ``CG_MRSLAM_PALLAS=0`` to force the
    XLA path everywhere (also used on CPU)."""
    if _use_pallas() and kind == "contiguous":
        from cg_mrslam_tpu.ops.correlate import pallas_score_volume

        return pallas_score_volume(grid, center, resolution, points,
                                   valid, base, thetas, ty_cells, tx_cells)
    if _use_pallas() and kind == "strided":
        import numpy as np

        ty = np.asarray(ty_cells)
        tx = np.asarray(tx_cells)
        ry = int(max(ty.max(), -ty.min()))
        rx = int(max(tx.max(), -tx.min()))
        if _strided_fits_vmem(grid.shape[0], ry, rx):
            from cg_mrslam_tpu.ops.correlate import (
                pallas_score_volume_strided,
            )

            return pallas_score_volume_strided(
                grid, center, resolution, points, valid, base, thetas,
                ty, tx)
    return score_volume(grid, center, resolution, points, valid, base,
                        thetas, jnp.asarray(ty_cells),
                        jnp.asarray(tx_cells))


def volume_topk(scores: jax.Array, base: jax.Array, thetas: jax.Array,
                ty_cells: jax.Array, tx_cells: jax.Array,
                resolution: float, k: int,
                report: jax.Array | None = None) -> SearchResult:
    """Best-k poses from a score volume (flattened lax.top_k).

    Selection runs on ``scores``; the returned score is read from
    ``report`` when given (raw match quality without prior/tie-break
    penalties, so acceptance thresholds see pure scan agreement)."""
    t, dy, dx = scores.shape
    flat = scores.reshape(-1)
    k = min(k, flat.shape[0])   # tiny windows can hold < k cells
    neg, idx = jax.lax.top_k(-flat, k)
    it = idx // (dy * dx)
    iy = (idx // dx) % dy
    ix = idx % dx
    poses = jnp.stack(
        [
            base[0] + tx_cells[ix] * resolution,
            base[1] + ty_cells[iy] * resolution,
            base[2] + thetas[it],
        ],
        axis=-1,
    )
    out = -neg if report is None else report.reshape(-1)[idx]
    return SearchResult(poses=poses, scores=out)


def make_lattice(span: float, step: float) -> jax.Array:
    """Symmetric lattice ``[-span..span]`` with ``step`` (static length)."""
    n = int(round(span / step))
    return jnp.arange(-n, n + 1, dtype=jnp.float32) * step


# Prior weight on deviating from the search base, in score units (meters
# of mean point distance) per meter/radian of offset.
#
# TIEBREAK (the default) only breaks exact ties: in self-similar geometry
# (a corridor seen along its axis) whole ridges of the score volume are
# equal and argmin would pick an arbitrary lattice extreme. It is far
# below any real score contrast (≥ ~1e-3).
#
# Close matching instead passes a real motion-prior weight
# (``SearchWindows.close_prior_weight``): with sparse beams, occlusion
# novelty (points the reference scans never saw) puts an 0.01-0.02 noise
# floor on the score that can pull the argmin to a spurious coincidence a
# whole window away from an odometry guess that is good to a few cm. The
# MAP view — match likelihood + odometry prior — prices a w·|offset|
# penalty so spurious minima lose while genuine large corrections (whose
# score gain is the full misalignment cost, ≥ 0.1) still win. Acceptance
# thresholds always see the raw score (``volume_topk(report=...)``).
TIEBREAK = 1e-4


def _offset_penalty(thetas_rel, ty_cells, tx_cells, resolution, weight):
    return weight * (
        jnp.abs(thetas_rel)[:, None, None]
        + (jnp.abs(ty_cells) * resolution)[None, :, None]
        + (jnp.abs(tx_cells) * resolution)[None, None, :]
    )


@partial(jax.jit, static_argnames=("resolution", "th_res", "th_span",
                                   "x_span", "y_span", "topk",
                                   "prior_weight"))
def grid_search(grid: jax.Array, center: jax.Array, resolution: float,
                points: jax.Array, valid: jax.Array, base: jax.Array, *,
                th_span: float, th_res: float, x_span: float, y_span: float,
                topk: int = 1, prior_weight: float = TIEBREAK
                ) -> SearchResult:
    """One-shot region search (reference ``greedySearch`` semantics):
    full (θ × ty × tx) lattice at grid resolution around ``base``."""
    thetas = make_lattice(th_span, th_res)
    ty = jnp.arange(-int(round(y_span / resolution)),
                    int(round(y_span / resolution)) + 1, dtype=jnp.int32)
    tx = jnp.arange(-int(round(x_span / resolution)),
                    int(round(x_span / resolution)) + 1, dtype=jnp.int32)
    raw = score_volume_auto(grid, center, resolution, points, valid, base,
                            thetas, ty, tx, kind="contiguous")
    scores = raw + _offset_penalty(thetas, ty, tx, resolution, prior_weight)
    return volume_topk(scores, base, thetas, ty, tx, resolution, topk,
                       report=raw)


def hierarchical_search(grid: jax.Array, center: jax.Array,
                        resolution: float, points: jax.Array,
                        valid: jax.Array, base: jax.Array, *,
                        th_span: float, th_res: float, x_span: float,
                        y_span: float, levels: int = 4,
                        branch: int = 16,
                        known_cap: float | None = None,
                        min_known: float = 0.0,
                        pool_coarse: bool = False) -> SearchResult:
    """Coarse-to-fine search (reference ``hierarchicalSearch``,
    ``chargrid.cpp:310-413``: steps ×2^(levels-1)…×1).

    Level 0 scans the full window at the coarsest step keeping ``branch``
    candidates (the reference keeps a pruned multi-result map per level,
    ``chargrid.cpp:292-307`` — a wide beam is what survives coarse-step
    aliasing in self-similar corridors); each finer level rescans a
    ±previous-step window around every survivor. All shapes static;
    survivors refine via ``vmap``.

    ``known_cap`` switches on COVERAGE-NORMALIZED scoring (the
    inter-robot rendezvous mode): points landing on saturated distance
    cells (``grid ≥ known_cap`` — unmapped frontier, indistinguishable
    from far-from-everything in a pure distance field) are excluded from
    both the sum and the count, and candidates with fewer than
    ``min_known`` of their points on known cells score +inf. Without
    this, the raw reference scoring (chargrid.cpp:260-276) penalizes the
    TRUE rendezvous pose — which necessarily overhangs the partial local
    map — by the saturation value per frontier point, so an aliased pose
    buried inside covered territory wins (the π-twin failure this
    framework measured at ATE 1.8 m).

    ``pool_coarse`` scores every SUB-FINEST level on a min-pooled copy
    of the grid (pool window = that level's cell step): the coarse score
    becomes a LOWER BOUND on the best fine score within the step block
    (Olson's multi-resolution correlative matching bound — min over the
    block commutes under the mean), so the true basin cannot fall
    between coarse samples and be pruned. Point sampling instead loses
    basins narrower than the step (kernel_radius < step·resolution is
    typical at step 8), which is exactly how self-similar-corridor
    aliases outrank the truth at level 0.
    """
    step0 = 2 ** (levels - 1)

    def pooled(g, w):
        # separable rectangular min-pool (SAME padding keeps geometry)
        g = -jax.lax.reduce_window(-g, -jnp.inf, jax.lax.max, (w, 1),
                                   (1, 1), "SAME")
        return -jax.lax.reduce_window(-g, -jnp.inf, jax.lax.max, (1, w),
                                      (1, 1), "SAME")

    def level_search(b, th_sp, th_st, x_sp, y_sp, cell_step, k,
                     kind="xla", pool=False):
        import numpy as np

        rel = make_lattice(th_sp, th_st)
        thetas = b[2] + rel
        ny = max(1, int(round(y_sp / (resolution * cell_step))))
        nx = max(1, int(round(x_sp / (resolution * cell_step))))
        ty_np = np.arange(-ny, ny + 1, dtype=np.int32) * cell_step
        tx_np = np.arange(-nx, nx + 1, dtype=np.int32) * cell_step
        ty = jnp.asarray(ty_np)
        tx = jnp.asarray(tx_np)
        b0 = jnp.stack([b[0], b[1], jnp.float32(0.0)])
        g = pooled(grid, cell_step) if (pool and cell_step > 1) else grid
        if known_cap is None:
            raw = score_volume_auto(g, center, resolution, points,
                                    valid, b0, thetas, ty_np, tx_np,
                                    kind=kind)
        else:
            known = (g < known_cap).astype(g.dtype)
            s_m = score_volume_auto(g * known, center, resolution,
                                    points, valid, b0, thetas, ty_np,
                                    tx_np, kind=kind)
            s_i = score_volume_auto(known, center, resolution, points,
                                    valid, b0, thetas, ty_np, tx_np,
                                    kind=kind)
            # s_m = Σ_known dist / count, s_i = known_count / count →
            # mean over known = s_m / s_i; coverage fraction = s_i
            raw = s_m / jnp.maximum(s_i, 1e-6)
            raw = jnp.where(s_i >= min_known, raw, jnp.float32(1e3))
        scores = raw + _offset_penalty(rel, ty, tx, resolution, TIEBREAK)
        return volume_topk(scores, jnp.stack([b[0], b[1], 0.0]), thetas,
                           ty, tx, resolution, k, report=raw)

    # level 0: full window, coarse step, keep `branch` — the strided
    # pallas kind (big span, not vmapped); refine levels stay "xla"
    # (tiny ≤3×3×3 windows under vmap, launch overhead would dominate)
    res0 = level_search(base, th_span, th_res * step0, x_span, y_span,
                        step0, branch, kind="strided", pool=pool_coarse)
    poses, scores = res0.poses, res0.scores

    step = step0
    for _ in range(1, levels):
        prev = step
        step //= 2
        fn = lambda b: level_search(  # noqa: E731 — closure over step
            b, th_res * prev, th_res * step, resolution * prev,
            resolution * prev, step, 1, pool=pool_coarse
        )
        refined = jax.vmap(fn)(poses)
        poses = refined.poses[:, 0]
        scores = refined.scores[:, 0]

    order = jnp.argsort(scores)
    return SearchResult(poses=poses[order], scores=scores[order])


def unmatched_points(grid: jax.Array, center: jax.Array, resolution: float,
                     points: jax.Array, valid: jax.Array, *,
                     dist_threshold: float = 0.3) -> jax.Array:
    """Mask of points NOT explained by the grid (reference
    ``searchNonMatchedPoints``, ``chargrid.cpp:444-455``): a point is
    unmatched when the grid distance at its cell exceeds
    ``dist_threshold`` (0.3 m at ``scan_matcher.cpp:466``). Out-of-grid
    points are not counted (the reference only tests in-grid cells).
    ``points`` are already in the grid's world frame."""
    cells = grid.shape[0]
    cell = world_to_cell(points, center, cells, resolution)
    inb = jnp.all((cell >= 0) & (cell < cells), axis=-1)
    v = grid[jnp.clip(cell[:, 1], 0, cells - 1),
             jnp.clip(cell[:, 0], 0, cells - 1)]
    return valid & inb & (v > dist_threshold)


def box_mean(grid: jax.Array, center: jax.Array, resolution: float,
             box_center: jax.Array, *, box_half: float = 0.3) -> jax.Array:
    """Mean grid value over the cells of a world-frame box (reference
    ``CharGrid::countPoints``, ``chargrid.cpp:417-441``: sum of cell
    values over the box divided by visited cells)."""
    cells = grid.shape[0]
    ax = (jnp.arange(cells, dtype=jnp.float32) + 0.5 - cells / 2.0) \
        * resolution
    wx = center[0] + ax                                   # cell centers
    wy = center[1] + ax
    mx = jnp.abs(wx - box_center[0]) <= box_half          # [C]
    my = jnp.abs(wy - box_center[1]) <= box_half
    m = my[:, None] & mx[None, :]                          # [C,C] row=y
    n = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(jnp.where(m, grid, 0.0)) / n
