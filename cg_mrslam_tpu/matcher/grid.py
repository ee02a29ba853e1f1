"""Distance-field grid construction for correlative scan matching.

TPU-native replacement for the reference's ``CharGrid`` rasterization
(``/root/reference/src/matcher/chargrid.{h,cpp}``: ``addAndConvolvePoints``
min-convolves a quantized radial kernel into a uint8 grid, ``applyKernel``
at ``chargrid.cpp:132-161``). Here the grid is a float32 field in [0, 1]:

    grid[cell] = min(1, dist(cell, nearest reference point) / kernel_radius)

built in ONE vectorized scatter-min of precomputed radial patches — no
per-point loops. Values are DISTANCES IN METERS capped at ``kernel_radius``
(the reference stores ``kscale×meters`` in a uint8 grid initialized to
``kernelRange×kscale`` and divides scores back by ``kscale``,
``scan_matcher.cpp:38-75``, ``chargrid.cpp:260-275`` — the byte
quantization is a CPU artifact and is not reproduced; thresholds like
``maxScore=0.15`` are mean distances in meters and apply directly).

Geometry convention: ``grid[iy, ix]`` covers world point
``center + (ix + 0.5 - C/2, iy + 0.5 - C/2) * resolution`` — i.e. the grid
is square, centered on ``center``, row = y.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# Cells with no reference point within kernel_radius hold the value
# kernel_radius itself (the reference's grid init, scan_matcher.cpp:68-76).


def world_to_cell(points: jax.Array, center: jax.Array, cells: int,
                  resolution: float) -> jax.Array:
    """World ``[..., 2]`` → integer cell indices ``[..., 2]`` as (ix, iy)."""
    rel = (points - center) / resolution + cells / 2.0
    return jnp.floor(rel).astype(jnp.int32)


def _kernel_patch(kernel_radius: float, resolution: float):
    """Radial distance patch ``[K, K]`` with values min(1, d/r), K static."""
    r_cells = max(1, int(math.ceil(kernel_radius / resolution - 1e-9)))
    k = 2 * r_cells + 1
    off = jnp.arange(k, dtype=jnp.float32) - r_cells
    d = jnp.sqrt(off[:, None] ** 2 + off[None, :] ** 2) * resolution
    return jnp.minimum(d, kernel_radius), r_cells


@partial(jax.jit, static_argnames=("cells", "resolution"))
def subsample(points: jax.Array, valid: jax.Array, center: jax.Array, *,
              cells: int, resolution: float) -> jax.Array:
    """Keep ≤1 point per grid cell: returns a reduced valid mask
    (reference ``CharGrid::subsample``, ``chargrid.cpp:98-122``, which
    thins dense clouds before rasterization). Since :func:`build_grid`
    snaps points to cells, the subsampled set produces an identical
    grid with fewer scatter elements."""
    cell = world_to_cell(points, center, cells, resolution)
    cid = jnp.where(valid, cell[:, 1] * cells + cell[:, 0], -1)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    first = sorted_cid != jnp.roll(sorted_cid, 1)
    first = first.at[0].set(True)
    keep_sorted = first & (sorted_cid >= 0)
    keep = jnp.zeros_like(valid).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("cells", "resolution", "kernel_radius"))
def build_grid(points: jax.Array, valid: jax.Array, center: jax.Array, *,
               cells: int, resolution: float,
               kernel_radius: float) -> jax.Array:
    """Distance grid ``[cells, cells]`` from reference points ``[P, 2]``.

    Invalid points contribute the neutral far value (= kernel_radius);
    points outside the grid are clipped into a padding margin that is
    sliced away, so they cannot corrupt interior cells.

    TPU realisation: a capped Euclidean distance transform computed
    **separably** — rasterize the points into an occupancy mask (one
    P-element scatter), then squared column distances (2r+1 shifted
    selects/mins down the rows) followed by squared row distances
    (2r+1 shifted adds/mins across the columns):

        d²[y,x] = min_dx ( colmin²[y, x+dx] + (dx·res)² )

    Every pass is full-width dense VPU work. The earlier direct
    formulation — one scatter-min of P·K² radial-patch values — left 46 ms
    on a real v5e chip at close-matcher shape (1200², K=17): TPU scatters
    with duplicate indices serialize. The two formulations are exactly
    equal: any cell within ``kernel_radius`` of a point lies inside that
    point's ±r patch box, and both cap at ``kernel_radius``.
    """
    _, r_cells = _kernel_patch(kernel_radius, resolution)
    pad = r_cells + 1  # out-of-grid points may still shade interior cells
    far = kernel_radius
    big = jnp.float32((kernel_radius * 4.0) ** 2)

    cell = world_to_cell(points, center, cells, resolution)  # [P,2] (ix,iy)
    inside = (
        (cell[:, 0] >= -pad) & (cell[:, 0] < cells + pad)
        & (cell[:, 1] >= -pad) & (cell[:, 1] < cells + pad)
    )
    use = valid & inside
    c = cells + 2 * pad
    ix = jnp.where(use, cell[:, 0] + pad, 0)
    iy = jnp.where(use, cell[:, 1] + pad, 0)
    occ = jnp.zeros((c, c), jnp.bool_).at[iy, ix].max(use)

    # column pass: squared distance to nearest occupied cell in the same
    # column within ±r rows
    col = jnp.where(occ, jnp.float32(0.0), big)
    dcol = col
    for dy in range(1, r_cells + 1):
        w = jnp.float32((dy * resolution) ** 2)
        up = jnp.full_like(col, big).at[:-dy].set(col[dy:] + w)
        dn = jnp.full_like(col, big).at[dy:].set(col[:-dy] + w)
        dcol = jnp.minimum(dcol, jnp.minimum(up, dn))

    # row pass: add squared horizontal offsets
    d2 = dcol
    for dx in range(1, r_cells + 1):
        w = jnp.float32((dx * resolution) ** 2)
        lf = jnp.full_like(dcol, big).at[:, :-dx].set(dcol[:, dx:] + w)
        rt = jnp.full_like(dcol, big).at[:, dx:].set(dcol[:, :-dx] + w)
        d2 = jnp.minimum(d2, jnp.minimum(lf, rt))

    g = jnp.minimum(jnp.sqrt(d2), far)
    return g[pad:pad + cells, pad:pad + cells]
