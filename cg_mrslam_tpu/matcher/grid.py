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
    sliced away, so they cannot corrupt interior cells. One scatter-min of
    ``P·K·K`` values — the whole reference-``addAndConvolvePoints`` loop
    as a single XLA op.
    """
    patch, r_cells = _kernel_patch(kernel_radius, resolution)
    k = 2 * r_cells + 1
    pad = 2 * k  # clipped out-of-grid patches land ≥ K cells from interior
    far = kernel_radius

    cell = world_to_cell(points, center, cells, resolution)  # [P,2] (ix,iy)
    ix = jnp.clip(cell[:, 0] - r_cells + pad, 0, cells + 2 * pad - k)
    iy = jnp.clip(cell[:, 1] - r_cells + pad, 0, cells + 2 * pad - k)
    # mark points that were actually inside (clip of the *unshifted* index)
    inside = (
        (cell[:, 0] >= -r_cells) & (cell[:, 0] < cells + r_cells)
        & (cell[:, 1] >= -r_cells) & (cell[:, 1] < cells + r_cells)
    )
    use = valid & inside

    oy = jnp.arange(k, dtype=jnp.int32)
    rows = iy[:, None, None] + oy[None, :, None]          # [P,K,1]
    cols = ix[:, None, None] + oy[None, None, :]          # [P,1,K]
    rows, cols = jnp.broadcast_arrays(rows, cols)          # [P,K,K]
    vals = jnp.where(use[:, None, None], patch[None], far)

    g = jnp.full((cells + 2 * pad, cells + 2 * pad), far, jnp.float32)
    g = g.at[rows.reshape(-1), cols.reshape(-1)].min(vals.reshape(-1))
    return g[pad:pad + cells, pad:pad + cells]
