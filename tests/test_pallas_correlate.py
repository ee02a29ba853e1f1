"""Parity: Pallas correlation kernel (interpret mode) vs the XLA path.

The kernel (`ops/correlate.py`) must reproduce
`matcher.search.score_volume` bit-for-bit in structure (same dedup, same
out-of-grid handling, same normalization) — scores drive acceptance
thresholds (maxScore 0.15, reference `scan_matcher.cpp:148-151`), so a
mismatch silently changes which closures are admitted.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import make_lattice, score_volume
from cg_mrslam_tpu.ops.correlate import (lattice_is_contiguous,
                                         pallas_score_volume)


def _setup(seed=0, n_ref=200, n_mov=150, cells=160, res=0.05):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(-3, 3, size=(n_ref, 2)).astype(np.float32)
    center = jnp.zeros(2, jnp.float32)
    grid = build_grid(jnp.asarray(ref), jnp.ones(n_ref, bool), center,
                      cells=cells, resolution=res, kernel_radius=0.2)
    mov = rng.uniform(-3, 3, size=(n_mov, 2)).astype(np.float32)
    valid = np.ones(n_mov, bool)
    valid[-20:] = False  # exercise the invalid-beam path
    return grid, center, res, jnp.asarray(mov), jnp.asarray(valid)


@pytest.mark.parametrize("base", [(0.0, 0.0, 0.0), (0.4, -0.3, 0.7)])
def test_matches_xla_path(base):
    grid, center, res, mov, valid = _setup()
    thetas = make_lattice(0.2, 0.05)
    ty = jnp.arange(-6, 7, dtype=jnp.int32)
    tx = jnp.arange(-4, 5, dtype=jnp.int32)
    b = jnp.asarray(base, jnp.float32)

    want = score_volume(grid, center, res, mov, valid, b, thetas, ty, tx)
    got = pallas_score_volume(grid, center, res, mov, valid, b, thetas,
                              ty, tx, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_out_of_grid_points_contribute_zero():
    # a base far outside the map: every point lands out of grid → the
    # whole volume must be exactly 0 (out-of-grid skipped from sum but
    # kept in the normalization), matching the XLA path
    grid, center, res, mov, valid = _setup()
    thetas = make_lattice(0.1, 0.05)
    ty = jnp.arange(-3, 4, dtype=jnp.int32)
    tx = jnp.arange(-3, 4, dtype=jnp.int32)
    b = jnp.asarray([500.0, -500.0, 1.0], jnp.float32)
    want = score_volume(grid, center, res, mov, valid, b, thetas, ty, tx)
    got = pallas_score_volume(grid, center, res, mov, valid, b, thetas,
                              ty, tx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-7)
    assert float(jnp.max(jnp.abs(got))) == 0.0


def test_boundary_straddling_patch():
    # points whose translation window straddles the grid edge: in-grid
    # offsets read real cells, out-of-grid offsets contribute 0
    grid, center, res, _, _ = _setup()
    edge = 160 * 0.05 / 2  # world half-extent
    mov = jnp.asarray([[edge - 0.02, 0.0], [-edge + 0.02, -edge + 0.02],
                       [0.0, edge + 0.1]], jnp.float32)
    valid = jnp.ones(3, bool)
    thetas = make_lattice(0.05, 0.05)
    ty = jnp.arange(-5, 6, dtype=jnp.int32)
    tx = jnp.arange(-5, 6, dtype=jnp.int32)
    b = jnp.zeros(3, jnp.float32)
    want = score_volume(grid, center, res, mov, valid, b, thetas, ty, tx)
    got = pallas_score_volume(grid, center, res, mov, valid, b, thetas,
                              ty, tx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_lattice_predicate():
    assert lattice_is_contiguous(np.arange(-4, 5))
    assert not lattice_is_contiguous(np.arange(-4, 5) * 2)
    assert not lattice_is_contiguous(np.arange(-4, 4))


def test_strided_matches_xla_path():
    # the hierarchical coarse level: stride-8 translation lattice; the
    # strided kernel accumulates the full span and slices
    from cg_mrslam_tpu.ops.correlate import pallas_score_volume_strided

    grid, center, res, mov, valid = _setup(seed=4)
    thetas = make_lattice(0.4, 0.1)
    ty = np.arange(-3, 4, dtype=np.int32) * 8
    tx = np.arange(-2, 3, dtype=np.int32) * 8
    b = jnp.asarray([0.3, -0.2, 0.5], jnp.float32)
    want = score_volume(grid, center, res, mov, valid, b, thetas,
                        jnp.asarray(ty), jnp.asarray(tx))
    got = pallas_score_volume_strided(grid, center, res, mov, valid, b,
                                      thetas, ty, tx, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("base", [(0.0, 0.0, 0.0), (0.4, -0.3, 0.7)])
def test_tall_window_orientation_swap(base):
    """The LC-search window shape (tall in y: 31x11) triggers the
    orientation swap (`_pallas_volume_oriented`): the kernel runs on the
    transposed grid with axis roles exchanged. Must stay bit-identical
    in structure to the XLA path — the swap is a layout choice, not an
    approximation."""
    from cg_mrslam_tpu.ops.correlate import _tile_elems

    grid, center, res, mov, valid = _setup()
    thetas = make_lattice(0.2, 0.05)
    ty = jnp.arange(-15, 16, dtype=jnp.int32)   # 31 (y span on lanes)
    tx = jnp.arange(-5, 6, dtype=jnp.int32)     # 11
    assert _tile_elems(11, 31) < _tile_elems(31, 11)  # swap fires
    b = jnp.asarray(base, jnp.float32)

    want = score_volume(grid, center, res, mov, valid, b, thetas, ty, tx)
    got = pallas_score_volume(grid, center, res, mov, valid, b, thetas,
                              ty, tx, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
