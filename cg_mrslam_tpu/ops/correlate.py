"""Pallas TPU kernel for the correlative scan-match score volume.

This is hot loop #1 of the reference (`/root/reference/src/matcher/
chargrid.cpp:208-308` ``greedySearch``: score every (x, y, θ) pose of a
region on the distance grid, OpenMP over 4 threads). The XLA fallback
(:func:`cg_mrslam_tpu.matcher.search.score_volume`) expresses it as a
[P, Dy, Dx] gather per θ — random access the TPU memory system serves
one element at a time. This kernel restructures the work to match the
hardware:

* the whole distance grid lives in **VMEM** for the entire search (close
  matcher: 1200² f32 ≈ 5.8 MB, LC matcher 700² ≈ 2 MB — both fit), so
  every access is on-chip;
* the Dy×Dx translation lattice is *contiguous in grid cells*, so the
  per-point score contribution is one dense **[DY, DX] patch slice** of
  the grid anchored at that point's cell — a full-width vector load per
  point instead of Dy·Dx scattered gathers;
* the score volume accumulates in a VMEM scratch tile; one pallas grid
  step per θ (rotation applied once per θ, like the reference's per-θ
  point transform at ``chargrid.cpp:236-258``). Point→cell indices are
  precomputed for all θ by fused XLA (tiny [T, P] trig) and land in SMEM
  so the kernel's inner loop is pure scalar-indexed vector adds.

Semantics match ``score_volume`` exactly (same consecutive-duplicate-cell
dedup, same out-of-grid → 0 contribution with full-count normalization —
guaranteed by zero margins at least one patch wide on every side, so any
clamped anchor reads only padding). A parity test runs every variant in
interpret mode on CPU against the XLA path.

Variant history (all parity-exact; ``tools/bench_correlate.py`` times
them on chip — close-match volume, 65θ×25²×1024 pts on a 1200² grid):

* ``v0`` (round 3): per-point ``pl.when`` guard + aligned tile fetch +
  two dynamic rolls — ~11.5 ms.
* ``v1``: branchless (skips routed to the zero corner XLA-side) +
  8-wide unroll into independent accumulators — ~6.5 ms.
* ``v2``: the dynamic sublane roll becomes 8 phase-plane accumulators
  combined with STATIC rolls once per θ — ~6.2 ms.
* ``v3`` (default): anchors/phases precomputed XLA-side into SMEM
  (``pl.multiple_of`` carries the alignment proof), tile shrunk a full
  sublane quantum (phase planes never read past row ``dy+7``) — ~5.6 ms.
* ``v5`` (kept as a measured negative): accumulator as a ``fori_loop``
  register carry instead of VMEM scratch — the two dynamic rolls it
  reintroduces cost more than the saved read-modify-write (~6.2 ms).
* ``x1``/``x2`` timing probes (intentionally wrong results) bound the
  scheme's floor: no-roll ~4.7 ms, constant-anchor ~4.2 ms — the
  binding resource is the per-point dynamically-addressed VMEM fetch
  issue path, not VPU arithmetic (see PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_TCHUNK = 8  # θs per program — Mosaic wants SMEM sublane blocks of 8


def _make_kernel(dyp: int, dxp: int, n_points: int):
    """Mosaic only lowers *aligned* dynamic slices (sublane start %8,
    lane start %128), so each patch is fetched as the enclosing aligned
    [dyp+8, dxp+128] tile and realigned in-register with two dynamic
    rolls — the load and rolls are all full-width VPU ops.

    Skipped points (invalid beams, consecutive-duplicate cells, and any
    caller-side thinning such as grid-resolution subsampling) are
    GUARDED OUT with ``pl.when`` on the SMEM keep flag: the kernel's
    cost is proportional to points that actually contribute, not to the
    static P — measured ~35-50% of LC-search slots are skips."""
    dy2, dx2 = dyp + 8, dxp + 128

    def kernel(iy0_ref, ix0_ref, keep_ref, count_ref, grid_ref, out_ref,
               acc_ref):
        for tt in range(_TCHUNK):
            acc_ref[:] = jnp.zeros((dy2, dx2), jnp.float32)

            def body(p, _, tt=tt):
                @pl.when(keep_ref[tt, p] > 0)
                def _add():
                    y0 = iy0_ref[tt, p]
                    x0 = ix0_ref[tt, p]
                    ya = (y0 // 8) * 8
                    xa = (x0 // 128) * 128
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    tile = pltpu.roll(tile, dy2 - (y0 - ya), 0)
                    tile = pltpu.roll(tile, dx2 - (x0 - xa), 1)
                    acc_ref[:, :] += tile

                return _

            jax.lax.fori_loop(0, n_points, body, 0)
            out_ref[tt] = acc_ref[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


_UNROLL = 8  # points per fori_loop body in the branchless variants


def _make_kernel_v1(dyp: int, dxp: int, n_points: int):
    """Branchless + unrolled: skipped points are routed to the (0,0)
    zero-margin anchor XLA-side (their retained window reads only
    padding), so the ``pl.when`` branch — a scalar-pipeline bubble per
    point — goes away entirely. ``_UNROLL`` points per loop body feed
    round-robin into independent accumulators, breaking the
    add-after-add dependency chain so loads/rolls of consecutive points
    pipeline. Requires P padded to a multiple of ``_UNROLL``."""
    dy2, dx2 = dyp + 8, dxp + 128
    assert n_points % _UNROLL == 0

    def kernel(iy0_ref, ix0_ref, keep_ref, count_ref, grid_ref, out_ref,
               *accs):
        for tt in range(_TCHUNK):
            for a in accs:
                a[:] = jnp.zeros((dy2, dx2), jnp.float32)

            def body(i, _, tt=tt):
                for u in range(_UNROLL):
                    p = i * _UNROLL + u
                    y0 = iy0_ref[tt, p]
                    x0 = ix0_ref[tt, p]
                    ya = (y0 // 8) * 8
                    xa = (x0 // 128) * 128
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    tile = pltpu.roll(tile, dy2 - (y0 - ya), 0)
                    tile = pltpu.roll(tile, dx2 - (x0 - xa), 1)
                    accs[u][:, :] += tile
                return _

            jax.lax.fori_loop(0, n_points // _UNROLL, body, 0)
            tot = accs[0][:dyp, :dxp]
            for a in accs[1:]:
                tot = tot + a[:dyp, :dxp]
            out_ref[tt] = tot / count_ref[tt, 0]

    return kernel


def _make_kernel_v2(dyp: int, dxp: int, n_points: int):
    """v1 + sublane-phase planes: instead of the dynamic sublane roll,
    each point accumulates its tile (x-rolled only) into the plane of
    its y-phase ``y0 mod 8``; after the point loop the 8 planes are
    combined with STATIC sublane rolls (8 per θ instead of one dynamic
    roll per point). Dynamic rolls decompose into log-many conditional
    shifts on the VPU — the sublane one is pure overhead when the phase
    only spans 8 values."""
    dy2, dx2 = dyp + 8, dxp + 128
    assert n_points % _UNROLL == 0

    def kernel(iy0_ref, ix0_ref, keep_ref, count_ref, grid_ref, out_ref,
               planes):
        for tt in range(_TCHUNK):
            planes[:] = jnp.zeros((2 * 8, dy2, dx2), jnp.float32)

            def body(i, _, tt=tt):
                for u in range(_UNROLL):
                    p = i * _UNROLL + u
                    y0 = iy0_ref[tt, p]
                    x0 = ix0_ref[tt, p]
                    ya = (y0 // 8) * 8
                    ph = y0 - ya
                    xa = (x0 // 128) * 128
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    tile = pltpu.roll(tile, dx2 - (x0 - xa), 1)
                    slot = ph + 8 * (u % 2)   # 2 plane banks break the
                    planes[slot] += tile      # dependence on same-phase
                return _

            jax.lax.fori_loop(0, n_points // _UNROLL, body, 0)
            tot = jnp.zeros((dy2, dx2), jnp.float32)
            for ph in range(8):
                bank = planes[ph] + planes[ph + 8]
                tot = tot + pltpu.roll(bank, (dy2 - ph) % dy2, 0)
            out_ref[tt] = tot[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


def _make_kernel_v3(dyp: int, dxp: int, n_points: int):
    """v2 with the per-point scalar work minimized: the aligned anchors
    (ya, xa) and residual phases (ph, sx) are precomputed XLA-side and
    land in SMEM, so the loop body is two aligned loads of scalars, one
    aligned tile fetch, one dynamic lane roll, one plane add — no
    division/rounding on the scalar core per point. The tile is also a
    full sublane quantum shorter: the y-phase planes only ever retain
    rows ph..ph+dy-1 ≤ dyp-1, so the +8 sublane margin of v0-v2 (needed
    by the modular roll) is dead weight here."""
    dy2, dx2 = dyp, dxp + 128          # tight: dyp ≥ dy+7 by caller
    assert n_points % _UNROLL == 0

    def kernel(ya_ref, ph_ref, xa_ref, sx_ref, count_ref, grid_ref,
               out_ref, planes):
        for tt in range(_TCHUNK):
            planes[:] = jnp.zeros((2 * 8, dy2, dx2), jnp.float32)

            def body(i, _, tt=tt):
                for u in range(_UNROLL):
                    p = i * _UNROLL + u
                    ya = pl.multiple_of(ya_ref[tt, p], 8)
                    xa = pl.multiple_of(xa_ref[tt, p], 128)
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    tile = pltpu.roll(tile, dx2 - sx_ref[tt, p], 1)
                    planes[ph_ref[tt, p] + 8 * (u % 2)] += tile
                return _

            jax.lax.fori_loop(0, n_points // _UNROLL, body, 0)
            tot = jnp.zeros((dy2, dx2), jnp.float32)
            for ph in range(8):
                bank = planes[ph] + planes[ph + 8]
                tot = tot + pltpu.roll(bank, (dy2 - ph) % dy2, 0)
            out_ref[tt] = tot[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


def _make_kernel_x1(dyp: int, dxp: int, n_points: int):
    """TIMING PROBE ONLY (wrong results): v3 without the dynamic lane
    roll — isolates whether the roll or the scalar-issue path bounds the
    per-point cost."""
    dy2, dx2 = dyp, dxp + 128
    assert n_points % _UNROLL == 0

    def kernel(ya_ref, ph_ref, xa_ref, sx_ref, count_ref, grid_ref,
               out_ref, planes):
        for tt in range(_TCHUNK):
            planes[:] = jnp.zeros((2 * 8, dy2, dx2), jnp.float32)

            def body(i, _, tt=tt):
                for u in range(_UNROLL):
                    p = i * _UNROLL + u
                    ya = pl.multiple_of(ya_ref[tt, p], 8)
                    xa = pl.multiple_of(xa_ref[tt, p], 128)
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    planes[ph_ref[tt, p] + 8 * (u % 2)] += tile
                return _

            jax.lax.fori_loop(0, n_points // _UNROLL, body, 0)
            tot = jnp.zeros((dy2, dx2), jnp.float32)
            for ph in range(8):
                bank = planes[ph] + planes[ph + 8]
                tot = tot + pltpu.roll(bank, (dy2 - ph) % dy2, 0)
            out_ref[tt] = tot[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


def _make_kernel_x2(dyp: int, dxp: int, n_points: int):
    """TIMING PROBE ONLY (wrong results): x1 with CONSTANT anchors —
    isolates the dynamic-address path (SMEM scalar reads + slice address
    generation) from the raw load+accumulate cost."""
    dy2, dx2 = dyp, dxp + 128
    assert n_points % _UNROLL == 0

    def kernel(ya_ref, ph_ref, xa_ref, sx_ref, count_ref, grid_ref,
               out_ref, planes):
        for tt in range(_TCHUNK):
            planes[:] = jnp.zeros((2 * 8, dy2, dx2), jnp.float32)

            def body(i, _, tt=tt):
                for u in range(_UNROLL):
                    tile = grid_ref[pl.ds(8 * u, dy2),
                                    pl.ds(128 * (u % 3), dx2)]
                    planes[(u % 8) + 8 * (u % 2)] += tile
                return _

            jax.lax.fori_loop(0, n_points // _UNROLL, body, 0)
            tot = jnp.zeros((dy2, dx2), jnp.float32)
            for ph in range(8):
                bank = planes[ph] + planes[ph + 8]
                tot = tot + pltpu.roll(bank, (dy2 - ph) % dy2, 0)
            out_ref[tt] = tot[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


def _make_kernel_v5(dyp: int, dxp: int, n_points: int):
    """Loop-carried REGISTER accumulator: v3's plane accumulate is a
    VMEM read-modify-write (~24 reg-ops per point — load plane, add,
    store), which the x2 probe exposed as the dominant static cost. Here
    the accumulator rides the ``fori_loop`` carry as a VALUE, so the
    accumulate is a pure register add; the sublane phase returns to a
    dynamic roll (measured cheap — 3 select steps over an 8-range)."""
    dy2, dx2 = dyp + 8, dxp + 128
    assert n_points % _UNROLL == 0

    def kernel(iy0_ref, ix0_ref, keep_ref, count_ref, grid_ref, out_ref,
               _scratch):
        for tt in range(_TCHUNK):
            def body(i, accs, tt=tt):
                a0, a1 = accs
                for u in range(_UNROLL):
                    p = i * _UNROLL + u
                    y0 = iy0_ref[tt, p]
                    x0 = ix0_ref[tt, p]
                    ya = (y0 // 8) * 8
                    xa = (x0 // 128) * 128
                    tile = grid_ref[pl.ds(ya, dy2), pl.ds(xa, dx2)]
                    tile = pltpu.roll(tile, dy2 - (y0 - ya), 0)
                    tile = pltpu.roll(tile, dx2 - (x0 - xa), 1)
                    if u % 2 == 0:
                        a0 = a0 + tile
                    else:
                        a1 = a1 + tile
                return (a0, a1)

            z = jnp.zeros((dy2, dx2), jnp.float32)
            a0, a1 = jax.lax.fori_loop(0, n_points // _UNROLL, body,
                                       (z, z))
            out_ref[tt] = (a0 + a1)[:dyp, :dxp] / count_ref[tt, 0]

    return kernel


_KERNELS = {"v0": _make_kernel, "v1": _make_kernel_v1,
            "v2": _make_kernel_v2, "v3": _make_kernel_v3,
            "v5": _make_kernel_v5,
            "x1": _make_kernel_x1, "x2": _make_kernel_x2}
VARIANTS = ("v0", "v1", "v2", "v3", "v5")
PROBE_VARIANTS = ("x1", "x2")  # timing probes — intentionally wrong


def _scratch_for(variant: str, dyp: int, dxp: int):
    dy2, dx2 = dyp + 8, dxp + 128
    if variant == "v0":
        return [pltpu.VMEM((dy2, dx2), jnp.float32)]
    if variant == "v1":
        return [pltpu.VMEM((dy2, dx2), jnp.float32)
                for _ in range(_UNROLL)]
    if variant in ("v3", "x1", "x2"):
        return [pltpu.VMEM((2 * 8, dyp, dx2), jnp.float32)]
    return [pltpu.VMEM((2 * 8, dy2, dx2), jnp.float32)]


def _tile_elems(dy: int, dx: int) -> int:
    """Elements of the aligned fetch tile serving a [dy, dx] window."""
    return (_round_up(dy, 8) + 8) * (_round_up(dx, 128) + 128)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "n_theta", "ry", "rx", "interpret",
                     "variant"),
)
def _pallas_volume_oriented(grid, center, points, valid, base, thetas, *,
                            resolution, n_theta, ry, rx, interpret,
                            variant="v3"):
    """Orientation dispatcher: the kernel's per-point fetch tile pads the
    window to (⌈dy/8⌉·8+8) sublanes × (⌈dx/128⌉·128+128) lanes, so a tall
    skinny window (the LC search: 31×11) wastes ~1.7× less when its LONG
    axis rides the lanes (lanes are a flat 256 for any dx ≤ 128 while
    sublanes grow in steps of 8). When the transposed orientation fetches
    fewer elements, run the kernel on the transposed grid with the axis
    roles swapped and transpose the volume back — exact, not an
    approximation (the score sum is axis-symmetric)."""
    dy, dx = 2 * ry + 1, 2 * rx + 1
    if _tile_elems(dx, dy) < _tile_elems(dy, dx):
        # swapped run: sublanes carry x / window rx, lanes carry y / ry.
        # grid.T[x, y]; points/base/center with coords swapped so the
        # kernel's "wx"→lane-axis math lands on the original y axis.
        vol = _pallas_volume(
            grid.T, center[::-1], points[:, ::-1], valid,
            jnp.stack([base[1], base[0], -base[2]]), -thetas,
            resolution=resolution, n_theta=n_theta, ry=rx, rx=ry,
            interpret=interpret, variant=variant)     # [T, dx, dy]
        return jnp.swapaxes(vol, -1, -2)
    return _pallas_volume(grid, center, points, valid, base, thetas,
                          resolution=resolution, n_theta=n_theta,
                          ry=ry, rx=rx, interpret=interpret,
                          variant=variant)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "n_theta", "ry", "rx", "interpret",
                     "variant"),
)
def _pallas_volume(grid, center, points, valid, base, thetas, *,
                   resolution, n_theta, ry, rx, interpret,
                   variant="v3"):
    cells = grid.shape[0]
    dy, dx = 2 * ry + 1, 2 * rx + 1
    # v3 retains tile rows ph..ph+dy-1 directly (no modular sublane
    # roll), so its tile is exactly dyp sublanes with dyp ≥ dy+7; the
    # rolling variants need the +8 overshoot row block on top of dyp.
    dyp = (_round_up(dy + 7, 8) if variant in ("v3", "x1", "x2")
           else _round_up(dy, 8))
    dxp = _round_up(dx, 128)
    my = dyp            # zero margin ≥ one patch: clamped reads stay in it
    mx = dxp
    # +8 rows / +128 lanes: aligned tile fetches overshoot the anchor by
    # up to one alignment quantum past the clip limit
    hp = cells + 2 * my + 8
    wp = _round_up(cells + 2 * mx, 128) + 128

    g = jnp.zeros((hp, wp), jnp.float32)
    g = g.at[my:my + cells, mx:mx + cells].set(grid.astype(jnp.float32))

    # --- XLA-side index precompute: cells of every point under every θ ---
    ang = base[2] + thetas.astype(jnp.float32)            # [T]
    c, s = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]   # [T,1]
    px = points[:, 0].astype(jnp.float32)[None, :]        # [1,P]
    py = points[:, 1].astype(jnp.float32)[None, :]
    wx = c * px - s * py + base[0]
    wy = s * px + c * py + base[1]
    half = cells / 2.0
    ix = jnp.floor((wx - center[0]) / resolution + half).astype(jnp.int32)
    iy = jnp.floor((wy - center[1]) / resolution + half).astype(jnp.int32)

    # consecutive-duplicate-cell dedup (reference chargrid.cpp:242-258)
    same = (ix == jnp.roll(ix, 1, 1)) & (iy == jnp.roll(iy, 1, 1))
    same = same.at[:, 0].set(False)
    keep = valid[None, :] & ~same                          # [T,P]
    count = jnp.maximum(jnp.sum(keep, axis=1), 1).astype(jnp.float32)

    iy0 = jnp.clip(iy - ry + my, 0, hp - dyp - 8)
    ix0 = jnp.clip(ix - rx + mx, 0, wp - dxp - 128)
    # skipped points are branch-guarded in the kernel (pl.when); the
    # zeroed anchors are belt-and-braces (a skipped slot that somehow
    # executed would read the all-zero corner and contribute nothing)
    iy0 = jnp.where(keep, iy0, 0)
    ix0 = jnp.where(keep, ix0, 0)

    p = points.shape[0]
    if variant != "v0":               # unrolled variants need P % UNROLL
        p = _round_up(p, _UNROLL)
        pad_p = [(0, 0), (0, p - iy0.shape[1])]
        iy0 = jnp.pad(iy0, pad_p)     # padded points read the zero corner
        ix0 = jnp.pad(ix0, pad_p)
        keep = jnp.pad(keep, pad_p)
    tp = _round_up(n_theta, _TCHUNK)
    pad_t = [(0, tp - n_theta), (0, 0)]
    iy0 = jnp.pad(iy0, pad_t)          # padded θs read the zero corner
    ix0 = jnp.pad(ix0, pad_t)
    keep_i = jnp.pad(keep.astype(jnp.int32), pad_t)  # padded θs all skip
    count = jnp.pad(count, (0, tp - n_theta), constant_values=1.0)

    smem = lambda: pl.BlockSpec((_TCHUNK, p), lambda t: (t, 0),
                                memory_space=pltpu.SMEM)
    if variant in ("v3", "x1", "x2"):
        ya = (iy0 // 8) * 8
        ins = (ya, iy0 - ya, (ix0 // 128) * 128, ix0 % 128)
    else:
        ins = (iy0, ix0, keep_i)
    out = pl.pallas_call(
        _KERNELS[variant](dyp, dxp, p),
        grid=(tp // _TCHUNK,),
        in_specs=[smem() for _ in ins] + [
            pl.BlockSpec((_TCHUNK, 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),          # count
            pl.BlockSpec((hp, wp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),          # grid (resident)
        ],
        out_specs=pl.BlockSpec((_TCHUNK, dyp, dxp), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, dyp, dxp), jnp.float32),
        scratch_shapes=_scratch_for(variant, dyp, dxp),
        cost_estimate=pl.CostEstimate(
            flops=tp * p * dyp * dxp,
            bytes_accessed=tp * p * dyp * dxp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*ins, count[:, None], g)
    return out[:n_theta, :dy, :dx]


def pallas_score_volume(grid: jax.Array, center: jax.Array,
                        resolution: float, points: jax.Array,
                        valid: jax.Array, base: jax.Array,
                        thetas: jax.Array, ty_cells, tx_cells, *,
                        interpret: bool = False,
                        variant: str = "v3") -> jax.Array:
    """Drop-in for :func:`matcher.search.score_volume` on step-1 lattices.

    ``ty_cells``/``tx_cells`` must be contiguous symmetric ranges
    ``[-r..r]`` (their lengths fix the static patch shape).
    """
    ry = (len(ty_cells) - 1) // 2
    rx = (len(tx_cells) - 1) // 2
    return _pallas_volume_oriented(
        grid, center, points, valid, base, thetas,
        resolution=float(resolution), n_theta=len(thetas),
        ry=ry, rx=rx, interpret=interpret, variant=variant)


def lattice_is_contiguous(cells_arr) -> bool:
    """True when a translation lattice is a step-1 symmetric range."""
    a = np.asarray(cells_arr)
    if a.ndim != 1 or len(a) % 2 == 0:
        return False
    r = (len(a) - 1) // 2
    return bool(np.array_equal(a, np.arange(-r, r + 1)))


def pallas_score_volume_strided(grid: jax.Array, center: jax.Array,
                                resolution: float, points: jax.Array,
                                valid: jax.Array, base: jax.Array,
                                thetas: jax.Array, ty_cells, tx_cells, *,
                                interpret: bool = False,
                                variant: str = "v3") -> jax.Array:
    """Score volume for an ARBITRARY (e.g. strided) translation lattice.

    The patch kernel's per-point cost is one aligned tile fetch covering
    the whole window span — independent of how many offsets the lattice
    keeps — so a strided lattice (the coarse levels of
    ``hierarchicalSearch``, reference ``chargrid.cpp:346-375``) is served
    by accumulating the full contiguous span and slicing out the strided
    entries. Beats the XLA gather path by the same margin as the
    contiguous case (the gather volume is T·Dy·Dx·P regardless of span).

    ``ty_cells``/``tx_cells`` are static numpy int lattices (symmetric,
    any stride)."""
    ty = np.asarray(ty_cells)
    tx = np.asarray(tx_cells)
    ry = int(max(ty.max(), -ty.min()))
    rx = int(max(tx.max(), -tx.min()))
    vol = _pallas_volume_oriented(
        grid, center, points, valid, base, thetas,
        resolution=float(resolution), n_theta=len(thetas),
        ry=ry, rx=rx, interpret=interpret,
        variant=variant)                            # [T, 2ry+1, 2rx+1]
    return vol[:, ty + ry][:, :, tx + rx]
