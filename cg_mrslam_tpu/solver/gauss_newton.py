"""Batched dense Gauss–Newton / Levenberg–Marquardt for SE(2) pose graphs.

TPU-native replacement for the reference's optimization engine:
g2o ``SparseOptimizer`` + ``BlockSolver<-1,-1>`` + ``LinearSolverCSparse`` +
``OptimizationAlgorithmGaussNewton`` (built at
``/root/reference/src/slam/graph_slam.cpp:44-55``, driven by ``optimize(n)``
at ``:561-574``, with edge-subset solves at
``graph_manipulator.cpp:116-124``).

Design: the graph has static capacity ``N`` vertices, so the Hessian is a
dense ``[3N, 3N]`` matrix assembled by one scatter-add of per-edge 3×3
blocks, solved with Cholesky. Dense-Cholesky is the right call at
hospital scale (N ≤ ~1k): the whole solve is a handful of large fused XLA
ops (batched matmul-like) that ``vmap`` turns into thousands of concurrent
graph solves per chip — the batched-throughput claim of this framework.
A matrix-free PCG path (``solver/pcg.py``) covers the 100k-pose regime
where dense H no longer fits.

Gauge handling matches g2o: fixed vertices get zero update (their rows/cols
are masked and replaced by identity so Cholesky stays PD); unused capacity
slots are handled identically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.core.graph import PoseGraph, unpack_info

# EVERY matmul-shaped op in the normal-equation path runs at full-f32
# MXU precision: default bf16 multiplicands corrupt the assembly at
# production coordinate scales (lever-arm products ~(20 m)^2 x 1e4
# information reach ~4e6, where bf16's 0.4% relative noise injects
# fake gradients that GROW with distance from the origin — measured
# on chip: a pure odometry chain diverged chi2 1e-4 -> 1 -> 4e6 ->
# NaN between keyframes 55-60 at x~20 m, identically under Cholesky
# and the matmul inverse, i.e. upstream of the solve; f32 CPU is
# clean. Same convention as solver/spd.py and solver/chain.py.)
_es = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
from cg_mrslam_tpu.core.linearize import chi2, linearize


class NormalEq(NamedTuple):
    H: jax.Array  # [3N, 3N]
    b: jax.Array  # [3N]      (gradient: Σ Jᵀ Ω e)
    free3: jax.Array  # [3N] float — 1.0 on free coordinates


def _free_mask(g: PoseGraph, edge_mask: jax.Array) -> jax.Array:
    """Free (optimizable) vertices: live, not gauge-fixed, and touched by
    at least one active edge (unconstrained vertices — e.g. foreign
    vertices parked before their first closure — would make H singular,
    so they are pinned like fixed vertices)."""
    n = g.poses.shape[0]
    deg = jnp.zeros((n,), jnp.int32)
    em = edge_mask.astype(jnp.int32)
    deg = deg.at[g.e_ij[:, 0]].add(em)
    deg = deg.at[g.e_ij[:, 1]].add(em)
    return g.vmask & ~g.fixed & (deg > 0)


def build_normal_equations(
    g: PoseGraph, edge_mask: jax.Array | None = None
) -> NormalEq:
    """Assemble H = Σ JᵀΩJ and b = Σ JᵀΩe over active edges.

    TPU-shaped assembly: instead of scatter-adding 4·E 3×3 blocks (TPU
    scatters with duplicate indices serialize — measured 65% of solve
    time), contributions are accumulated with one-hot selection matmuls:
    ``H[n,i,m,j] = Σ_e O_a[e,n]·Hab[e,i,j]·O_b[e,m]`` is nine [N,E]×[E,N]
    matmuls per block pair — pure MXU work. This replaces g2o's per-edge
    ``constructQuadraticForm`` virtual dispatch. Fine for the dense-solver
    regime (N ≤ ~1k, where O[E,N] is small); the large-graph PCG path
    keeps scatter-based products (O(E) memory, no [E,N] blowup).
    """
    n = g.poses.shape[0]
    emask_b = g.emask if edge_mask is None else edge_mask
    mask = emask_b.astype(g.poses.dtype)

    e, Ji, Jj = linearize(g.poses, g.e_ij, g.e_z)
    omega = unpack_info(g.e_info) * mask[:, None, None]

    JiT_O = _es("eki,ekl->eil", Ji, omega)  # Jᵢᵀ Ω  [E,3,3]
    JjT_O = _es("eki,ekl->eil", Jj, omega)

    Hii = _es("eil,elj->eij", JiT_O, Ji)
    Hij = _es("eil,elj->eij", JiT_O, Jj)
    Hjj = _es("eil,elj->eij", JjT_O, Jj)
    bi = _es("eil,el->ei", JiT_O, e)
    bj = _es("eil,el->ei", JjT_O, e)

    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    Oi = jax.nn.one_hot(vi, n, dtype=g.poses.dtype)  # [E, N]
    Oj = jax.nn.one_hot(vj, n, dtype=g.poses.dtype)

    Hb = (
        _es("en,eij,em->nimj", Oi, Hii, Oi)
        + _es("en,eij,em->nimj", Oi, Hij, Oj)
        + _es("en,eij,em->njmi", Oj, Hij, Oi)
        + _es("en,eij,em->nimj", Oj, Hjj, Oj)
    )
    H = Hb.reshape(3 * n, 3 * n)

    bv = _es("en,ei->ni", Oi, bi) + _es("en,ei->ni", Oj, bj)
    b = bv.reshape(3 * n)

    free3 = jnp.repeat(_free_mask(g, emask_b), 3).astype(g.poses.dtype)
    return NormalEq(H=H, b=b, free3=free3)


def _gauge_fix(H: jax.Array, b: jax.Array, free3: jax.Array):
    """Project out fixed/unused coordinates; unit diagonal keeps H PD."""
    Hf = H * free3[:, None] * free3[None, :]
    Hf = Hf + jnp.diag(1.0 - free3)
    return Hf, b * free3


def _use_cholesky() -> bool:
    import os

    return os.environ.get("CG_MRSLAM_CHOLESKY", "0") == "1"


def solve_normal_equations(eq: NormalEq, damping: jax.Array | float = 0.0,
                           chol: bool = False):
    """dx = -(H + λ·diag-aug)⁻¹ b. λ=0 → pure Gauss–Newton.

    Default path: explicit SPD inverse by recursive block-Schur matmuls
    (``solver.spd``) — on TPU, XLA's Cholesky/triangular-solve chain is
    latency-bound (~57 ms per batched iteration at [1024,192,192] while
    the MXU idles); the matmul inverse turns the solve into MXU work.
    The inverse then serves as preconditioner + warm start for a short
    dense-CG polish (``spd.pcg_refine``): near-free when the inverse is
    accurate, and the rescue when f32 conditioning defeats it (a real
    multi-robot Hessian with a condensed-star hub reached κ≈3·10⁵, where
    the raw inverse came back with O(1) residual on TPU).
    ``chol=True`` (or ``CG_MRSLAM_CHOLESKY=1`` globally) selects the
    factorization path instead: the right call at BATCH 1 — the live
    engine — where a single [768²] cho_factor+solve is ~0.2 ms on chip
    while the block-Schur inverse chain costs ~8 ms (the inverse's
    advantage is batched throughput, where vmapped Cholesky's serial
    triangular chain starves the MXU)."""
    H, b = _gauge_fix(eq.H, eq.b, eq.free3)
    lam = jnp.asarray(damping, H.dtype)
    H = H + lam * jnp.eye(H.shape[0], dtype=H.dtype) * eq.free3[:, None]
    if chol or _use_cholesky():
        L = jax.scipy.linalg.cho_factor(H, lower=True)
        dx = -jax.scipy.linalg.cho_solve(L, b)
    else:
        from cg_mrslam_tpu.solver.spd import pcg_refine, spd_inverse

        minv = spd_inverse(H)
        dx = -pcg_refine(H, b[..., None], minv)[..., 0]
    return dx * eq.free3


def gn_step(g: PoseGraph, edge_mask: jax.Array | None = None,
            damping: jax.Array | float = 0.0,
            chol: bool = False) -> PoseGraph:
    """One linearize → solve → oplus update (g2o GN iteration)."""
    eq = build_normal_equations(g, edge_mask)
    dx = solve_normal_equations(eq, damping, chol=chol)
    from cg_mrslam_tpu.utils import se2  # local import to avoid cycle

    new_poses = se2.oplus(g.poses, dx.reshape(-1, 3))
    return dataclasses.replace(g, poses=new_poses)


@partial(jax.jit, static_argnames=("iterations", "chol"))
def optimize(g: PoseGraph, iterations: int = 5,
             edge_mask: jax.Array | None = None,
             chol: bool = False) -> PoseGraph:
    """``GraphSLAM::optimize(n)`` equivalent: n Gauss–Newton iterations
    (reference ``graph_slam.cpp:561-574``).

    The explicit SPD inverse (the latency-dominant serial chain of the
    dense solve — measured ~62 ms of a 76 ms keyframe device budget at
    bucket 256 across the three solver stages) is computed ONCE, for
    the first linearization, and the remaining iterations reuse it as
    the ``pcg_refine`` preconditioner on each iteration's FRESH normal
    equations. CG iterates on the true current H, so staleness costs
    only CG steps (poses move little between GN iterations — the
    preconditioner stays within a few percent of exact), never
    correctness: the tol exit (relative 1e-5) is the same bar the
    single-inverse path meets. Parity suites pass unchanged."""
    if iterations <= 0:  # no-op, matching g2o optimize(0) semantics
        return g
    if chol or _use_cholesky():
        def body(gg, _):
            return gn_step(gg, edge_mask, chol=True), None

        g, _ = jax.lax.scan(body, g, None, length=iterations)
        return g

    from cg_mrslam_tpu.solver.spd import pcg_refine, spd_inverse
    from cg_mrslam_tpu.utils import se2

    def prepare(gg):
        eq = build_normal_equations(gg, edge_mask)
        H, b = _gauge_fix(eq.H, eq.b, eq.free3)
        return eq, H, b

    eq, H, b = prepare(g)
    minv = spd_inverse(H)

    def solve_update(gg, H, b, free3):
        # tighter tol than the one-shot solve path: with a one-GN-
        # iteration-stale preconditioner CG converges in a few extra
        # cheap [3N,3N]x[3N,1] matmuls, and the tighter exit keeps the
        # reused-inverse iterations numerically indistinguishable from
        # the invert-every-iteration path (a 1e-5 exit left enough slack
        # for differently-fused programs to flip near-tied matcher
        # argmaxes downstream — caught by test_fleet_sim's ATE pin)
        dx = -pcg_refine(H, b[:, None], minv, tol=1e-7)[:, 0] * free3
        return dataclasses.replace(
            gg, poses=se2.oplus(gg.poses, dx.reshape(-1, 3)))

    g = solve_update(g, H, b, eq.free3)

    def body(gg, _):
        eq2, H2, b2 = prepare(gg)
        return solve_update(gg, H2, b2, eq2.free3), None

    g, _ = jax.lax.scan(body, g, None, length=iterations - 1)
    return g


# Capacity bands for optimize_auto (static — chosen at trace time from
# the graph's CAPACITY, which is what determines the cost of each
# backend regardless of live count):
#   dense    : N ≤ DENSE_MAX — one [3N,3N] inverse feeding vmap batches
#   chain    : DENSE_MAX < N ≤ PCG_MIN and the graph is an odometry
#              chain + closures — O(N) cyclic reduction (solver/chain.py)
#   PCG      : N > PCG_MIN — dense H no longer fits / pays
# Round-4: 256 (was 512). With assembly pinned to full-f32 MXU precision
# the dense band's one-hot einsums got materially heavier, and the live
# 512-bucket measured p50 140.8 ms dense vs 96.4 ms for the chain band
# at 1024 — the chain/PCG band is now the faster AND numerically safer
# choice from 512 up.
DENSE_MAX = 256
# The batch-1 Cholesky band reaches further: a single [1536^2]
# cho_factor+solve is ~11 ms device for GN x5 where the chain band costs
# ~14 and the SPD-inverse dense path 141 (all measured on chip at
# capacity 512) — so the LIVE path (chol=True) stays dense one bucket
# longer. At 1024 the factorization's serial panel chain loses to the
# chain band (66 vs 47 ms) and both bands agree chain is right.
DENSE_MAX_CHOL = 512
# (A split band — factorized marginals up to 1024 while the optimizer
# stays chain — was measured on chip and does NOT pay: bucket-1024 p50
# 94.9 vs 96.6 ms, within run noise. The gate is not the 1024-bucket
# bottleneck; both operations share DENSE_MAX_CHOL.)
PCG_MIN = 4096


def _dense_max(chol: bool) -> int:
    return DENSE_MAX_CHOL if chol else DENSE_MAX


def auto_backend(g: PoseGraph, edge_mask: jax.Array | None = None,
                 loop_cap: int = 64,
                 order: jax.Array | None = None,
                 chol: bool = False) -> jax.Array:
    """Which backend :func:`optimize_auto` takes on this graph —
    ``0`` dense, ``1`` chain+Woodbury, ``2`` PCG (int32, traceable).
    Exposed so callers (``pipeline.slam.keyframe_step`` → ``StepInfo``)
    can report the selection instead of asking tests to infer it from
    f32 rounding patterns."""
    n = g.poses.shape[-2]
    if n > PCG_MIN:
        return jnp.int32(2)
    if n <= _dense_max(chol):
        return jnp.int32(0)
    from cg_mrslam_tpu.solver import chain as CH

    # chain band: 1 if the permuted fast path is exact, else PCG (2) —
    # NOT dense: a [3N,3N] inverse past DENSE_MAX is both the cost the
    # band exists to avoid and numerically unsafe on the chip (measured
    # round 2: dense N=1024 f32 on TPU returns garbage chi2 ~1e23, and a
    # live-pipeline fixture run that hit this fallback NaN'd its state).
    return jnp.where(
        CH.chainable(g, edge_mask, loop_cap=loop_cap, order=order),
        jnp.int32(1), jnp.int32(2))


def optimize_auto(g: PoseGraph, iterations: int = 5,
                  edge_mask: jax.Array | None = None,
                  loop_cap: int = 64,
                  order: jax.Array | None = None,
                  pcg_iters: int = 96,
                  chain_cg_iters: int = 48,
                  chain_cg_tol: float = 1e-6,
                  chol: bool = False) -> PoseGraph:
    """``optimize`` with a scale-appropriate backend.

    Static capacity picks the band; inside the chain band a runtime
    :func:`cg_mrslam_tpu.solver.chain.chainable` check falls back to the
    dense solver when the fast path would not be exact (loop-cap
    overflow, or a dense-solvable vertex not covered by the truncated
    system). ``order`` is the slot permutation that makes real
    multi-robot merged graphs block-tridiagonal
    (:func:`cg_mrslam_tpu.solver.chain.chain_order`); without it the
    slot order itself must be chain-adjacent. All three backends
    implement the same GN semantics; the parity suites pin dense, the
    chain tests pin chain ≡ dense.
    """
    n = g.poses.shape[-2]
    if n > PCG_MIN:
        from cg_mrslam_tpu.solver.pcg import optimize_pcg

        return optimize_pcg(g, iterations=iterations, edge_mask=edge_mask,
                            cg_iters=pcg_iters, order=order)
    if n <= _dense_max(chol):
        return optimize(g, iterations, edge_mask, chol=chol)
    from cg_mrslam_tpu.solver import chain as CH
    from cg_mrslam_tpu.solver.pcg import optimize_pcg

    # Non-chainable fallback is PCG, not dense — see auto_backend: the
    # dense inverse past DENSE_MAX is the O(N^3) this band avoids AND
    # diverges on the chip at this scale (f32 garbage, measured). The
    # permutation rides along: PCG's tridiagonal preconditioner keys on
    # slot-adjacent edges exactly like the chain solver.
    return jax.lax.cond(
        CH.chainable(g, edge_mask, loop_cap=loop_cap, order=order),
        lambda gg: CH.optimize_chain(gg, iterations=iterations,
                                     edge_mask=edge_mask,
                                     loop_cap=loop_cap, order=order,
                                     cg_iters=chain_cg_iters,
                                     cg_tol=chain_cg_tol),
        lambda gg: optimize_pcg(gg, iterations=iterations,
                                edge_mask=edge_mask, cg_iters=pcg_iters,
                                order=order),
        g)


def marginal_covariance_auto(g: PoseGraph, query: jax.Array,
                             edge_mask: jax.Array | None = None,
                             loop_cap: int = 64,
                             order: jax.Array | None = None,
                             chain_cg_iters: int = 64,
                             chain_cg_tol: float = 1e-5,
                             pcg_cg_iters: int = 160,
                             chol: bool = False) -> jax.Array:
    """``marginal_covariance`` with a scale-appropriate backend, same
    banding as :func:`optimize_auto`: dense column solves up to
    ``DENSE_MAX`` capacity; above it, chain-preconditioned CG column
    solves (``solver.chain.marginal_covariance_chain``) when the graph
    is covered, matrix-free block-Jacobi PCG otherwise — the covariance
    gate stops being the last O(N³) stage of large-bucket keyframes.
    The fallback is NOT dense: past ``DENSE_MAX`` the [3N,3N] inverse
    produces f32 garbage on the chip (measured — NaN star information
    matrices from ``mr.condensed.condense`` once poisoned both robots
    of a fleet through one exchange round)."""
    n = g.poses.shape[-2]
    if n <= _dense_max(chol):
        return marginal_covariance(g, query, edge_mask, chol=chol)
    from cg_mrslam_tpu.solver import chain as CH
    from cg_mrslam_tpu.solver.pcg import marginal_covariance_pcg

    return jax.lax.cond(
        CH.chainable(g, edge_mask, loop_cap=loop_cap, order=order),
        lambda gg: CH.marginal_covariance_chain(
            gg, query, edge_mask, loop_cap=loop_cap, order=order,
            cg_iters=chain_cg_iters, cg_tol=chain_cg_tol),
        lambda gg: marginal_covariance_pcg(gg, query, edge_mask,
                                           cg_iters=pcg_cg_iters,
                                           order=order),
        g)


class LMState(NamedTuple):
    graph: PoseGraph
    lam: jax.Array
    chi2: jax.Array


@partial(jax.jit, static_argnames=("iterations",))
def optimize_lm(g: PoseGraph, iterations: int = 10,
                edge_mask: jax.Array | None = None,
                init_lambda: float = 1e-4) -> PoseGraph:
    """Levenberg–Marquardt with multiplicative lambda schedule.

    Robustness upgrade over the reference's plain GN for poorly
    initialized graphs; not used on the parity path.
    """
    mask = g.emask if edge_mask is None else edge_mask

    def body(state: LMState, _):
        gg = state.graph
        trial = gn_step(gg, mask, damping=state.lam)
        c_new = chi2(trial, mask)
        accept = c_new < state.chi2
        new_graph = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), trial, gg
        )
        lam = jnp.where(accept, state.lam * 0.5, state.lam * 4.0)
        c = jnp.where(accept, c_new, state.chi2)
        return LMState(new_graph, lam, c), None

    st = LMState(g, jnp.asarray(init_lambda, g.poses.dtype), chi2(g, mask))
    st, _ = jax.lax.scan(body, st, None, length=iterations)
    return st.graph


def marginal_covariance(
    g: PoseGraph, query: jax.Array, edge_mask: jax.Array | None = None,
    chol: bool = False,
) -> jax.Array:
    """Marginal 3×3 covariance blocks of the queried vertices.

    Replaces g2o ``computeMarginals`` as used by ``CovarianceEstimator``
    (reference ``graph_manipulator.cpp:128-157``): covariance of each query
    vertex under the current linearization with the current gauge fixed.
    ``query`` is ``[Q]`` int32 vertex indices; returns ``[Q, 3, 3]``.

    Dense realisation: columns of H⁻¹ for the queried coordinates via one
    Cholesky factorisation + batched triangular solves.
    """
    eq = build_normal_equations(g, edge_mask)
    H, _ = _gauge_fix(eq.H, eq.b, eq.free3)
    # tiny jitter: a free vertex connected only within a gauge-less edge
    # subset (degenerate caller input) keeps H invertible instead of
    # producing NaN covariances that would poison downstream consumers
    H = H + 1e-6 * jnp.eye(H.shape[0], dtype=H.dtype)
    cols = (3 * query)[:, None] + jnp.arange(3)[None, :]  # [Q,3]
    n3 = H.shape[0]
    if chol or _use_cholesky():
        L = jax.scipy.linalg.cho_factor(H, lower=True)
        rhs = jax.nn.one_hot(cols.reshape(-1), n3,
                             dtype=H.dtype).T           # [3N, 3Q]
        X = jax.scipy.linalg.cho_solve(L, rhs)  # [3N, 3Q]
        q = query.shape[0]
        Xq = X[cols.reshape(-1)].reshape(q, 3, q, 3)
        return Xq[jnp.arange(q), :, jnp.arange(q), :]  # [Q,3,3] diagonal
    from cg_mrslam_tpu.solver.spd import pcg_refine, spd_inverse

    hinv = spd_inverse(H)
    # the queried COLUMNS of H⁻¹, refined to solve-quality (the explicit
    # inverse alone can be off at high condition — see pcg_refine)
    rhs = jax.nn.one_hot(cols.reshape(-1), n3, dtype=H.dtype).T  # [3N,3Q]
    X = pcg_refine(H, rhs, hinv)                         # [3N, 3Q]
    q = query.shape[0]
    Xq = X[cols.reshape(-1)].reshape(q, 3, q, 3)
    return Xq[jnp.arange(q), :, jnp.arange(q), :]        # [Q,3,3] diagonal
