"""Chain + Woodbury Gauss–Newton: the hospital-scale fast path.

A SLAM pose graph is an odometry CHAIN (edges k→k+1, the bulk) plus a few
LOOP closures. Its GN Hessian is therefore block-tridiagonal plus a
low-rank term:

    H = H_chain + Aᵀ Ω_L A,       A = loop-edge Jacobians (3M × 3N)

The dense solver (``solver/gauss_newton.py``) costs O(N³) per graph —
right for small graphs in huge batches, hopeless at hospital scale
(N ≈ 1k, BASELINE.md's throughput row). This solver exploits the
structure the reference's CSparse Cholesky discovers numerically, but in
closed form:

* ``H_chain + λI`` factors by **block cyclic reduction**: log₂(N)
  levels, each eliminating the odd-indexed blocks with batched dense
  super-block ops over the WHOLE remaining chain — O(N) FLOPs at
  O(log N) sequential depth. (A block-Thomas ``lax.scan`` is the
  textbook O(N) alternative, but its N sequential micro-steps are
  latency-bound on TPU — measured 126 hospital-scale solves/s vs
  thousands for cyclic reduction.)
* the loop-closure correction applies the **Woodbury identity** with one
  ``[3M, 3M]`` SPD solve (M = loop edges): MXU work, tiny next to dense
  H⁻¹ since M ≪ N.
* the damped chain+Woodbury inverse is the PRECONDITIONER of a short
  **CG iteration on the true H**. The λI damping is what makes the f32
  factorization trustworthy (the raw open chain is floppy — κ grows
  ~N³ — and its f32 CR solve carries O(1) relative error at N=1024,
  measured as GN divergence to NaN on chip); CG restores exactness to
  solver tolerance regardless, at κ(M·H) ≈ 1 + λ/λ_min(H) — single
  digits for loop-closed graphs, so it converges in a handful of
  cheap applies.

Per graph per GN iteration this is ~N·10³·cg_iters + (3M)³/3 FLOPs
instead of (3N)³/3 — at N=1024, M=64 a ~100× FLOP reduction, which is
what lets one chip run thousands of concurrent hospital-scale solves
per second (see bench.py).

**Multi-robot graphs take this path through a slot permutation.** In a
merged graph, foreign vertices interleave with own keyframes in slot
order (``mr/mrslam.py:receive_combo`` appends at ``n_vertices``), so own
odometry edges stop being slot-adjacent. :func:`chain_order` builds the
permutation that gathers vertices into (owner, keyframe-index) order —
under it every robot's odometry chain is a contiguous block-tridiagonal
run (chains decouple at owner boundaries: L-block 0), and everything
else (own loop closures, inter-robot closures, spliced condensed stars)
lands in the Woodbury term. ``optimize_chain(g, order=...)`` permutes,
solves, and scatters back; the reference gets the same effect implicitly
from CSparse's fill-reducing ordering.

:func:`chainable` returns True when the fast path is EXACT vs the dense
solver: every vertex the dense solver would optimize is covered by the
preconditioner (a chain edge or a within-``loop_cap`` loop edge — beyond
the cap, loop edges are excluded from the whole truncated system, which
stays consistent but no longer equals the full problem, so overflow
disqualifies). ``optimize_auto`` checks it and falls back.

Reference semantics replaced: g2o ``SparseOptimizer``+``BlockSolver``+
``LinearSolverCSparse`` (``/root/reference/src/slam/graph_slam.cpp:
44-55,561-574``) — same math, structure-exploiting realisation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cg_mrslam_tpu.core.graph import PoseGraph, unpack_info
from cg_mrslam_tpu.core.linearize import linearize
from cg_mrslam_tpu.utils import se2

# Every matmul in this file carries an EXPLICIT full-f32 precision: the
# cyclic-reduction Schur updates and the Woodbury congruences live off
# cancellation, and TPU matmuls default to bf16 multiplicands (the
# default_matmul_precision context is belt; this is suspenders — the
# experimental axon plugin is not guaranteed to honor ambient context).
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_es = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def chain_masks(g: PoseGraph, edge_mask: jax.Array | None = None):
    """Split active edges into chain (j == i+1) and loop parts."""
    mask = g.emask if edge_mask is None else (g.emask & edge_mask)
    is_chain = mask & (g.e_ij[:, 1] == g.e_ij[:, 0] + 1)
    return is_chain, mask & ~is_chain


def chain_order(v_owner: jax.Array, v_remote: jax.Array,
                vmask: jax.Array) -> jax.Array:
    """Slot permutation gathering live vertices into (owner,
    keyframe-index) order — the ordering under which every robot's
    odometry chain is slot-adjacent (consecutive own keyframes have
    consecutive remote indices, and no vertex can sort between remote
    ``r`` and ``r+1`` of the same owner). Use with
    ``optimize_chain(g, order=...)`` / ``chainable(g, order=...)``.
    Dead slots sort to the end."""
    big = jnp.int32(1 << 20)  # v_remote < 2^20 (capacity bound)
    key = jnp.where(vmask, v_owner * big + jnp.maximum(v_remote, 0),
                    jnp.int32(0x7FFFFFFF))
    return jnp.argsort(key).astype(jnp.int32)


def _select_loops(is_loop: jax.Array, loop_cap: int):
    """First ``loop_cap`` active loop edges (ascending slot).

    Returns ``(sel [cap], lmask [cap], loop_used [E], dropped [])`` —
    ``loop_used`` marks the selected slots; ``dropped`` counts active
    loop edges beyond the cap (excluded from the WHOLE truncated system,
    see :func:`_assemble`)."""
    e = is_loop.shape[0]
    eidx = jnp.arange(e, dtype=jnp.int32)
    order = jnp.where(is_loop, eidx, jnp.int32(e))
    sel = jnp.sort(order)[:loop_cap]
    lmask = sel < e
    sel = jnp.clip(sel, 0, e - 1)
    loop_used = jnp.zeros_like(is_loop).at[
        jnp.where(lmask, sel, e)].set(True, mode="drop")
    n_loop = jnp.sum(is_loop.astype(jnp.int32)).astype(jnp.int32)
    dropped = jnp.maximum(n_loop - loop_cap, 0).astype(jnp.int32)
    return sel, lmask, loop_used, dropped


def chainable(g: PoseGraph, edge_mask: jax.Array | None = None,
              loop_cap: int | None = None,
              order: jax.Array | None = None) -> jax.Array:
    """True when the fast path is EXACT vs the dense solver on this
    graph: no active loop edge beyond ``loop_cap`` (beyond-cap edges are
    excluded from the truncated system — a consistent but DIFFERENT
    problem), and every vertex the dense solver would optimize (live,
    unfixed, touched by an active edge) is covered by a chain edge or a
    selected loop edge. Vertices with no active edges at all are pinned
    by both solvers identically and do not disqualify."""
    if order is not None:
        from cg_mrslam_tpu.core.graph import permute_vertices

        g = permute_vertices(g, order)
    is_chain, is_loop = chain_masks(g, edge_mask)
    if loop_cap is None:
        loop_used = is_loop
        cap_ok = jnp.asarray(True)
    else:
        _, _, loop_used, dropped = _select_loops(is_loop, loop_cap)
        cap_ok = dropped == 0
    n = g.poses.shape[0]

    def deg_of(m):
        d = jnp.zeros((n,), jnp.int32)
        mi = m.astype(jnp.int32)
        return d.at[g.e_ij[:, 0]].add(mi).at[g.e_ij[:, 1]].add(mi)

    deg_any = deg_of(is_chain | is_loop)
    deg_used = deg_of(is_chain | loop_used)
    free_any = g.vmask & ~g.fixed & (deg_any > 0)
    return jnp.all(~free_any | (deg_used > 0)) & cap_ok


class _Tridiag(NamedTuple):
    D: jax.Array      # [N, 3, 3] λ-damped diagonal blocks (factorized)
    Dt: jax.Array     # [N, 3, 3] TRUE diagonal blocks (CG matvec)
    L: jax.Array      # [N, 3, 3] — L[k] = H[k+1, k]; L[N-1] unused
    free: jax.Array   # [N] bool


def _assemble(g: PoseGraph, edge_mask, loop_cap: int, damp: float = 1e-3):
    """One linearization pass → (tridiag chain part, loop factors, b).

    ``damp`` scales the preconditioner's λ (λ = damp·mean-diag): smaller
    → better-conditioned preconditioned system → fewer CG iterations,
    at the cost of a floppier f32 CR factorization. 1e-3 is the safe
    default; 1e-4 measured stable and ~2× fewer iterations on the
    hospital workload (see bench.py)."""
    n = g.poses.shape[0]
    is_chain, is_loop = chain_masks(g, edge_mask)
    e, Ji, Jj = linearize(g.poses, g.e_ij, g.e_z)
    omega = unpack_info(g.e_info)
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]

    # loop selection first: edges beyond loop_cap are excluded from the
    # WHOLE truncated system (gradient, degree/pinning, Woodbury factors
    # alike) so the solved system stays consistent — solving the full
    # gradient against a truncated Hessian would converge CG tightly to
    # the wrong answer. `chainable(loop_cap=...)` disqualifies the fast
    # path whenever dropped > 0, so truncation never silently degrades.
    sel, lmask, loop_used, dropped = _select_loops(is_loop, loop_cap)

    # ---- free mask (dense-solver pinning rule, on the truncated system)
    mask_used = is_chain | loop_used
    deg = jnp.zeros((n,), jnp.int32)
    am = mask_used.astype(jnp.int32)
    deg = deg.at[vi].add(am).at[vj].add(am)
    free = g.vmask & ~g.fixed & (deg > 0)

    # pinned coordinates contribute identity rows/cols: zero the Jacobian
    # of any pinned endpoint (the standard gauge projection)
    fi = free[vi].astype(Ji.dtype)[:, None, None]
    fj = free[vj].astype(Jj.dtype)[:, None, None]
    Jif, Jjf = Ji * fi, Jj * fj

    cm = is_chain.astype(Ji.dtype)[:, None, None]
    JiT_O = _es("eki,ekl->eil", Jif, omega) * cm
    Hii = _es("eil,elj->eij", JiT_O, Jif)
    Hij = _es("eil,elj->eij", JiT_O, Jjf)
    JjT_O = _es("eki,ekl->eil", Jjf, omega) * cm
    Hjj = _es("eil,elj->eij", JjT_O, Jjf)

    D = jnp.zeros((n, 3, 3), g.poses.dtype)
    D = D.at[vi].add(Hii).at[vj].add(Hjj)
    # L[k] = H[k+1, k] = Hijᵀ for the chain edge at k = vi
    L = jnp.zeros((n, 3, 3), g.poses.dtype)
    L = L.at[vi].add(jnp.swapaxes(Hij, -1, -2) * cm)

    # gradient b over the edges IN the truncated system (chain + selected
    # loops — never edges the Hessian doesn't carry)
    om_used = omega * mask_used.astype(omega.dtype)[:, None, None]
    bi = _es("eki,ekl,el->ei", Jif, om_used, e)
    bj = _es("eki,ekl,el->ei", Jjf, om_used, e)
    b = jnp.zeros((n, 3), g.poses.dtype).at[vi].add(bi).at[vj].add(bj)

    # identity on pinned blocks keeps the tridiag invertible. Free blocks
    # get λI damping with λ ∝ the mean diagonal scale: the UNdamped open
    # chain is floppy (κ grows ~N³ with the lever arms — measured
    # |Hc⁻¹b| ≈ 4·10⁶ vs |dx| ≈ 1 at N=1024), so its f32 factorization
    # carries O(1) relative error and no amount of downstream algebra
    # recovers it. Damping bounds κ(Hc+λI) ≲ diag/λ ≈ 10⁴ — comfortably
    # f32 — and exactness is restored OUTSIDE the factorization: the
    # damped chain+Woodbury inverse serves as the PRECONDITIONER of a CG
    # iteration on the TRUE Hessian (see ``_chain_delta_impl``).
    eye = jnp.eye(3, dtype=g.poses.dtype)
    diag_scale = jnp.sum(D * eye) / jnp.maximum(
        3.0 * jnp.sum(free.astype(D.dtype)), 1.0)
    lam = damp * diag_scale + 1e-6
    D_true = jnp.where(free[:, None, None], D, eye)
    D = jnp.where(free[:, None, None], D + lam * eye, eye)
    # decouple across pinned vertices
    Lok = (free[:n - 1] & free[1:]).astype(L.dtype)
    L = L.at[:n - 1].mul(Lok[:, None, None])
    L = L.at[n - 1].set(0.0)

    # ---- loop factors: the selected loop edges ----
    li = jnp.where(lmask, vi[sel], 0)
    lj = jnp.where(lmask, vj[sel], 0)
    lm3 = lmask.astype(Ji.dtype)[:, None, None]
    lJi = Jif[sel] * lm3
    lJj = Jjf[sel] * lm3
    lom = jnp.where(lmask[:, None, None], omega[sel],
                    jnp.eye(3, dtype=omega.dtype))
    return (_Tridiag(D=D, Dt=D_true, L=L, free=free), b,
            (li, lj, lJi, lJj, lom), dropped)


def _inv3(a: jax.Array) -> jax.Array:
    """Batched closed-form 3×3 inverse (adjugate / det). For the SPD
    blocks of a pose-graph Hessian (information scale 1e2–1e4, ε-pinned
    elsewhere) this is well inside float32; avoids ``jnp.linalg.inv``'s
    LU path, which is both slower for 3×3 and less predictable on TPU."""
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], -1),
        jnp.stack([c01, c11, c21], -1),
        jnp.stack([c02, c12, c22], -1),
    ], -2)
    return adj / det[..., None, None]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# Poses per CR super-block. 3×3 blocks are hopeless TPU shapes (the
# minor dims pad 3→8 sublanes / →128 lanes and each matmul uses ~2% of an
# MXU tile); grouping GROUP consecutive poses makes the chain
# block-tridiagonal in dense 3·GROUP-square blocks — real MXU tiles, ~7
# CR levels instead of 10, and far fewer tiny kernels.
GROUP = 16


def _inv_block(a: jax.Array) -> jax.Array:
    """Inverse for [..., b, b] blocks: closed-form for b=3, matmul-only
    block-Schur recursion (spd.py machinery) for super-blocks."""
    if a.shape[-1] == 3:
        return _inv3(a)
    from cg_mrslam_tpu.solver.spd import _spd_inverse_rec

    return _spd_inverse_rec(a)


def _to_super(D: jax.Array, L: jax.Array, group: int):
    """Regroup a 3×3 block-tridiagonal chain into dense
    ``3·group``-square super-blocks (pad tail poses with identity)."""
    n = D.shape[0]
    ns = -(-n // group)
    pad = ns * group - n
    if pad:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=D.dtype), (pad, 3, 3))
        D = jnp.concatenate([D, eye], axis=0)
        L = jnp.concatenate([L, jnp.zeros((pad, 3, 3), L.dtype)], axis=0)
        L = L.at[n - 1].set(0.0)
    Dr = D.reshape(ns, group, 3, 3)
    Lr = L.reshape(ns, group, 3, 3)
    b = 3 * group
    Ds = jnp.zeros((ns, b, b), D.dtype)
    for g in range(group):
        Ds = Ds.at[:, 3 * g:3 * g + 3, 3 * g:3 * g + 3].set(Dr[:, g])
    for g in range(group - 1):
        blk = Lr[:, g]
        Ds = Ds.at[:, 3 * (g + 1):3 * (g + 1) + 3,
                   3 * g:3 * g + 3].set(blk)
        Ds = Ds.at[:, 3 * g:3 * g + 3,
                   3 * (g + 1):3 * (g + 1) + 3].set(
            jnp.swapaxes(blk, -1, -2))
    # L_s[t] = T_s[t+1, t]: only the (first poses of t+1) × (last pose
    # of t) corner is nonzero = L[t·group + group − 1]
    Ls = jnp.zeros((ns, b, b), D.dtype)
    corner = Lr[:, group - 1]                      # [ns,3,3]
    Ls = Ls.at[:, 0:3, b - 3:b].set(corner)
    Ls = Ls.at[ns - 1].set(0.0)
    return Ds, Ls, ns, pad


def _cr_factor(D: jax.Array, L: jax.Array, group: int = GROUP):
    """Cyclic-reduction factorization of the SPD block-tridiagonal T
    (``D [n,3,3]`` diagonal, ``L[k] = T[k+1,k]``; ``L[n-1]`` ignored),
    over ``3·group``-square super-blocks.

    Each level eliminates the odd-indexed blocks in parallel:

        D'[t] = D[2t] − L[2t−1] D⁻¹[2t−1] Lᵀ[2t−1] − Lᵀ[2t] D⁻¹[2t+1] L[2t]
        L'[t] = −L[2t+1] D⁻¹[2t+1] L[2t]

    log₂(n/group) levels of whole-array batched dense-block matmuls —
    O(n) work, O(log n) depth; exact block Gaussian elimination in a
    different order. The returned per-level inverses let any number of
    later right-hand sides (Woodbury columns, iterative-refinement
    residuals) reuse the factorization."""
    n3 = D.shape[0]
    D, L, ns, _ = _to_super(D, L, group)
    bb = D.shape[-1]
    n = ns
    m = _next_pow2(n)
    if m > n:
        eye = jnp.broadcast_to(jnp.eye(bb, dtype=D.dtype),
                               (m - n, bb, bb))
        D = jnp.concatenate([D, eye], axis=0)
        L = jnp.concatenate(
            [L, jnp.zeros((m - n, bb, bb), L.dtype)], axis=0)
        L = L.at[n - 1].set(0.0)   # padding must not couple

    levels = []
    while D.shape[0] > 1:
        Do = D[1::2]
        Le = L[0::2]                          # L[2t]  : T[2t+1, 2t]
        Lo = L[1::2]                          # L[2t+1]: T[2t+2, 2t+1]
        Doi = _inv_block(Do)
        # previous odd neighbour of even 2t is 2t−1; L[2t−1] lives at the
        # odd positions of L, i.e. Lo shifted by one
        Lprev = jnp.concatenate(
            [jnp.zeros((1, bb, bb), L.dtype), Lo[:-1]], axis=0)  # L[2t-1]
        Doi_prev = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(bb, dtype=D.dtype), (1, bb, bb)),
             Doi[:-1]], axis=0)
        A = _mm(Lprev, Doi_prev)              # L[2t−1] D⁻¹[2t−1]
        B = _mm(jnp.swapaxes(Le, -1, -2), Doi)   # Lᵀ[2t] D⁻¹[2t+1]
        Dn = D[0::2] - _mm(A, jnp.swapaxes(Lprev, -1, -2)) - _mm(B, Le)
        Ln = -_mm(_mm(Lo, Doi), Le)           # T'[2t+2, 2t]
        levels.append((Doi, Le, Lo, A, B))
        D, L = Dn, Ln
    return {"levels": levels, "root_inv": _inv_block(D[0]),
            "n": n, "m": m, "n3": n3, "group": group}


def _cr_apply(fact, rhs: jax.Array) -> jax.Array:
    """Solve T x = rhs [n,3,R] with a :func:`_cr_factor` factorization
    (rhs in 3×3-block layout; regrouped to super-blocks internally)."""
    n, m = fact["n"], fact["m"]
    n3, group = fact["n3"], fact["group"]
    r_shape = rhs.shape
    pad3 = n * group - n3
    if pad3:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad3,) + rhs.shape[1:], rhs.dtype)], axis=0)
    rhs = rhs.reshape(n, 3 * group, rhs.shape[-1])
    if m > n:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((m - n,) + rhs.shape[1:], rhs.dtype)], axis=0)
    stack = []
    for (Doi, Le, Lo, A, B) in fact["levels"]:
        re, ro = rhs[0::2], rhs[1::2]
        ro_prev = jnp.concatenate(
            [jnp.zeros((1,) + rhs.shape[1:], rhs.dtype), ro[:-1]], axis=0)
        rhs = re - _mm(A, ro_prev) - _mm(B, ro)
        stack.append((Doi, Le, Lo, ro))

    x = _mm(fact["root_inv"][None], rhs)      # [1,3,R]
    for (Doi, Le, Lo, ro) in reversed(stack):
        # x holds the even solutions of this level; recover the odds:
        # x[2t+1] = D⁻¹[2t+1] (r[2t+1] − L[2t] x[2t] − Lᵀ[2t+1] x[2t+2])
        x_next = jnp.concatenate(
            [x[1:], jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
        xo = _mm(Doi, ro - _mm(Le, x)
                 - _mm(jnp.swapaxes(Lo, -1, -2), x_next))
        # interleave evens/odds by stack+reshape (x and xo are equal
        # length at every level — m is a power of two): a dense layout
        # transform instead of two strided scatters
        k2 = x.shape[0] + xo.shape[0]
        x = jnp.stack([x, xo], axis=1).reshape((k2,) + x.shape[1:])
    x = x[:n].reshape(n * group, 3, r_shape[-1])
    return x[:n3]


def _cr_solve(D: jax.Array, L: jax.Array, rhs: jax.Array,
              group: int = GROUP) -> jax.Array:
    """One-shot factor + solve (kept for tests/micro-benchmarks)."""
    return _cr_apply(_cr_factor(D, L, group=group), rhs)


@partial(jax.jit, static_argnames=("loop_cap", "cg_iters"))
def chain_delta(g: PoseGraph, edge_mask: jax.Array | None = None,
                loop_cap: int = 64, cg_tol: float = 1e-6,
                cg_iters: int = 48, order: jax.Array | None = None,
                damp: float = 1e-3):
    """One GN update dx [N,3]: CG on the true H, preconditioned by the
    λ-damped chain cyclic-reduction + Woodbury inverse.

    ``order`` (optional) solves under a slot permutation (see
    :func:`chain_order`); the returned ``dx`` is in ORIGINAL slot order.

    Returns ``(dx, dropped)`` — ``dropped`` counts loop edges beyond
    ``loop_cap`` (excluded from the truncated system AND from
    chainability; raise the cap or fall back to dense when it fires — no
    silent truncation).

    Every matmul under this function runs at full f32 precision: TPU
    matmuls default to bf16 multiplicands, and the cyclic-reduction
    Schur updates live off cancellation — at bf16 the N=1024 solve
    diverges to NaN (measured), at f32 it matches the dense solver to
    ~1e-3 relative."""
    with jax.default_matmul_precision("float32"):
        if order is None:
            return _chain_delta_impl(g, edge_mask, loop_cap,
                                     cg_tol=cg_tol, cg_iters=cg_iters,
                                     damp=damp)
        from cg_mrslam_tpu.core.graph import (
            inverse_permutation, permute_vertices,
        )

        inv = inverse_permutation(order)
        dx, dropped = _chain_delta_impl(
            permute_vertices(g, order), edge_mask, loop_cap,
            cg_tol=cg_tol, cg_iters=cg_iters, damp=damp)
        return dx[inv], dropped


class _PrecondState(NamedTuple):
    """Chain+Woodbury preconditioner state: CR factorization of the
    λ-damped chain + the Woodbury pieces from one linearization. Built
    per GN iteration by default; reusable across iterations via
    ``optimize_chain(freeze_precond=True)`` (see the measured TPU caveat
    there) and across the 3Q column solves of
    :func:`marginal_covariance_chain` (one linearization — always
    sound)."""
    fact_levels: tuple    # _cr_factor levels (tuple-ized for pytree use)
    fact_root: jax.Array
    fact_meta: tuple      # (n, m, n3, group) static ints
    HinvU: jax.Array      # [N, 3, 3M]
    s_inv: jax.Array      # [3M, 3M]
    li: jax.Array
    lj: jax.Array
    lJi: jax.Array        # FROZEN loop Jacobians (preconditioner only)
    lJj: jax.Array


def _precond_setup(td: _Tridiag, loops, n: int) -> _PrecondState:
    """Factor the damped chain and build the Woodbury correction."""
    (li, lj, lJi, lJj, lom) = loops
    m = li.shape[0]

    # U columns: U[3i.., 3m..] = Ji_mᵀ  → tensor [N, 3, 3M]
    Oi = jax.nn.one_hot(li, n, dtype=td.D.dtype)           # [M,N]
    Oj = jax.nn.one_hot(lj, n, dtype=td.D.dtype)
    U = (_es("mn,mac->ncma", Oi, lJi)
         + _es("mn,mac->ncma", Oj, lJj)).reshape(n, 3, 3 * m)

    fact = _cr_factor(td.D, td.L)
    HinvU = _cr_apply(fact, U)                             # [N,3,3M]

    # S = Ω⁻¹ (block-diag) + Uᵀ Hc⁻¹ U   [3M, 3M]
    Xi = HinvU[li]                                         # [M,3,3M]
    Xj = HinvU[lj]
    UtX = (_es("mac,mcq->maq", lJi, Xi)
           + _es("mac,mcq->maq", lJj, Xj)).reshape(3 * m, 3 * m)
    om_inv = _inv3(lom)                                    # [M,3,3]
    # scatter the Ω⁻¹ blocks onto the diagonal of S
    base = 3 * jnp.arange(m)
    ii = (base[:, None, None] + jnp.arange(3)[None, :, None])
    jj2 = (base[:, None, None] + jnp.arange(3)[None, None, :])
    S = UtX.at[ii, jj2].add(om_inv)

    # S is SPD; invert with the framework's own matmul-only machinery
    # (no LAPACK-style custom calls — the experimental TPU plugin's
    # linalg lowering is not trusted on this path)
    from cg_mrslam_tpu.solver.spd import spd_inverse

    s_inv = spd_inverse(S)
    s_inv = 0.5 * (s_inv + s_inv.T)     # preconditioner must be symmetric
    return _PrecondState(
        fact_levels=tuple(fact["levels"]), fact_root=fact["root_inv"],
        fact_meta=(fact["n"], fact["m"], fact["n3"], fact["group"]),
        HinvU=HinvU, s_inv=s_inv, li=li, lj=lj, lJi=lJi, lJj=lJj)


def _pst_fact(pst: _PrecondState) -> dict:
    n, m, n3, group = pst.fact_meta
    return {"levels": list(pst.fact_levels), "root_inv": pst.fact_root,
            "n": n, "m": m, "n3": n3, "group": group}


def _freeze_diverged(c_old: jax.Array, c_new: jax.Array) -> jax.Array:
    """Recovery predicate for the frozen-preconditioner lever: True
    when a GN iteration under a stale M made chi2 materially WORSE.
    GN is not strictly monotone (a legitimate iteration can overshoot
    slightly near convergence), so the cut is generous — 4× growth
    plus an absolute slack — while the measured chip failure mode
    (chi2 6.2e4 → 8.5e7 across iterations) exceeds it by orders of
    magnitude. NaN-safe by the negated-``<=`` form: a non-finite new
    chi2 always triggers recovery."""
    return ~(c_new <= 4.0 * c_old + 1.0)


def _select_cg_iterate(x_fin: jax.Array, rr2_fin: jax.Array,
                       x_best: jax.Array, rr2_best: jax.Array) -> jax.Array:
    """CG exit selection: the FINAL iterate unless it is clearly worse
    (>4× in residual 2-norm) than the best tracked one — see the
    breakdown-cliff discussion at the call site. NaN-safe by
    construction: the negated ``<=`` predicate treats ANY non-finite
    final residual (a diverging f32 CG runs until rr2 hits inf/NaN,
    which also exits the while_loop since NaN comparisons are False)
    as breakdown and returns the tracked best iterate instead of the
    poisoned final one."""
    broke = ~(rr2_fin <= 4.0 * rr2_best)           # breakdown, not noise
    return jnp.where(broke, x_best, x_fin)


def _chain_delta_impl(g: PoseGraph, edge_mask, loop_cap: int,
                      cg_tol: float = 1e-6, cg_iters: int = 48,
                      damp: float = 1e-3,
                      pst: _PrecondState | None = None,
                      cg_iter_bound: jax.Array | None = None):
    """One GN update via preconditioned CG on the CURRENT true H.

    ``pst`` (optional) reuses a frozen preconditioner from an earlier
    linearization; ``cg_iter_bound`` (optional traced int32) overrides
    the static ``cg_iters`` cap — used by ``optimize_chain``'s
    descending per-GN-iteration CG budget schedule."""
    n = g.poses.shape[0]
    td, b, (li, lj, lJi, lJj, lom), dropped = _assemble(
        g, edge_mask, loop_cap, damp=damp)
    m = li.shape[0]
    if pst is None:
        pst = _precond_setup(td, (li, lj, lJi, lJj, lom), n)
    fact = _pst_fact(pst)

    def ut_frozen(x):
        """Uᵀ x with the PRECONDITIONER's frozen Jacobians → [3M]."""
        return (_es("mac,mc->ma", pst.lJi, x[pst.li])
                + _es("mac,mc->ma", pst.lJj, x[pst.lj])).reshape(3 * m)

    def precond(r):
        """M r = (Hc+λI + UΩUᵀ)⁻¹ r via Woodbury, reusing the CR
        factorization, Hc_d⁻¹U columns, and S⁻¹ (symmetric, SPD)."""
        z = _cr_apply(fact, r[..., None])[..., 0]
        y = _mm(pst.s_inv, ut_frozen(z))
        return z - _es("ncq,q->nc", pst.HinvU, y)

    def ut(x):
        """Uᵀ x with the CURRENT Jacobians (true-H matvec) → [3M]."""
        return (_es("mac,mc->ma", lJi, x[li])
                + _es("mac,mc->ma", lJj, x[lj])).reshape(3 * m)

    def h_matvec(x):
        """TRUE H x = (Hc + U Ω Uᵀ) x — undamped diagonal blocks."""
        D, L = td.Dt, td.L
        xp = jnp.concatenate(
            [jnp.zeros((1, 3), x.dtype), x[:-1]], axis=0)
        xn2 = jnp.concatenate(
            [x[1:], jnp.zeros((1, 3), x.dtype)], axis=0)
        Lprev = jnp.concatenate(
            [jnp.zeros((1, 3, 3), L.dtype), L[:-1]], axis=0)
        y = (_es("nij,nj->ni", D, x)
             + _es("nij,nj->ni", Lprev, xp)
             + _es("nji,nj->ni", L, xn2))
        # loop part: U (Ω (Uᵀ x)) — per edge, w = Ω·(Uᵀx)_m, then Jᵀ-
        # scatter back to the endpoints
        utx = ut(x).reshape(m, 3)
        w = _es("mij,mj->mi", lom, utx)
        y = y.at[li].add(_es("mac,ma->mc", lJi, w))
        y = y.at[lj].add(_es("mac,ma->mc", lJj, w))
        return y

    # Preconditioned CG on the TRUE Hessian. The damped Woodbury M is an
    # excellent preconditioner (κ(M·H) ≈ 1 + λ/λ_min(H), single-digit for
    # loop-closed graphs), and CG is exact on convergence no matter how
    # ill-conditioned the raw chain was — this is what makes the fast
    # path safe in f32 on TPU, where the undamped factor-and-correct
    # variant diverged (measured: chi2 6e4 → 7e7 → NaN at N=1024).
    bb = -b
    x = precond(bb)
    r = bb - h_matvec(x)
    z = precond(r)
    bn = jnp.maximum(jnp.sum(bb * bb), 1e-30)
    tol2 = jnp.asarray(cg_tol * cg_tol, bb.dtype)   # on ‖r‖/‖b‖
    bound = (jnp.int32(cg_iters) if cg_iter_bound is None
             else jnp.minimum(jnp.int32(cg_iters),
                              cg_iter_bound.astype(jnp.int32)))

    # Best-iterate tracking: f32 CG on this problem sits at a breakdown
    # cliff — past ~24 iterations conjugacy is lost and the iterate
    # DEGRADES monotonically (measured deterministic on chip: cg24
    # reaches chi2 0.05 where cg32 gives 0.25 and cg48 blows up to 1e7).
    # Carrying the lowest-residual iterate makes every budget safe:
    # overrun wastes time, never accuracy. The SELECTION at loop exit is
    # conditional, not unconditional: return the FINAL iterate unless it
    # is clearly worse (>4x in residual) than the best seen — CG's
    # 2-norm residual legitimately oscillates near the f32 noise floor,
    # and always returning the min-||r|| iterate grabs a STALE early
    # iterate on well-conditioned solves (measured: chi2 2.5e-4 where
    # final-iterate reaches 5e-9 on the 72-vertex merged test graph);
    # only a genuine breakdown leaves final >> best. (A <r,Mr> > 0
    # guard does NOT work here — with this preconditioner the initial
    # residual is already at the f32 noise floor, so rz's sign is noise
    # and the guard stops CG before it starts; measured chi2 5e4.)
    rr2 = jnp.sum(r * r)

    # NOTE: no runaway-stop in cond — near the f32 noise floor rr2
    # oscillates by orders of magnitude between consecutive iterations,
    # and an `rr2 < 100*rr2_best` cut fires spuriously under jit
    # rounding (measured: truncates the 2nd GN iteration of the merged
    # 72-vertex graph at chi2 3e-4 where the full budget reaches 6e-9).
    # A genuine breakdown is handled losslessly by the exit selector.
    def cond(s):
        k, _, _, _, _, rr2, _, rr2_best = s
        return (k < bound) & (rr2 / bn > tol2)

    def body(s):
        k, x, rr, p, rz, _, x_best, rr2_best = s
        hp = h_matvec(p)
        den = jnp.sum(p * hp)
        ok = den > 1e-30
        alpha = jnp.where(ok, rz / jnp.where(ok, den, 1.0), 0.0)
        x = x + alpha * p
        rr = rr - alpha * hp
        zz = precond(rr)
        rz2 = jnp.sum(rr * zz)
        okb = jnp.abs(rz) > 1e-30
        beta = jnp.where(okb, rz2 / jnp.where(okb, rz, 1.0), 0.0)
        rr2n = jnp.sum(rr * rr)
        better = rr2n < rr2_best
        x_best = jnp.where(better, x, x_best)
        rr2_best = jnp.where(better, rr2n, rr2_best)
        return (k + 1, x, rr, zz + beta * p, rz2, rr2n, x_best,
                rr2_best)

    out = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), x, r, z, jnp.sum(r * z), rr2, x, rr2))
    _, x_fin, _, _, _, rr2_fin, x_best, rr2_best = out
    dx = _select_cg_iterate(x_fin, rr2_fin, x_best, rr2_best)
    dx = dx * td.free[:, None].astype(dx.dtype)
    return dx, dropped


@partial(jax.jit, static_argnames=("iterations", "loop_cap", "cg_iters",
                                   "return_dropped", "damp",
                                   "cg_schedule", "freeze_precond"))
def optimize_chain(g: PoseGraph, iterations: int = 5,
                   edge_mask: jax.Array | None = None,
                   loop_cap: int = 64, cg_tol: float = 1e-6,
                   cg_iters: int = 48, order: jax.Array | None = None,
                   return_dropped: bool = False, damp: float = 1e-3,
                   cg_schedule: tuple | None = None,
                   freeze_precond: bool = False):
    """``optimize(n)`` on the chain+Woodbury path (g2o ``optimize``
    semantics: n GN iterations, additive oplus update). ``order``
    (optional) solves under a slot permutation (:func:`chain_order`);
    the result is in original slot order. With ``return_dropped`` the
    max over-iterations loop-edge overflow count rides along so batched
    callers (bench, sol) can assert the truncation never fired.

    Performance levers (round-3, all measured on chip):

    * ``cg_schedule`` caps CG per GN iteration with a descending budget
      (e.g. ``(48, 24, 16, 12, 12)``): the first iteration, far from
      the optimum, does the real contraction; later ones polish an
      almost-converged iterate and exit on tolerance anyway.
    * ``freeze_precond=True`` builds the CR factorization + Woodbury
      correction once and reuses it — in exact arithmetic a stale SPD M
      only costs iterations, and on CPU-f32 it converges (measured
      chi2 → 1e-3 at N=1024), but on the TPU chip the same program
      DIVERGES at hospital scale (measured: chi2 6.2e4 → 8.5e7 at
      N=1024 batch 512; every frozen schedule variant failed) — the
      chip's matmul rounding under a stale M on the κ~N³ chain is the
      differentiator, the same failure class as the round-2 undamped
      factor-and-correct NaN. Default OFF; kept as an explicit lever
      for small-graph callers (the setup is 63% of the per-iteration
      cost). GUARDED since round 4: every frozen GN iteration is
      chi2-checked (:func:`_freeze_diverged`, NaN-safe) and a
      diverging iteration is redone with a fresh preconditioner — the
      lever can no longer silently blow up, it degrades to
      per-iteration setup."""
    if order is not None:
        from cg_mrslam_tpu.core.graph import (
            inverse_permutation, permute_vertices,
        )

        inv = inverse_permutation(order)
        gp = optimize_chain(permute_vertices(g, order), iterations,
                            edge_mask, loop_cap, cg_tol, cg_iters,
                            return_dropped=True, damp=damp,
                            cg_schedule=cg_schedule,
                            freeze_precond=freeze_precond)
        gp, dropped = gp
        out = dataclasses.replace(g, poses=gp.poses[inv])
        return (out, dropped) if return_dropped else out

    if cg_schedule is None:
        sched = jnp.full((iterations,), cg_iters, jnp.int32)
    else:
        assert len(cg_schedule) == iterations, \
            "cg_schedule needs one CG budget per GN iteration"
        sched = jnp.asarray(cg_schedule, jnp.int32)

    with jax.default_matmul_precision("float32"):
        if freeze_precond:
            td0, _, loops0, _ = _assemble(g, edge_mask, loop_cap,
                                          damp=damp)
            pst = _precond_setup(td0, loops0, g.poses.shape[0])
        else:
            pst = None

        def body(carry, ci):
            gg, dmax = carry
            dx, dropped = _chain_delta_impl(
                gg, edge_mask, loop_cap, cg_tol=cg_tol,
                cg_iters=cg_iters, damp=damp, pst=pst,
                cg_iter_bound=ci)
            g_new = dataclasses.replace(gg,
                                        poses=se2.oplus(gg.poses, dx))
            if pst is not None:
                # Divergence guard on the frozen-preconditioner lever
                # (VERDICT r03 item 6): on chip a stale M diverges at
                # hospital scale (measured chi2 6.2e4 → 8.5e7 across GN
                # iterations, every frozen schedule variant). Any GN
                # iteration whose chi2 fails the recovery predicate
                # (:func:`_freeze_diverged`, NaN-safe) is REDONE with a
                # freshly assembled preconditioner — the guarded lever
                # degrades to per-iteration setup instead of blowing up.
                from cg_mrslam_tpu.core.linearize import chi2 as _c2

                def redo(op):
                    gg2, ci2 = op
                    dx2, dr2 = _chain_delta_impl(
                        gg2, edge_mask, loop_cap, cg_tol=cg_tol,
                        cg_iters=cg_iters, damp=damp, pst=None,
                        cg_iter_bound=ci2)
                    return (dataclasses.replace(
                        gg2, poses=se2.oplus(gg2.poses, dx2)), dr2)

                bad = _freeze_diverged(_c2(gg, edge_mask),
                                       _c2(g_new, edge_mask))
                g_new, dropped = jax.lax.cond(
                    bad, redo, lambda op: (g_new, dropped), (gg, ci))
            gg = g_new
            return (gg, jnp.maximum(dmax, dropped)), None

        (g, dmax), _ = jax.lax.scan(body, (g, jnp.int32(0)), sched)
    return (g, dmax) if return_dropped else g


@partial(jax.jit, static_argnames=("loop_cap", "cg_iters", "damp"))
def marginal_covariance_chain(g: PoseGraph, query: jax.Array,
                              edge_mask: jax.Array | None = None,
                              loop_cap: int = 64, cg_tol: float = 1e-5,
                              cg_iters: int = 64,
                              order: jax.Array | None = None,
                              damp: float = 1e-3) -> jax.Array:
    """Marginal 3×3 covariance blocks ``[Q,3,3]`` of the queried
    vertices on the chain+Woodbury path — the O(N log N) replacement for
    the dense ``gauss_newton.marginal_covariance`` (one [3N,3N]
    factorization) that keeps the covariance gate out of O(N³) in large
    buckets (reference ``computeMarginals`` via ``CovarianceEstimator``,
    ``graph_manipulator.cpp:128-157``).

    Each of the 3Q unit columns e_{q,c} is solved with preconditioned CG
    on the true H (same operators as :func:`chain_delta`), vmapped so
    the tridiagonal matvec batches over columns. One linearization, one
    CR factorization, one Woodbury correction — shared by all columns.
    ``order`` solves under the slot permutation (merged multi-robot
    graphs); queries and results stay in original slot coordinates.
    """
    if order is not None:
        from cg_mrslam_tpu.core.graph import (
            inverse_permutation, permute_vertices,
        )

        inv = inverse_permutation(order)
        return marginal_covariance_chain(
            permute_vertices(g, order), inv[query], edge_mask,
            loop_cap, cg_tol, cg_iters, None, damp)

    with jax.default_matmul_precision("float32"):
        n = g.poses.shape[0]
        td, _, (li, lj, lJi, lJj, lom), _ = _assemble(
            g, edge_mask, loop_cap, damp=damp)
        m = li.shape[0]
        pst = _precond_setup(td, (li, lj, lJi, lJj, lom), n)
        fact = _pst_fact(pst)

        def precond(r):
            z = _cr_apply(fact, r[..., None])[..., 0]
            y = _mm(pst.s_inv, (_es("mac,mc->ma", pst.lJi, z[pst.li])
                                + _es("mac,mc->ma", pst.lJj, z[pst.lj])
                                ).reshape(3 * m))
            return z - _es("ncq,q->nc", pst.HinvU, y)

        def h_matvec(x):
            D, L = td.Dt, td.L
            xp = jnp.concatenate(
                [jnp.zeros((1, 3), x.dtype), x[:-1]], axis=0)
            xn2 = jnp.concatenate(
                [x[1:], jnp.zeros((1, 3), x.dtype)], axis=0)
            y = (_es("nij,nj->ni", D, x)
                 + _es("nij,nj->ni",
                       jnp.concatenate([jnp.zeros((1, 3, 3), L.dtype),
                                        L[:-1]], axis=0), xp)
                 + _es("nji,nj->ni", L, xn2))
            utx = (_es("mac,mc->ma", lJi, x[li])
                   + _es("mac,mc->ma", lJj, x[lj]))
            w = _es("mij,mj->mi", lom, utx)
            y = y.at[li].add(_es("mac,ma->mc", lJi, w))
            y = y.at[lj].add(_es("mac,ma->mc", lJj, w))
            return y

        def solve_col(qv, c):
            rhs = jnp.zeros((n, 3), g.poses.dtype).at[qv, c].set(1.0)
            x = precond(rhs)
            r = rhs - h_matvec(x)
            z = precond(r)
            tol2 = jnp.asarray(cg_tol * cg_tol, rhs.dtype)
            rr2 = jnp.sum(r * r)

            def cond(s):
                k, _, _, _, _, rr2, _, rr2_best = s
                # best-iterate tracking against f32 CG overrun — see
                # chain_delta's CG for the measured rationale (no
                # runaway-stop: spurious at the noise floor)
                return (k < cg_iters) & (rr2 > tol2)

            def body(s):
                k, x, rr, p, rz, _, x_best, rr2_best = s
                hp = h_matvec(p)
                den = jnp.sum(p * hp)
                ok = den > 1e-30
                alpha = jnp.where(ok, rz / jnp.where(ok, den, 1.0), 0.0)
                x = x + alpha * p
                rr = rr - alpha * hp
                zz = precond(rr)
                rz2 = jnp.sum(rr * zz)
                okb = jnp.abs(rz) > 1e-30
                beta = jnp.where(okb, rz2 / jnp.where(okb, rz, 1.0), 0.0)
                rr2n = jnp.sum(rr * rr)
                better = rr2n < rr2_best
                x_best = jnp.where(better, x, x_best)
                rr2_best = jnp.where(better, rr2n, rr2_best)
                return (k + 1, x, rr, zz + beta * p, rz2, rr2n, x_best,
                        rr2_best)

            out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), x, r, z, jnp.sum(r * z), rr2, x, rr2))
            _, x_fin, _, _, _, rr2_fin, x_best, rr2_best = out
            # final iterate unless a genuine breakdown (NaN-safe)
            xo = _select_cg_iterate(x_fin, rr2_fin, x_best, rr2_best)
            return xo[qv]                      # [3] = Σ[:, c] at vertex q

        qs = jnp.repeat(query, 3)                        # [3Q]
        cs = jnp.tile(jnp.arange(3), query.shape[0])     # [3Q]
        cols = jax.vmap(solve_col)(qs, cs)               # [3Q, 3]
        sig = cols.reshape(query.shape[0], 3, 3)         # [Q, c, row]
        sig = jnp.swapaxes(sig, -1, -2)                  # rows × cols
        return 0.5 * (sig + jnp.swapaxes(sig, -1, -2))   # symmetrize
