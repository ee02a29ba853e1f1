"""Matrix-free preconditioned conjugate gradient for large pose graphs.

The dense-Cholesky path (``solver/gauss_newton.py``) is the right call at
hospital scale (N ≤ ~1k, where one batched factorization feeds thousands
of concurrent solves), but H is [3N, 3N] — at the 100k-pose target
(BASELINE.md scale row) it no longer fits. This solver never materializes
H: the Hessian-vector product is two gathers + one scatter-add over the
edge list per CG iteration (exactly the sparsity g2o's CSparse exploits,
``/root/reference/src/slam/graph_slam.cpp:44-55``, re-expressed as
array primitives), with a block-Jacobi (3×3 diagonal block) preconditioner.

Everything is jittable, static-shape, and ``vmap``-able over a batch of
graphs; FLOPs per iteration are O(E·9 + N·9).
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


class EdgeFactors(NamedTuple):
    """Per-edge linearization reused across CG iterations."""

    Ji: jax.Array      # [E, 3, 3]
    Jj: jax.Array      # [E, 3, 3]
    omega: jax.Array   # [E, 3, 3] masked information
    b: jax.Array       # [N, 3] gradient blocks (Σ JᵀΩe)
    diag: jax.Array    # [N, 3, 3] diagonal Hessian blocks
    free: jax.Array    # [N] bool


def _factorize(g: PoseGraph, edge_mask: jax.Array | None) -> EdgeFactors:
    mask = g.emask if edge_mask is None else edge_mask
    e, Ji, Jj = linearize(g.poses, g.e_ij, g.e_z)
    omega = unpack_info(g.e_info) * mask.astype(g.poses.dtype)[:, None, None]

    JiT_O = jnp.einsum("eki,ekl->eil", Ji, omega)
    JjT_O = jnp.einsum("eki,ekl->eil", Jj, omega)
    bi = jnp.einsum("eil,el->ei", JiT_O, e)
    bj = jnp.einsum("eil,el->ei", JjT_O, e)
    Hii = jnp.einsum("eil,elj->eij", JiT_O, Ji)
    Hjj = jnp.einsum("eil,elj->eij", JjT_O, Jj)

    n = g.poses.shape[0]
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    b = jnp.zeros((n, 3), g.poses.dtype).at[vi].add(bi).at[vj].add(bj)
    diag = jnp.zeros((n, 3, 3), g.poses.dtype).at[vi].add(Hii).at[vj].add(
        Hjj)

    deg = jnp.zeros((n,), jnp.int32)
    em = mask.astype(jnp.int32)
    deg = deg.at[vi].add(em).at[vj].add(em)
    free = g.vmask & ~g.fixed & (deg > 0)
    return EdgeFactors(Ji=Ji, Jj=Jj, omega=omega, b=b, diag=diag, free=free)


def _hvp(g: PoseGraph, f: EdgeFactors, x: jax.Array) -> jax.Array:
    """H @ x as gathers + scatter-add; ``x`` is ``[N, 3]`` (free coords)."""
    vi, vj = g.e_ij[:, 0], g.e_ij[:, 1]
    xi = x[vi]
    xj = x[vj]
    yi = jnp.einsum("eki,ekl,elm,em->ei", f.Ji, f.omega, f.Ji, xi) + \
        jnp.einsum("eki,ekl,elm,em->ei", f.Ji, f.omega, f.Jj, xj)
    yj = jnp.einsum("eki,ekl,elm,em->ei", f.Jj, f.omega, f.Ji, xi) + \
        jnp.einsum("eki,ekl,elm,em->ei", f.Jj, f.omega, f.Jj, xj)
    n = x.shape[0]
    y = jnp.zeros_like(x).at[vi].add(yi).at[vj].add(yj)
    return y * f.free[:, None]


@partial(jax.jit, static_argnames=("cg_iters",))
def pcg_delta(g: PoseGraph, edge_mask: jax.Array | None = None,
              cg_iters: int = 64, tol: float = 1e-8) -> jax.Array:
    """One GN update direction ``dx [N,3]`` via block-Jacobi PCG."""
    f = _factorize(g, edge_mask)
    freeb = f.free[:, None]
    # block-Jacobi preconditioner: invert 3x3 diagonal blocks (identity on
    # pinned vertices)
    eye = jnp.eye(3, dtype=g.poses.dtype)
    diag = jnp.where(f.free[:, None, None], f.diag, eye) + 1e-6 * eye
    Minv = jnp.linalg.inv(diag)

    b = -f.b * freeb

    def precond(r):
        return jnp.einsum("nij,nj->ni", Minv, r) * freeb

    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0 ⇒ r = b
    z0 = precond(r0)

    def body(state, _):
        x, r, z, p, rz = state
        hp = _hvp(g, f, p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        # freeze updates once converged (static iteration count)
        done = jnp.sum(r * r) < tol
        keep = lambda a, bb: jnp.where(done, a, bb)
        return (keep(state[0], x), keep(state[1], r), keep(state[2], z),
                keep(state[3], p), jnp.where(done, rz, rz_new)), None

    st0 = (x0, r0, z0, z0, jnp.sum(r0 * z0))
    (x, *_), _ = jax.lax.scan(body, st0, None, length=cg_iters)
    return x


@partial(jax.jit, static_argnames=("cg_iters",))
def marginal_covariance_pcg(g: PoseGraph, query: jax.Array,
                            edge_mask: jax.Array | None = None,
                            cg_iters: int = 160,
                            tol: float = 1e-12) -> jax.Array:
    """Marginal 3×3 covariance blocks ``[Q,3,3]`` via matrix-free PCG
    column solves — the chip-safe fallback of
    ``gauss_newton.marginal_covariance_auto`` for graphs past
    ``DENSE_MAX`` that the chain path does not cover (the dense
    [3N,3N] inverse at that scale both costs O(N³) and produces f32
    garbage on the TPU — measured; a garbage marginal here once fed
    NaN information matrices into condensed-star edges and poisoned a
    whole multi-robot fleet state).

    Matches the dense path's semantics: gauge from ``g.fixed``, the
    same 1e-6 diagonal jitter, Σ read off the queried columns of H⁻¹.
    Each of the 3Q unit columns is one block-Jacobi PCG solve sharing a
    single linearization; ``vmap`` batches the edge-list matvecs."""
    f = _factorize(g, edge_mask)
    freeb = f.free[:, None]
    eye = jnp.eye(3, dtype=g.poses.dtype)
    diag = jnp.where(f.free[:, None, None], f.diag, eye) + 1e-6 * eye
    Minv = jnp.linalg.inv(diag)
    n = g.poses.shape[0]

    def precond(r):
        return jnp.einsum("nij,nj->ni", Minv, r) * freeb

    def hvp(x):
        # jittered like the dense path so a degenerate edge subset
        # yields large-but-finite covariance, never NaN
        return _hvp(g, f, x) + 1e-6 * x * freeb

    def solve_col(qv, c):
        rhs = (jnp.zeros((n, 3), g.poses.dtype).at[qv, c].set(1.0)
               * freeb)

        def body(state, _):
            x, r, z, p, rz = state
            hp = hvp(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x2 = x + alpha * p
            r2 = r - alpha * hp
            z2 = precond(r2)
            rz2 = jnp.sum(r2 * z2)
            beta = rz2 / jnp.maximum(rz, 1e-30)
            p2 = z2 + beta * p
            done = jnp.sum(r * r) < tol
            keep = lambda a, bb: jnp.where(done, a, bb)
            return (keep(x, x2), keep(r, r2), keep(z, z2),
                    keep(p, p2), jnp.where(done, rz, rz2)), None

        z0 = precond(rhs)
        (x, *_), _ = jax.lax.scan(
            body, (jnp.zeros_like(rhs), rhs, z0, z0,
                   jnp.sum(rhs * z0)), None, length=cg_iters)
        return x[qv]

    qs = jnp.repeat(query, 3)                        # [3Q]
    cs = jnp.tile(jnp.arange(3), query.shape[0])     # [3Q]
    cols = jax.vmap(solve_col)(qs, cs)               # [3Q, 3]
    sig = cols.reshape(query.shape[0], 3, 3)         # [Q, c, row]
    sig = jnp.swapaxes(sig, -1, -2)
    return 0.5 * (sig + jnp.swapaxes(sig, -1, -2))


@partial(jax.jit, static_argnames=("iterations", "cg_iters"))
def optimize_pcg(g: PoseGraph, iterations: int = 5,
                 edge_mask: jax.Array | None = None,
                 cg_iters: int = 64) -> PoseGraph:
    """GN iterations with PCG inner solves (large-graph ``optimize``)."""

    def body(gg, _):
        dx = pcg_delta(gg, edge_mask, cg_iters=cg_iters)
        return dataclasses.replace(gg, poses=se2.oplus(gg.poses, dx)), None

    g, _ = jax.lax.scan(body, g, None, length=iterations)
    return g
