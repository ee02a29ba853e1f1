"""SPD inverse as batched matmuls — the TPU-shaped linear solver.

XLA's Cholesky + triangular-solve lowering is a LATENCY-bound
substitution chain: on a real v5e, factoring [1024, 192, 192] batched
Hessians took ~34 ms and each triangular solve ~23 ms — independent of
batch size, because the 192-step serial chain dominates while the MXU
idles. A Gauss–Newton iteration needs H⁻¹b (and the framework separately
needs diagonal blocks of H⁻¹ for covariance gating and condensed-graph
labeling), so computing the explicit SPD inverse with MATMULS is the
hardware-native choice:

* recursive 2×2 block Schur inversion —
  ``inv([[A, Bᵀ], [B, C]])`` from ``A⁻¹`` and ``S⁻¹ = (C − B A⁻¹ Bᵀ)⁻¹``
  — every combination step is a handful of batched matmuls (MXU);
* the recursion bottoms out at ≤24×24 blocks inverted by an unrolled
  Gauss–Jordan sweep (24 vectorized steps; SPD + the solver's unit
  diagonal on gauge-fixed rows make pivoting unnecessary).

Numerically this is the same O(κ·ε) class as Cholesky-inverse for the
well-conditioned gauge-fixed Hessians this framework produces (chi2
parity suites pass unchanged); ``gauss_newton`` keeps the Cholesky path
available via ``CG_MRSLAM_CHOLESKY=1`` for A/B checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BASE = 24

# TPU matmuls default to bf16 multiplicands; the Schur recursion and the
# Newton–Schulz refinement both live off cancellation, so every matmul
# here runs at HIGHEST (full f32 on the MXU — measured residual 0.031 vs
# 0.00016 at default precision on a real 768² pose Hessian, and the
# refinement can diverge to NaN from a bf16-accuracy start).
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _gauss_jordan_inverse(a: jax.Array) -> jax.Array:
    """Inverse of SPD ``[..., n, n]`` (n ≤ _BASE) by Gauss–Jordan without
    pivoting: n sequential vectorized elimination steps."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    m = jnp.concatenate([a, eye], axis=-1)          # [..., n, 2n]

    def step(k, m):
        row = m[..., k, :]                          # [..., 2n]
        piv = row / row[..., k][..., None]
        col = m[..., :, k]                          # [..., n]
        col = col.at[..., k].set(0.0)
        m = m - col[..., :, None] * piv[..., None, :]
        return m.at[..., k, :].set(piv)

    m = jax.lax.fori_loop(0, n, step, m)
    return m[..., :, n:]


def spd_inverse(h: jax.Array, refine: int = 2, max_refine: int = 48,
                tol: float | None = None) -> jax.Array:
    """Explicit inverse of a batched SPD matrix ``[..., n, n]``.

    ``n`` must halve down to ≤ 24 (true for the framework's 3N pose
    Hessians: 3·2^k → 24 after k−3 halvings); odd splits fall back to a
    floor split, which still terminates for any n.

    The raw recursion loses ~2 digits to Cholesky at condition 1e5 (the
    Schur subtraction cancels), so the matrix is first Jacobi-equilibrated
    to unit diagonal (D H D with D = diag(H)^{-1/2} — pose Hessians mix
    1e3-scale information blocks with unit gauge rows), then polished by
    Newton–Schulz ``X ← X + X(I − HX)`` — each step SQUARES the residual
    for two batched matmuls, pure MXU work.

    Robustness (the part that matters in production): at condition
    ~3·10⁵ the f32 recursion can land at residual ``‖I−HX‖ ≥ 1`` where
    plain NS DIVERGES to NaN (observed on a real multi-robot Hessian
    with a condensed-star hub). Therefore

    * elements whose start residual is ≥ 1 (or non-finite) RESTART from
      the classical guaranteed-convergent SPD seed ``X₀ = I/‖H‖_∞``
      (spectrum of ``I − H X₀`` in ``[0, 1)``);
    * refinement runs in a ``while_loop`` until the worst batch
      element's Frobenius residual ≤ ``tol`` (or ``max_refine``): healthy
      batches exit after the usual ~``refine`` steps, a restarted
      element takes ~log₂(κ) + a few quadratic steps.
    """
    n = h.shape[-1]
    if tol is None:
        tol = 1e-4 if h.dtype == jnp.float32 else 1e-11
    d = jax.lax.rsqrt(jnp.maximum(
        jnp.diagonal(h, axis1=-2, axis2=-1), 1e-30))          # [..., n]
    hs = h * d[..., :, None] * d[..., None, :]
    x = _spd_inverse_rec(hs)
    eye = jnp.eye(n, dtype=h.dtype)

    def resid(xc):
        r = eye - _mm(hs, xc)
        rn = jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))
        return r, rn

    r, rn = resid(x)

    # the guaranteed-convergent SPD seed: X₀ = I/‖H‖_∞ puts the spectrum
    # of R₀ = I − H X₀ in [0, 1), so NS (which squares R exactly) always
    # converges from it — at ~log₂(κ) linear steps before the quadratic
    # phase kicks in
    inf_norm = jnp.max(jnp.sum(jnp.abs(hs), axis=-1), axis=-1)  # ‖H‖_∞
    tau = jnp.maximum(inf_norm, 1.0)[..., None, None]
    seed = eye / tau
    r_seed = eye - hs / tau
    rn_seed = jnp.sqrt(jnp.sum(r_seed * r_seed, axis=(-2, -1)))

    def cond(state):
        k, _, _, rn_arr, prev_worst = state
        worst = jnp.max(rn_arr)
        improving = worst < 0.7 * prev_worst
        # keep going through the (slow) linear phase; once in the
        # quadratic regime, stop at tol or at the f32 floor (~ε·κ —
        # waiting for an unreachable tol would burn max_refine steps on
        # every call)
        return (k < refine) | ((k < max_refine) & (worst > tol)
                               & ((worst >= 0.25) | improving))

    def body(state):
        k, xc, rc, rn_arr, _ = state
        xn = xc + _mm(xc, rc)
        xn = 0.5 * (xn + jnp.swapaxes(xn, -1, -2))
        r2, rn2 = resid(xn)
        # divergence detection (spectral radius of R > 1 — observed on a
        # real multi-robot Hessian where the f32 recursion landed at
        # residual 43 and plain NS exploded to NaN): the residual GROWING
        # is the signature; restart that element from the safe seed.
        # NaN-safe (non-finite residuals restart too); floor noise is NOT
        # divergence, so growth only counts above the tolerance.
        diverged = ~(rn2 <= jnp.maximum(rn_arr * 1.5, tol))
        dd = diverged[..., None, None]
        xn = jnp.where(dd, seed, xn)
        r2 = jnp.where(dd, r_seed, r2)
        rn2 = jnp.where(diverged, rn_seed, rn2)
        return k + 1, xn, r2, rn2, jnp.max(rn_arr)

    state = (jnp.int32(0), x, r, rn, jnp.asarray(jnp.inf, rn.dtype))
    _, x, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x * d[..., :, None] * d[..., None, :]


def pcg_refine(h: jax.Array, b: jax.Array, minv: jax.Array,
               max_iters: int = 64, tol: float = 1e-5) -> jax.Array:
    """Solve ``H X = B`` by dense preconditioned CG with ``minv`` (the
    explicit approximate inverse) as preconditioner AND warm start.

    This is the robustness layer over :func:`spd_inverse`: the matmul
    inverse is exact enough 99% of the time (CG then exits after one or
    two cheap [n,n]×[n,R] matmul iterations), but at condition ~3·10⁵ in
    f32 it can come back with O(1) residual — CG squeezes the Krylov-
    optimal solution out of whatever preconditioner quality it gets, at
    ~(1+ρ)/(1−ρ) effective condition. Every iteration is two batched
    matmuls (MXU); the while_loop exits when the WORST batch element's
    relative residual passes ``tol`` (or at ``max_iters``). Breakdown
    guards zero the step instead of dividing by ~0, so the result is
    always finite for finite inputs.

    ``b`` is ``[..., n, R]`` (R simultaneous right-hand sides, each its
    own CG); returns ``X`` of the same shape.
    """
    x = _mm(minv, b)
    r = b - _mm(h, x)
    z = _mm(minv, r)
    p = z
    rz = jnp.sum(r * z, axis=-2)                       # [..., R]
    bn = jnp.maximum(jnp.sum(b * b, axis=-2), 1e-30)

    def cond(s):
        k, _, rr, _, _ = s
        rel = jnp.sum(rr * rr, axis=-2) / bn
        return (k < max_iters) & (jnp.max(rel) > tol * tol)

    def body(s):
        k, x, rr, p, rz = s
        hp = _mm(h, p)
        denom = jnp.sum(p * hp, axis=-2)
        ok = denom > 1e-30
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        x = x + p * alpha[..., None, :]
        rr = rr - hp * alpha[..., None, :]
        z = _mm(minv, rr)
        rz2 = jnp.sum(rr * z, axis=-2)
        okb = jnp.abs(rz) > 1e-30
        beta = jnp.where(okb, rz2 / jnp.where(okb, rz, 1.0), 0.0)
        p = z + p * beta[..., None, :]
        return k + 1, x, rr, p, rz2

    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rz))
    return x


def _spd_inverse_rec(h: jax.Array) -> jax.Array:
    n = h.shape[-1]
    if n <= _BASE:
        return _gauss_jordan_inverse(h)
    m = n // 2
    a = h[..., :m, :m]
    bt = h[..., :m, m:]
    b = h[..., m:, :m]
    c = h[..., m:, m:]

    ai = _spd_inverse_rec(a)
    ai_bt = _mm(ai, bt)                                   # A⁻¹Bᵀ
    s = c - _mm(b, ai_bt)                                 # Schur complement
    si = _spd_inverse_rec(s)

    tr = -_mm(ai_bt, si)                                  # top-right block
    tl = ai - _mm(tr, jnp.swapaxes(ai_bt, -1, -2))        # A⁻¹ + A⁻¹Bᵀ S⁻¹ B A⁻¹
    out = jnp.concatenate([
        jnp.concatenate([tl, tr], axis=-1),
        jnp.concatenate([jnp.swapaxes(tr, -1, -2), si], axis=-1),
    ], axis=-2)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))    # keep symmetric
