"""Batched SE(2) edge linearization: errors, analytic Jacobians, chi2.

TPU-native replacement for g2o's ``EdgeSE2::computeError`` /
``linearizeOplus`` (the reference relies on these for every solve,
``/root/reference/src/slam/graph_slam.cpp:561-574``). All ``E`` edges of a
graph are linearized in one fused vectorized op — no per-edge virtual calls.

Definitions (matching g2o ``edge_se2.h``):
    error  e = z⁻¹ ∘ (xᵢ⁻¹ ∘ xⱼ)      (angle component wrapped to (-pi,pi])
    chi2     = Σ eᵀ Ω e  over active edges

Analytic Jacobians w.r.t. the additive g2o parameterisation (see
``se2.oplus``):
    e_t = Rz᙮ᵀ (Rᵢᵀ (tⱼ - tᵢ) - t_z),  e_θ = θⱼ - θᵢ - θ_z
    ∂e_t/∂tᵢ = -Rzᵀ Rᵢᵀ      ∂e_t/∂θᵢ = Rzᵀ (dRᵢᵀ/dθ) (tⱼ - tᵢ)
    ∂e_t/∂tⱼ =  Rzᵀ Rᵢᵀ      ∂e_θ/∂θᵢ = -1, ∂e_θ/∂θⱼ = +1
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from functools import partial

# full-f32 MXU precision — see solver/gauss_newton.py rationale
_es = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from cg_mrslam_tpu.core.graph import PoseGraph, unpack_info
from cg_mrslam_tpu.utils import se2


def edge_errors(poses: jax.Array, e_ij: jax.Array, e_z: jax.Array) -> jax.Array:
    """Errors ``[E, 3]`` for all edges given poses ``[N, 3]``."""
    xi = poses[..., e_ij[..., 0], :] if poses.ndim > 2 else poses[e_ij[:, 0]]
    xj = poses[..., e_ij[..., 1], :] if poses.ndim > 2 else poses[e_ij[:, 1]]
    pred = se2.relative(xi, xj)
    return se2.compose(se2.inverse(e_z), pred)


def chi2(g: PoseGraph, edge_mask: jax.Array | None = None) -> jax.Array:
    """Total chi2 = Σ eᵀ Ω e over active edges (g2o ``activeChi2``)."""
    mask = g.emask if edge_mask is None else edge_mask
    e = edge_errors(g.poses, g.e_ij, g.e_z)
    omega = unpack_info(g.e_info)
    per_edge = _es("...ei,...eij,...ej->...e", e, omega, e)
    return jnp.sum(jnp.where(mask, per_edge, 0.0), axis=-1)


def edge_chi2(g: PoseGraph) -> jax.Array:
    """Per-edge chi2 ``[E]`` (unmasked — caller applies masks)."""
    e = edge_errors(g.poses, g.e_ij, g.e_z)
    omega = unpack_info(g.e_info)
    return _es("...ei,...eij,...ej->...e", e, omega, e)


def linearize(
    poses: jax.Array, e_ij: jax.Array, e_z: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Errors + analytic Jacobians for every edge.

    Returns ``(e [E,3], Ji [E,3,3], Jj [E,3,3])`` where ``Ji``/``Jj`` are
    ∂e/∂xᵢ and ∂e/∂xⱼ in g2o's additive chart. Verified against
    ``jax.jacfwd`` in tests/test_linearize.py.
    """
    xi = poses[e_ij[:, 0]]
    xj = poses[e_ij[:, 1]]
    e = se2.compose(se2.inverse(e_z), se2.relative(xi, xj))

    ti, thi = xi[:, :2], xi[:, 2]
    tj = xj[:, :2]
    dz = e_z[:, 2]

    ci, si = jnp.cos(thi), jnp.sin(thi)
    cz, sz = jnp.cos(dz), jnp.sin(dz)

    # A = Rzᵀ Rᵢᵀ = R(-(θz+θi))  [E,2,2]
    cth = cz * ci - sz * si     # cos(θz+θi)
    sth = sz * ci + cz * si     # sin(θz+θi)
    A = jnp.stack(
        [jnp.stack([cth, sth], -1), jnp.stack([-sth, cth], -1)], axis=-2
    )

    # Rzᵀ (dRᵢᵀ/dθ) (tⱼ-tᵢ): dRᵀ/dθ = [[-s, c], [-c, -s]] at θᵢ, then Rzᵀ.
    d = tj - ti
    u = -si * d[:, 0] + ci * d[:, 1]   # (dRᵢᵀ/dθ · d)[0]
    v = -ci * d[:, 0] - si * d[:, 1]   # (dRᵢᵀ/dθ · d)[1]
    g0 = cz * u + sz * v               # Rzᵀ · (u, v)
    g1 = -sz * u + cz * v

    zeros = jnp.zeros_like(cth)
    ones = jnp.ones_like(cth)

    Ji = jnp.stack(
        [
            jnp.stack([-A[:, 0, 0], -A[:, 0, 1], g0], -1),
            jnp.stack([-A[:, 1, 0], -A[:, 1, 1], g1], -1),
            jnp.stack([zeros, zeros, -ones], -1),
        ],
        axis=-2,
    )
    Jj = jnp.stack(
        [
            jnp.stack([A[:, 0, 0], A[:, 0, 1], zeros], -1),
            jnp.stack([A[:, 1, 0], A[:, 1, 1], zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return e, Ji, Jj
