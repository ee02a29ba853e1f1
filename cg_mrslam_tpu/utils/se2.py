"""Batched SE(2) operations — the foundational type of the framework.

TPU-native replacement for the reference's g2o ``SE2`` type
(``/root/reference/src/slam/graph_slam.h:32-44`` uses ``g2o::SE2`` everywhere).
Instead of an object with a ``Rotation2D`` member, a pose is a ``[..., 3]``
array ``(x, y, theta)`` and every op broadcasts over arbitrary leading batch
dimensions, so whole graphs (and batches of graphs) are transformed in one
fused XLA op.

All functions are pure, jittable, vmappable, and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_angle(theta: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi].

    Matches g2o's ``normalize_theta`` semantics (used by the reference in
    edge errors and vertex updates) without data-dependent branching:
    computed as ``theta - 2*pi*round(theta / (2*pi))``.
    """
    return theta - TWO_PI * jnp.round(theta / TWO_PI)


def rot(theta: jax.Array) -> jax.Array:
    """Rotation matrices ``[..., 2, 2]`` from angles ``[...]``."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """SE(2) group product ``a ∘ b`` for ``[..., 3]`` poses."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = normalize_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def inverse(a: jax.Array) -> jax.Array:
    """SE(2) group inverse for ``[..., 3]`` poses."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, -a[..., 2]], axis=-1)


def relative(a: jax.Array, b: jax.Array) -> jax.Array:
    """``a⁻¹ ∘ b`` — the measurement an edge a→b would predict."""
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    t = normalize_angle(b[..., 2] - a[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def apply(a: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform points ``[..., P, 2]`` by poses ``[..., 3]``."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    px, py = pts[..., 0], pts[..., 1]
    ca, sa = ca[..., None], sa[..., None]
    x = ca * px - sa * py + a[..., 0:1]
    y = sa * px + ca * py + a[..., 1:2]
    return jnp.stack([x, y], axis=-1)


def oplus(pose: jax.Array, delta: jax.Array) -> jax.Array:
    """g2o ``VertexSE2::oplusImpl`` semantics: additive update in the
    *global* frame with angle renormalisation (NOT the SE(2) exp map).

    Matching this exactly is required for chi2-parity with the reference
    optimizer (g2o vertex_se2.h oplusImpl adds the update vector directly).
    """
    return jnp.stack(
        [
            pose[..., 0] + delta[..., 0],
            pose[..., 1] + delta[..., 1],
            normalize_angle(pose[..., 2] + delta[..., 2]),
        ],
        axis=-1,
    )


def exp(xi: jax.Array) -> jax.Array:
    """SE(2) exponential map from twist ``(vx, vy, omega)`` to a pose."""
    w = xi[..., 2]
    # Taylor-safe sinc terms.
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    a = jnp.where(small, 1.0 - w * w / 6.0, jnp.sin(ws) / ws)
    b = jnp.where(small, w / 2.0, (1.0 - jnp.cos(ws)) / ws)
    x = a * xi[..., 0] - b * xi[..., 1]
    y = b * xi[..., 0] + a * xi[..., 1]
    return jnp.stack([x, y, normalize_angle(w)], axis=-1)


def log(pose: jax.Array) -> jax.Array:
    """SE(2) logarithm map, inverse of :func:`exp`."""
    w = pose[..., 2]
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    half = ws / 2.0
    # V^{-1} = [[A, B], [-B, A]] with A = (w/2)·cot(w/2), B = w/2
    A = jnp.where(small, 1.0 - w * w / 12.0, half / jnp.tan(half))
    B = w / 2.0
    vx = A * pose[..., 0] + B * pose[..., 1]
    vy = -B * pose[..., 0] + A * pose[..., 1]
    return jnp.stack([vx, vy, normalize_angle(w)], axis=-1)
