"""Independent pose-graph GN oracle: torch autograd, float64, dense solve.

The chi2-parity north star (BASELINE.md: within 1% of g2o at equal
iteration budget) needs an anchor that does NOT share code with the
implementation under test. No g2o build or wheel exists in this sandbox
and there is no network egress, so a real g2o run is impossible here; this
oracle is the strongest available substitute:

* Jacobians come from ``torch.autograd`` — an entirely different
  differentiation stack than the hand-derived analytic Jacobians in
  ``core/linearize.py``, so a shared misreading of the error function's
  derivatives cannot hide;
* the linear solve is ``torch.linalg.solve`` in float64 (vs the JAX
  matmul SPD inverse in float32);
* the spanning-tree initial guess is an explicit host-side BFS (vs the
  scatter-min relaxation in ``solver/initial_guess.py``).

What it DOES share with the implementation (unavoidably) is the problem
definition itself, taken from g2o's documented semantics: error
``e = z⁻¹ ∘ (xᵢ⁻¹ xⱼ)`` with angle normalization (g2o ``edge_se2.h``),
additive vertex update with angle normalization (``vertex_se2.h
oplusImpl``), gauge by fixed vertices, and BFS measurement propagation
(``SparseOptimizer::computeInitialGuess``). Those semantics are pinned by
closed-form hand-computed cases in ``test_parity_fixtures.py``.

Fixture chi2-per-iteration values generated from this oracle are
committed under ``tests/fixtures/`` and asserted against in CI.
"""

from __future__ import annotations

import numpy as np
import torch

torch.set_default_dtype(torch.float64)


def normalize(t):
    if isinstance(t, torch.Tensor):
        return t - 2 * torch.pi * torch.round(t / (2 * torch.pi))
    return t - 2 * np.pi * np.round(t / (2 * np.pi))


def edge_error(xi: torch.Tensor, xj: torch.Tensor,
               z: torch.Tensor) -> torch.Tensor:
    """g2o EdgeSE2 error: z⁻¹ ∘ (xᵢ⁻¹ ∘ xⱼ), angle normalized."""
    ci, si = torch.cos(xi[2]), torch.sin(xi[2])
    dx, dy = xj[0] - xi[0], xj[1] - xi[1]
    rx = ci * dx + si * dy
    ry = -si * dx + ci * dy
    rt = xj[2] - xi[2]
    cz, sz = torch.cos(z[2]), torch.sin(z[2])
    ex = cz * (rx - z[0]) + sz * (ry - z[1])
    ey = -sz * (rx - z[0]) + cz * (ry - z[1])
    et = normalize(rt - z[2])
    return torch.stack([ex, ey, et])


def chi2(poses: np.ndarray, e_ij: np.ndarray, e_z: np.ndarray,
         e_info: np.ndarray) -> float:
    p = torch.as_tensor(poses)
    total = 0.0
    for k in range(e_ij.shape[0]):
        i, j = int(e_ij[k, 0]), int(e_ij[k, 1])
        e = edge_error(p[i], p[j], torch.as_tensor(e_z[k]))
        omega = _unpack(e_info[k])
        total += float(e @ torch.as_tensor(omega) @ e)
    return total


def _unpack(p6: np.ndarray) -> np.ndarray:
    xx, xy, xt, yy, yt, tt = p6
    return np.array([[xx, xy, xt], [xy, yy, yt], [xt, yt, tt]])


def spanning_tree_init(poses: np.ndarray, fixed: np.ndarray,
                       e_ij: np.ndarray, e_z: np.ndarray) -> np.ndarray:
    """Layer-synchronous BFS from fixed vertices, composing measurements
    (g2o EstimatePropagator with uniform edge cost). g2o's choice among
    equal-hop parents is implementation-defined; both this oracle and the
    implementation under test pin the SAME deterministic rule — per BFS
    layer, the incident edge with the smallest code ``2·edge + (0 if
    forward else 1)`` wins — so trees (hence chi2-after-guess) agree
    exactly."""
    n = poses.shape[0]
    out = poses.copy()
    dist = np.full(n, np.inf)
    dist[fixed] = 0.0
    frontier = set(np.nonzero(fixed)[0].tolist())
    while frontier:
        best: dict = {}   # child -> (code, parent, edge, direction)
        for k in range(e_ij.shape[0]):
            i, j = int(e_ij[k, 0]), int(e_ij[k, 1])
            if i in frontier and dist[j] == np.inf:
                c = 2 * k
                if j not in best or c < best[j][0]:
                    best[j] = (c, i, k, +1)
            if j in frontier and dist[i] == np.inf:
                c = 2 * k + 1
                if i not in best or c < best[i][0]:
                    best[i] = (c, j, k, -1)
        frontier = set()
        for u, (_, v, k, d) in best.items():
            dist[u] = dist[v] + 1
            z = e_z[k] if d > 0 else _se2_inv(e_z[k])
            out[u] = _se2_compose(out[v], z)
            frontier.add(u)
    return out


def _se2_compose(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([
        a[0] + c * b[0] - s * b[1],
        a[1] + s * b[0] + c * b[1],
        normalize(a[2] + b[2]),
    ])


def _se2_inv(a):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]),
                     -a[2]])


def gn_iterations(poses: np.ndarray, fixed: np.ndarray, e_ij: np.ndarray,
                  e_z: np.ndarray, e_info: np.ndarray,
                  iterations: int = 5) -> list:
    """Run GN with autograd Jacobians; returns chi2 AFTER each iteration
    (g2o ``optimize(n)`` reports the same sequence)."""
    n = poses.shape[0]
    p = poses.copy()
    out = []
    for _ in range(iterations):
        H = np.zeros((3 * n, 3 * n))
        b = np.zeros(3 * n)
        for k in range(e_ij.shape[0]):
            i, j = int(e_ij[k, 0]), int(e_ij[k, 1])
            xi = torch.tensor(p[i], requires_grad=True)
            xj = torch.tensor(p[j], requires_grad=True)
            z = torch.as_tensor(e_z[k])
            J = torch.autograd.functional.jacobian(
                lambda a, c: edge_error(a, c, z), (xi, xj))
            Ji = J[0].numpy()
            Jj = J[1].numpy()
            with torch.no_grad():
                e = edge_error(torch.as_tensor(p[i]), torch.as_tensor(p[j]),
                               z).numpy()
            om = _unpack(e_info[k])
            H[3 * i:3 * i + 3, 3 * i:3 * i + 3] += Ji.T @ om @ Ji
            H[3 * i:3 * i + 3, 3 * j:3 * j + 3] += Ji.T @ om @ Jj
            H[3 * j:3 * j + 3, 3 * i:3 * i + 3] += Jj.T @ om @ Ji
            H[3 * j:3 * j + 3, 3 * j:3 * j + 3] += Jj.T @ om @ Jj
            b[3 * i:3 * i + 3] += Ji.T @ om @ e
            b[3 * j:3 * j + 3] += Jj.T @ om @ e
        free = np.repeat(~fixed, 3)
        Hf = H[np.ix_(free, free)]
        bf = b[free]
        dx = np.zeros(3 * n)
        dx[free] = np.linalg.solve(Hf, -bf)
        p = p + dx.reshape(n, 3)
        p[:, 2] = normalize(p[:, 2])
        out.append(chi2(p, e_ij, e_z, e_info))
    return out
