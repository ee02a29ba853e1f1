"""chi2 parity against an independent oracle on committed fixtures.

BASELINE.md's north star is "per-graph chi2 within 1% of g2o at equal
iteration budget". No g2o build/wheel exists in this sandbox and there is
no network egress, so the anchor is the committed output of
``tests/oracle_torch.py`` — torch autograd float64 with its own BFS
initial guess and dense solver (independent differentiation + linear
algebra stack; see that module's docstring for exactly what is and is not
shared). The oracle's own semantics are pinned here against hand-computed
closed-form values, so a shared misreading of g2o's error convention
cannot hide in both stacks.

Fixtures: ``tests/fixtures/*.g2o`` + ``expected_chi2.json``, generated
once by ``tools/make_parity_fixtures.py`` and committed.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cg_mrslam_tpu.core.linearize import chi2 as jchi2
from cg_mrslam_tpu.io import g2o
from cg_mrslam_tpu.solver import gauss_newton as gn
from cg_mrslam_tpu.solver.initial_guess import spanning_tree_guess

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
EXPECTED = json.load(open(os.path.join(FIXDIR, "expected_chi2.json")))
# fast tier runs the smallest fixture (full semantics coverage); the
# 80-vertex ones repeat the same checks at scale in the full gate —
# they were the fast tier's heaviest items (~55 s each on this box)
NAMES = [n if "60" in n else
         pytest.param(n, marks=pytest.mark.slow)
         for n in sorted(EXPECTED)]


def test_error_convention_closed_form():
    """Pin the g2o EdgeSE2 error e = z⁻¹ ∘ (xᵢ⁻¹ xⱼ) on hand-computed
    constants — for BOTH the oracle and the implementation, so the two
    stacks cannot share a misreading.

    xi=(1,2,π/2), xj=(2,4,π), z=(1.5,0.5,π/3):
      xᵢ⁻¹xⱼ = (2,−1,π/2);  e = Rz(−π/3)·((2,−1)−(1.5,0.5)), π/2−π/3
             = (0.5·0.5 + (√3/2)·(−1.5), −(√3/2)·0.5 + 0.5·(−1.5), π/6)
    """
    import torch

    import oracle_torch as O

    xi = np.array([1.0, 2.0, np.pi / 2])
    xj = np.array([2.0, 4.0, np.pi])
    z = np.array([1.5, 0.5, np.pi / 3])
    want = np.array([
        0.5 * 0.5 + np.sqrt(3) / 2 * (-1.5),
        -np.sqrt(3) / 2 * 0.5 + 0.5 * (-1.5),
        np.pi / 6,
    ])
    got_oracle = O.edge_error(torch.tensor(xi), torch.tensor(xj),
                              torch.tensor(z)).numpy()
    np.testing.assert_allclose(got_oracle, want, atol=1e-12)

    from cg_mrslam_tpu.core.linearize import edge_errors

    got_jax = np.asarray(edge_errors(
        jnp.asarray([xi, xj], jnp.float64),
        jnp.asarray([[0, 1]], jnp.int32),
        jnp.asarray([z], jnp.float64)))[0]
    np.testing.assert_allclose(got_jax, want, atol=1e-9)


def _load(name):
    return g2o.load(os.path.join(FIXDIR, f"{name}.g2o"),
                    dtype=jnp.float64).graph


@pytest.mark.parametrize("name", NAMES)
def test_raw_gn_chi2_parity(name):
    """optimize(5) from the stored estimates: chi2 after EVERY iteration
    within 1% of the float64 oracle."""
    g = _load(name)
    exp = EXPECTED[name]
    np.testing.assert_allclose(float(jchi2(g)), exp["chi2_initial"],
                               rtol=1e-6)
    for k, want in enumerate(exp["raw"]):
        g = gn.gn_step(g)
        got = float(jchi2(g))
        assert abs(got - want) <= 0.01 * abs(want), (
            f"{name} iter {k}: {got} vs oracle {want}")


@pytest.mark.parametrize("name", NAMES)
def test_initial_guess_chi2_parity(name):
    """computeInitialGuess + optimize(10): spanning-tree re-initialization
    then GN, each iteration's chi2 within 1% of the oracle. (Different
    same-hop tie-breaking between the two BFS implementations could pick
    different spanning trees; these fixtures' chi2-after-guess agreeing
    to 1% shows they picked equivalent trees.)"""
    g = _load(name)
    exp = EXPECTED[name]
    g = spanning_tree_guess(g, sweeps=128)
    got0 = float(jchi2(g))
    want0 = exp["chi2_after_guess"]
    assert abs(got0 - want0) <= 0.01 * abs(want0), (got0, want0)
    for k, want in enumerate(exp["guess"]):
        g = gn.gn_step(g)
        got = float(jchi2(g))
        assert abs(got - want) <= 0.01 * abs(want), (
            f"{name} iter {k}: {got} vs oracle {want}")


def test_spanning_tree_respects_edge_subset():
    """Propagation restricted to an edge subset must not cross excluded
    edges (initializeOptimization(edgeSet) semantics)."""
    from cg_mrslam_tpu.core import graph as G

    g = G.empty(4, 4)
    g = G.add_vertex(g, jnp.asarray([0.0, 0.0, 0.0]), fixed=True)
    for k in range(1, 4):
        g = G.add_vertex(g, jnp.asarray([float(k) + 5.0, 0.0, 0.0]))
    info = jnp.asarray([1.0, 0, 0, 1.0, 0, 1.0])
    for k in range(3):
        g = G.add_edge(g, k, k + 1, jnp.asarray([1.0, 0.0, 0.0]), info)
    sub = jnp.asarray([True, True, False, False])
    out = spanning_tree_guess(g, edge_mask=sub, sweeps=8)
    got = np.asarray(out.poses)
    np.testing.assert_allclose(got[1], [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(got[2], [2.0, 0, 0], atol=1e-6)
    # vertex 3 unreachable through the subset: estimate untouched
    np.testing.assert_allclose(got[3], [8.0, 0, 0], atol=1e-6)
