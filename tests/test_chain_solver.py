"""Chain+Woodbury solver parity with the dense GN solver.

The fast path must produce the SAME update as the dense solver on any
graph where every free vertex touches a chain edge — the Woodbury
identity is exact, not approximate. Pinned here on chains with loop
closures, gauge variations, masked slots, and the vmap'd batch form.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.core.linearize import chi2
from cg_mrslam_tpu.solver import chain as CH
from cg_mrslam_tpu.solver import gauss_newton as gn


def _loop_graph(n=50, closures=5, seed=0, cap_v=64, cap_e=128):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack([8 * np.cos(th), 8 * np.sin(th), th + np.pi / 2], 1)
    est = gt + np.concatenate(
        [rng.normal(0, 0.2, (n, 2)), rng.normal(0, 0.05, (n, 1))], 1)
    est[0] = gt[0]

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                         (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi])

    g = G.empty(cap_v, cap_e)
    g = G.add_vertex(g, jnp.asarray(est[0], jnp.float32), fixed=True)
    info = jnp.asarray([100.0, 10.0, 0, 100.0, 0, 1000.0], jnp.float32)
    for k in range(1, n):
        g = G.add_vertex(g, jnp.asarray(est[k], jnp.float32))
    for k in range(n - 1):
        g = G.add_edge(g, k, k + 1, jnp.asarray(rel(gt[k], gt[k + 1]),
                                                jnp.float32), info)
    for c in range(closures):
        i = int(rng.integers(0, n - 1))
        j = (i + n // 2) % n
        i, j = min(i, j), max(i, j)
        if j == i + 1:
            continue
        g = G.add_edge(g, i, j, jnp.asarray(rel(gt[i], gt[j]), jnp.float32),
                       info)
    return g


def test_chainable_detection():
    """``chainable`` = "fast path exact vs dense here": loop-cap
    overflow disqualifies; a vertex held only by a BEYOND-cap loop edge
    disqualifies (dense would solve it, the truncated system pins it);
    a fully isolated vertex does NOT (both solvers pin it)."""
    g = _loop_graph()
    assert bool(CH.chainable(g))
    assert bool(CH.chainable(g, loop_cap=16))
    # overflow: more loop edges than the cap
    assert not bool(CH.chainable(g, loop_cap=1))

    # kill vertex 10's chain edges
    kill = np.zeros(g.e_ij.shape[0], bool)
    e_ij = np.asarray(g.e_ij)
    em = np.asarray(g.emask)
    for k in range(len(kill)):
        if em[k] and 10 in (e_ij[k, 0], e_ij[k, 1]) and \
                abs(e_ij[k, 1] - e_ij[k, 0]) == 1:
            kill[k] = True
    g2 = G.remove_edges(g, jnp.asarray(kill))
    touches_10 = em & ~kill & ((e_ij[:, 0] == 10) | (e_ij[:, 1] == 10))
    if not touches_10.any():
        # isolated: pinned by both solvers -> still chainable, and the
        # fast path must MATCH dense on the remaining graph
        assert bool(CH.chainable(g2, loop_cap=16))
        dx_d = gn.solve_normal_equations(gn.build_normal_equations(g2))
        dx_c, _ = CH.chain_delta(g2, loop_cap=16)
        np.testing.assert_allclose(np.asarray(dx_c).reshape(-1),
                                   np.asarray(dx_d), rtol=5e-3, atol=5e-4)


def test_chainable_beyond_cap_coverage():
    """A vertex constrained ONLY by loop edges beyond the cap makes the
    truncated system pin what dense would solve -> not chainable."""
    g = _loop_graph(closures=0)
    # break v25 out of the chain, re-attach it with one loop edge to v5
    kill = np.zeros(g.e_ij.shape[0], bool)
    e_ij = np.asarray(g.e_ij)
    em = np.asarray(g.emask)
    for k in range(len(kill)):
        if em[k] and 25 in (e_ij[k, 0], e_ij[k, 1]) and \
                abs(e_ij[k, 1] - e_ij[k, 0]) == 1:
            kill[k] = True
    g2 = G.remove_edges(g, jnp.asarray(kill))
    info = jnp.asarray([100.0, 0, 0, 100.0, 0, 1000.0], jnp.float32)
    # two earlier loop edges fill a cap of 2; v25's edge is the third
    g2 = G.add_edge(g2, 2, 8, jnp.zeros(3, jnp.float32), info)
    g2 = G.add_edge(g2, 12, 18, jnp.zeros(3, jnp.float32), info)
    g2 = G.add_edge(g2, 5, 25, jnp.zeros(3, jnp.float32), info)
    assert bool(CH.chainable(g2, loop_cap=3))     # all loops fit: exact
    assert not bool(CH.chainable(g2, loop_cap=2))  # v25 only beyond cap


def test_chain_delta_matches_dense():
    g = _loop_graph()
    eq = gn.build_normal_equations(g)
    dx_dense = gn.solve_normal_equations(eq)
    dx_chain, dropped = CH.chain_delta(g, loop_cap=16)
    assert int(dropped) == 0
    # chain solves through pcg_refine at rel-tol 1e-5 of ||b||; on this
    # graph that is ~5e-4 absolute on dx
    np.testing.assert_allclose(np.asarray(dx_chain).reshape(-1),
                               np.asarray(dx_dense), rtol=5e-3, atol=5e-4)


def test_optimize_chain_chi2_matches_dense():
    g = _loop_graph(seed=3)
    c0 = float(chi2(g))
    dense = gn.optimize(g, iterations=5)
    fast = CH.optimize_chain(g, iterations=5, loop_cap=16)
    cd, cf = float(chi2(dense)), float(chi2(fast))
    assert cf < 0.05 * c0                       # actually converged
    assert abs(cf - cd) <= 0.01 * max(cd, 1e-6)


def test_loop_cap_overflow_counted():
    g = _loop_graph(closures=8)
    _, dropped = CH.chain_delta(g, loop_cap=2)
    assert int(dropped) >= 1


def test_batched_vmap_form():
    gs = [_loop_graph(seed=s) for s in range(4)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gs)
    out = jax.vmap(lambda gg: CH.optimize_chain(gg, iterations=3,
                                                loop_cap=16))(batch)
    ref = jax.vmap(lambda gg: gn.optimize(gg, iterations=3))(batch)
    cf = np.asarray(jax.vmap(chi2)(out))
    cd = np.asarray(jax.vmap(chi2)(ref))
    # exact measurements → both converge to ~0; compare at solver-noise
    # scale rather than relative on ~1e-9 values
    assert (cf < 1e-6).all(), cf
    np.testing.assert_allclose(cf, cd, atol=1e-6)


@pytest.mark.slow  # N=1024 f32-vs-f64 tracking; bench asserts
# the same property on chip every round (chi2 collapse guard)
def test_hospital_scale_f32_accuracy():
    """N=1024: the f32 chain solve must track the f64 one (the TPU bench
    regime; at bf16 matmul precision this diverges to NaN — chain.py
    forces f32, and this test pins the f32 error stays in class)."""
    g = _loop_graph(n=1024, closures=24, seed=5, cap_v=1024, cap_e=1100)
    # perturb so the solve does real work
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    noisy = np.asarray(g.poses).copy()
    noisy[1:] += np.concatenate(
        [rng.normal(0, 0.1, (1023, 2)), rng.normal(0, 0.03, (1023, 1))], 1)
    g = dataclasses.replace(g, poses=jnp.asarray(noisy, jnp.float32))
    g64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a,
        g)
    out32 = CH.optimize_chain(g, iterations=5, loop_cap=32)
    out64 = CH.optimize_chain(g64, iterations=5, loop_cap=32)
    c32 = float(chi2(out32))
    c64 = float(chi2(out64))
    assert np.isfinite(c32)
    # both converge to the noise floor; f32 lands within solver-noise of
    # the f64 result (absolute floor, not relative on ~0 chi2)
    c_init = float(chi2(g))
    assert c32 < 1e-4 * c_init, (c32, c_init)
    assert abs(c32 - c64) <= max(0.01 * c64, 5e-3), (c32, c64)


def test_bench_geometry_f32_convergence():
    """The EXACT headline-bench regime (40 m ring, info 100/100/1000,
    0.15 m / 0.04 rad noise, 48 cross-ring closures): the round-2 on-chip
    failure mode — the undamped chain factor-and-correct variant took
    chi2 6.3e4 -> 7.3e7 -> NaN here while the smaller-radius test above
    passed. The damped-preconditioner CG form must converge."""
    import sys
    sys.path.insert(0, ".")
    from bench import build_hospital_batch

    g0 = build_hospital_batch(2)
    g = jax.tree_util.tree_map(lambda a: a[0], g0)
    c0 = float(chi2(g))
    out = CH.optimize_chain(g, iterations=5, loop_cap=64)
    c1 = float(chi2(out))
    assert np.isfinite(c1)
    assert c1 < 1e-4 * c0, (c0, c1)


def test_cg_exit_selector_nan_safe():
    """ADVICE r03 (medium): a diverging f32 CG exits the while_loop with
    rr2_fin = inf/NaN (NaN comparisons are False). The selector must
    treat ANY non-finite final residual as breakdown and return the
    tracked best iterate — the plain `>` predicate is False on NaN and
    would return the poisoned final iterate."""
    from cg_mrslam_tpu.solver.chain import _select_cg_iterate

    xb = jnp.ones((4, 3), jnp.float32)
    x_nan = jnp.full((4, 3), jnp.nan, jnp.float32)
    for bad in (np.nan, np.inf):
        out = _select_cg_iterate(x_nan, jnp.float32(bad), xb,
                                 jnp.float32(1.0))
        np.testing.assert_array_equal(np.asarray(out), 1.0)
    # noise-level oscillation (final within 4x of best): keep FINAL
    out = _select_cg_iterate(2 * xb, jnp.float32(3.0), xb,
                             jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out), 2.0)
    # genuine finite breakdown (>4x): fall back to best
    out = _select_cg_iterate(2 * xb, jnp.float32(5.0), xb,
                             jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out), 1.0)


def test_cg_budget_overshoot_is_safe():
    """VERDICT r03 item 5: f32 CG sits at a breakdown cliff past ~24
    iterations on the hospital problem (measured on chip: cg32 and cg48
    DEGRADE vs cg24). Best-iterate selection must make every budget
    safe — overshooting wastes time, never accuracy: deeper budgets stay
    finite and never land far above the shallow-budget chi2."""
    import sys
    sys.path.insert(0, ".")
    from bench import build_hospital_batch

    g = jax.tree_util.tree_map(lambda a: a[0], build_hospital_batch(1))
    c0 = float(chi2(g))
    ref = float(chi2(CH.optimize_chain(g, iterations=5, cg_iters=24,
                                       cg_tol=1e-4, loop_cap=64)))
    assert ref < 1e-4 * c0
    for it in (48, 96):
        c = float(chi2(CH.optimize_chain(g, iterations=5, cg_iters=it,
                                         cg_tol=1e-4, loop_cap=64)))
        assert np.isfinite(c), it
        # never catastrophic: within a modest factor of the shallow
        # budget or below an absolute floor (chip cliff measured 0.1035
        # at cg24 vs 130 at cg32 pre-selection)
        assert c <= max(10.0 * ref, 1e-3 * c0), (it, c, ref)


def test_freeze_precond_guard():
    """VERDICT r03 item 6: ``freeze_precond=True`` diverges on chip at
    hospital scale; the guard must make the lever safe. Pins (a) the
    NaN-safe recovery predicate and (b) that the guarded lever still
    converges end-to-end at hospital scale (CPU: recovery may or may
    not fire, but the result must always be finite and collapsed)."""
    from cg_mrslam_tpu.solver.chain import _freeze_diverged

    # predicate: catastrophic growth and non-finite chi2 trigger; a
    # mild overshoot does not
    assert bool(_freeze_diverged(jnp.float32(6.2e4), jnp.float32(8.5e7)))
    assert bool(_freeze_diverged(jnp.float32(1.0), jnp.float32(jnp.nan)))
    assert bool(_freeze_diverged(jnp.float32(1.0), jnp.float32(jnp.inf)))
    assert not bool(_freeze_diverged(jnp.float32(100.0),
                                     jnp.float32(150.0)))
    assert not bool(_freeze_diverged(jnp.float32(1e-6),
                                     jnp.float32(2e-6)))

    import sys
    sys.path.insert(0, ".")
    from bench import build_hospital_batch

    g = jax.tree_util.tree_map(lambda a: a[0], build_hospital_batch(1))
    c0 = float(chi2(g))
    out = CH.optimize_chain(g, iterations=5, freeze_precond=True,
                            cg_iters=24, cg_tol=1e-4, loop_cap=64)
    c1 = float(chi2(out))
    assert np.isfinite(c1)
    assert c1 < 1e-3 * c0, (c0, c1)
