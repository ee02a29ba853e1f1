"""SPMD fleet exchange: batched round == host-loop round == sharded round."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.parallel import fleet
from cg_mrslam_tpu.sim import world as W

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    mr=MRConfig(n_robots=2, min_inliers_mr=4, sim_comm_range=6.0,
                max_score_mr=0.2),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=96, max_edges=512)


def _warm_sim(ticks=260):
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(CFG, world, beams=120, seed=11, n_loops=2,
                            width=16.0, height=10.0)
    sim.run(max_ticks=ticks)
    return sim


def _flat_cmp(a, b, atol=1e-3):
    # Batched (vmap) and host-loop paths are separately jitted programs;
    # XLA fusion differences give last-bits float32 drift that GN
    # iterations amplify. Integer/bool leaves (graph structure, counts,
    # accepted closures) must match EXACTLY — that pins the semantics.
    # Float leaves get atol=1e-3 (≈1 mm / 1 mrad) plus a leaf-scale term:
    # condensed-star information matrices are covariance inverses, whose
    # absolute error scales with ||Lambda|| * kappa * eps (cancellation),
    # so entries of a ~1e4-scale matrix legitimately drift by ~1e-2.
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        if x.dtype == bool or np.issubdtype(x.dtype, np.integer):
            np.testing.assert_array_equal(x, y)
            continue
        scale = float(np.abs(y).max()) if y.size else 0.0
        np.testing.assert_allclose(x, y, atol=atol + 1e-5 * scale)


def test_fleet_round_matches_host_loop():
    sim = _warm_sim()
    conn = jnp.ones((2, 2), bool) & ~jnp.eye(2, dtype=bool)

    batched = fleet.stack_states(sim.states)
    out_batched = fleet.fleet_round(batched, conn, CFG)

    # host-loop oracle: the sim's own exchange with full connectivity
    states = [dataclasses.replace(s) for s in sim.states]
    sim.states = states
    orig = sim.connectivity
    sim.connectivity = lambda t, m: np.asarray(conn)
    sim.exchange_round(0, "real")
    sim.connectivity = orig

    ref = fleet.stack_states(sim.states)
    _flat_cmp(out_batched, ref)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_fleet_round_sharded_matches_batched():
    sim = _warm_sim()
    conn = jnp.ones((2, 2), bool) & ~jnp.eye(2, dtype=bool)
    batched = fleet.stack_states(sim.states)

    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("robots",))
    out_sharded = fleet.fleet_round_sharded(batched, conn, CFG, mesh)
    out_ref = fleet.fleet_round(batched, conn, CFG)
    _flat_cmp(out_sharded, out_ref)
