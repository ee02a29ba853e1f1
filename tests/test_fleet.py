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


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_fleet_round_sharded_robot_blocks():
    """Shard size > 1 (R=4 robots on 2 devices): the vmapped-block SPMD
    round must produce the exact structure of the batched round — the
    64-robot/8-device configuration (BASELINE config 5,
    tools/run_config5.py) is this path at scale."""
    from cg_mrslam_tpu.core import graph as G
    from cg_mrslam_tpu.mr import mrslam as MR

    cfg = Config(
        mr=MRConfig(n_robots=4, sim_comm_range=8.0),
        close_matcher=MatcherConfig(extent=8.0, resolution=0.1,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=12.0, resolution=0.2,
                                 kernel_radius=0.5),
        max_vertices=32, max_edges=64, max_beams=16)
    beams = 16
    rng = np.random.default_rng(0)
    states = []
    for r in range(4):
        ranges = np.full(beams, 4.0, np.float32)
        st = MR.init_mr_state(cfg, beams, [3.0 * r, 0.0, 0.0], ranges,
                              2 * np.pi * 0.75, 6.0, my_id=r)
        slam = st.slam
        for k in range(1, 4):
            pose = jnp.asarray([3.0 * r + 0.5 * k, 0.0, 0.0])
            slam = dataclasses.replace(
                slam,
                graph=G.add_edge(
                    G.add_vertex(slam.graph, pose), k - 1, k,
                    jnp.asarray([0.5, 0.0, 0.0]),
                    np.asarray([100, 0, 0, 100, 0, 1000], np.float32),
                    owner=r),
                v_owner=slam.v_owner.at[k].set(r),
                v_remote=slam.v_remote.at[k].set(k))
        ranges_all = np.asarray(slam.scans.ranges).copy()
        ranges_all[:4] = 4.0 + 0.2 * rng.random((4, beams))
        smask = np.asarray(slam.scans.smask).copy()
        smask[:4] = True
        slam = dataclasses.replace(
            slam, scans=dataclasses.replace(
                slam.scans, ranges=jnp.asarray(ranges_all),
                smask=jnp.asarray(smask)))
        states.append(dataclasses.replace(st, slam=slam))

    batched = fleet.stack_states(states)
    conn = jnp.ones((4, 4), bool) & ~jnp.eye(4, dtype=bool)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("robots",))
    placed = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("robots"))),
        batched)
    out_sharded = fleet.fleet_round_sharded(placed, conn, cfg, mesh)
    out_ref = fleet.fleet_round(batched, conn, cfg)
    _flat_cmp(out_sharded, out_ref)
