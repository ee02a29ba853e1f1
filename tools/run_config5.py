"""BASELINE config 5 demonstration: 64-robot condensed-graph fleet +
100k-pose solve, sharded over an 8-device mesh with collective Hessian
reduction.

Runs on the virtual 8-device CPU mesh (the sandbox has one TPU chip; the
same shard_map/psum/all_gather programs drive a real multi-host slice —
the driver's multichip dryrun validates that path every round). Records
wall-clock + chi2 to artifacts/config5_sharded.json.

Part A — 64 robots on 8 devices (8 per shard block):
  one `fleet_round_sharded` exchange round over the `robots` axis
  (all_gather'd combo/closure-list/star tables), parity-checked against
  the single-device batched `fleet_round`.
Part B — 100k-pose graph, edges sharded over 8 devices:
  `sharded_optimize_pcg` (matrix-free GN; per-CG-step collective is one
  psum'd [N,3] vector), chi2 collapse asserted.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cg_mrslam_tpu.config import Config, MatcherConfig, MRConfig
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.parallel import fleet, sharding

OUT = Path(__file__).resolve().parents[1] / "artifacts/config5_sharded.json"
R = 64


def build_fleet_states():
    """64 tiny robots on a shared 80x40 m site, pre-seeded with short
    own chains so every protocol phase has real work."""
    cfg = Config(mr=MRConfig(n_robots=R, sim_comm_range=15.0),
                 close_matcher=MatcherConfig(extent=8.0, resolution=0.1,
                                             kernel_radius=0.2),
                 lc_matcher=MatcherConfig(extent=12.0, resolution=0.2,
                                          kernel_radius=0.5),
                 max_vertices=64, max_edges=256, max_beams=32)
    import dataclasses

    from cg_mrslam_tpu.core import graph as G

    beams = 32
    states = []
    rng = np.random.default_rng(0)
    for r in range(R):
        x0 = (r % 8) * 10.0
        y0 = (r // 8) * 5.0
        ranges = np.full(beams, 4.0, np.float32)
        st = MR.init_mr_state(cfg, beams, [x0, y0, 0.0], ranges,
                              2 * np.pi * 0.75, 6.0, my_id=r)
        slam = st.slam
        for k in range(1, 6):
            pose = jnp.asarray([x0 + 0.5 * k, y0, 0.0])
            slam = dataclasses.replace(
                slam,
                graph=G.add_edge(
                    G.add_vertex(slam.graph, pose), k - 1, k,
                    jnp.asarray([0.5, 0.0, 0.0]),
                    np.asarray([100, 0, 0, 100, 0, 1000], np.float32),
                    owner=r),
                v_owner=slam.v_owner.at[k].set(r),
                v_remote=slam.v_remote.at[k].set(k))
        scans = slam.scans
        ranges_all = np.asarray(scans.ranges).copy()
        ranges_all[:6] = 4.0 + 0.2 * rng.random((6, beams))
        smask = np.asarray(scans.smask).copy()
        smask[:6] = True
        slam = dataclasses.replace(
            slam, scans=dataclasses.replace(
                scans, ranges=jnp.asarray(ranges_all),
                smask=jnp.asarray(smask)))
        states.append(dataclasses.replace(st, slam=slam))
    return cfg, states


def part_a():
    cfg, states = build_fleet_states()
    batched = fleet.stack_states(states)
    # neighbours within 15 m are connected
    pos = np.asarray([np.asarray(s.slam.graph.poses[0, :2])
                      for s in states])
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    conn = jnp.asarray((d < cfg.mr.sim_comm_range) & ~np.eye(R, dtype=bool))

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("robots",))
    placed = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("robots"))),
        batched)

    t0 = time.perf_counter()
    out_sharded = jax.block_until_ready(
        fleet.fleet_round_sharded(placed, conn, cfg, mesh))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_sharded = jax.block_until_ready(
        fleet.fleet_round_sharded(placed, conn, cfg, mesh))
    round_s = time.perf_counter() - t0

    out_ref = jax.block_until_ready(fleet.fleet_round(batched, conn, cfg))

    # parity: graph structure must match the single-device batched round
    for name, get in (("n_vertices", lambda s: s.slam.graph.n_vertices),
                      ("n_edges", lambda s: s.slam.graph.n_edges),
                      ("parked", lambda s: s.parked),
                      ("emask", lambda s: s.slam.graph.emask)):
        np.testing.assert_array_equal(np.asarray(get(out_sharded)),
                                      np.asarray(get(out_ref)), err_msg=name)
    foreign = int(np.sum(np.asarray(out_sharded.slam.graph.vmask)
                         & (np.asarray(out_sharded.slam.v_owner)
                            != np.arange(R)[:, None])))
    return {
        "robots": R, "devices": 8, "robots_per_shard": R // 8,
        "round_wall_s": round(round_s, 3),
        "first_call_incl_compile_s": round(compile_s, 1),
        "foreign_vertices_total": foreign,
        "links": int(conn.sum()),
        "parity_vs_batched": "exact structure match",
    }


def part_b(n: int = 102400):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import build_hospital_batch
    from cg_mrslam_tpu.core.linearize import chi2

    g = build_hospital_batch(1, n=n, closures=2049, seed=3)  # e % 8 == 0
    mesh = sharding.make_mesh(8, shard=8, devices=jax.devices("cpu"))
    placed = sharding.shard_batch(g, mesh)
    step = jax.jit(lambda gg: sharding.sharded_optimize_pcg(
        gg, mesh, iterations=5, cg_iters=96))
    t0 = time.perf_counter()
    poses = jax.block_until_ready(step(placed))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    poses = jax.block_until_ready(step(placed))
    solve_s = time.perf_counter() - t0
    import dataclasses

    c0 = float(jax.vmap(chi2)(g)[0])
    c1 = float(jax.vmap(chi2)(
        dataclasses.replace(g, poses=poses))[0])
    assert np.isfinite(c1) and c1 < 1e-3 * c0, (c0, c1)
    return {
        "poses": n, "devices": 8, "edge_shards": 8,
        "gn_iterations": 5, "cg_iters": 96,
        "solve_wall_s": round(solve_s, 2),
        "first_call_incl_compile_s": round(compile_s, 1),
        "chi2": [round(c0, 1), round(c1, 4)],
        "collective": "psum over edge shards, one [N,3] vector per CG step",
    }


def main():
    rec = {
        "what": ("BASELINE config 5: 64-robot condensed-graph fleet + "
                 "100k-pose solve sharded over an 8-device mesh "
                 "(virtual CPU devices — single-chip sandbox; same SPMD "
                 "programs target a real slice)"),
        "fleet64": part_a(),
        "solve100k": part_b(),
    }
    OUT.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
