"""Snapshot a REAL 2-robot merged graph for the throughput bench.

Round-2 verdict: the headline bench graph was a single contiguous
odometry chain — chain-friendly by construction in a way no real
2-robot merged graph is. This tool runs the actual exchange protocol
(``mr.sim.MultiRobotSim``: combo messages, closure votes, condensed
stars, foreign vertices appended at arrival time) at hospital scale
until robot 0's view approaches its 1024-vertex capacity, then
snapshots that robot's ``(PoseGraph, v_owner, v_remote)`` to
``tests/fixtures/merged_2robot_1024.npz``.  ``bench.py`` loads the
fixture, perturbs per batch element, and solves it with the PERMUTED
chain+Woodbury path (``solver/chain.py:chain_order``) — the workload
BASELINE.md names, with the structure the protocol actually produces.

Usage: python tools/make_bench_fixture.py [--out PATH] [--ticks N]
"""

from __future__ import annotations

import argparse
import platform
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1]
        / "tests/fixtures/merged_2robot_1024.npz"))
    ap.add_argument("--ticks", type=int, default=100000)
    ap.add_argument("--target-vertices", type=int, default=1000)
    args = ap.parse_args()

    from cg_mrslam_tpu.config import Config, MatcherConfig, MRConfig
    from cg_mrslam_tpu.mr.sim import MultiRobotSim
    from cg_mrslam_tpu.sim import world as W

    cfg = Config(
        mr=MRConfig(n_robots=2, sim_comm_range=1e9),
        close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=1024, max_edges=4096, max_beams=128)
    sim = MultiRobotSim(cfg, W.hospital_world(40.0, 20.0, seed=0),
                        beams=128, seed=0, n_loops=16,
                        width=40.0, height=20.0)

    T = min(len(t.gt) for t in sim.trajs)
    print(f"trajectory ticks available: {T}", file=sys.stderr)
    t0 = time.time()
    # run in chunks so we can stop as soon as robot 0 nears capacity
    step = 200
    done = 0
    while done < min(args.ticks, T - 1):
        sim.run(max_ticks=done + step)
        done += step
        nv = int(sim.states[0].slam.graph.n_vertices)
        ne = int(sim.states[0].slam.graph.n_edges)
        print(f"tick {done}: robot0 n_vertices={nv} n_edges={ne} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
        # fail FAST on a solver blowup — a poisoned state would
        # otherwise silently propagate into the committed fixture
        # (happened once: the chain band's dense fallback at N=1024
        # produced f32 garbage on chip and every pose went NaN)
        for r, s in enumerate(sim.states):
            p = np.asarray(s.slam.graph.poses)
            live = np.asarray(s.slam.graph.vmask)
            assert np.isfinite(p[live]).all(), \
                f"robot {r} poses went non-finite by tick {done}"
        if nv >= args.target_vertices or ne >= cfg.max_edges - 64:
            break

    st = sim.states[0].slam
    g = st.graph
    nv = int(g.n_vertices)
    n_foreign = int(np.sum(np.asarray(g.vmask)
                           & (np.asarray(st.v_owner) != 0)))
    print(f"snapshot: n_vertices={nv} n_edges={int(g.n_edges)} "
          f"foreign={n_foreign}", file=sys.stderr)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out,
        poses=np.asarray(g.poses, np.float32),
        vmask=np.asarray(g.vmask), fixed=np.asarray(g.fixed),
        e_ij=np.asarray(g.e_ij, np.int32),
        e_z=np.asarray(g.e_z, np.float32),
        e_info=np.asarray(g.e_info, np.float32),
        emask=np.asarray(g.emask),
        e_level=np.asarray(g.e_level, np.int32),
        e_owner=np.asarray(g.e_owner, np.int32),
        n_vertices=np.int32(nv), n_edges=np.int32(g.n_edges),
        v_owner=np.asarray(st.v_owner, np.int32),
        v_remote=np.asarray(st.v_remote, np.int32))
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} kB)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
