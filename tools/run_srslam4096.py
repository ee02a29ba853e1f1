"""Capacity-4096 srslam latency check (round-2 verdict item 3 'Done').

Runs the single-robot engine with max_vertices=4096 on the chip long
enough to cross into the 512/1024 buckets (where the chain band is
live) and reports early-run vs late-run keyframe latency. Done
criterion: late-run stays within ~2x of early-run — i.e. the engine no
longer pays dense O(N^3) growth per keyframe; the chain/auto backend
selection is asserted from StepInfo.

Usage: python tools/run_srslam4096.py [--ticks 4000]
"""
from __future__ import annotations

import argparse
import json
import platform
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=4000)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
    from cg_mrslam_tpu.sim import world as W

    cfg = Config(
        slam=SlamConfig(),
        close_matcher=MatcherConfig(extent=30.0, resolution=0.025,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=70.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=4096, max_edges=16384)
    world = W.hospital_world(40.0, 20.0, seed=0)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(40.0, 20.0, 0, 12), seed=1,
        beams=360, fov=2 * np.pi * 0.75, max_range=10.0,
        odom_noise=(0.01, 0.004))
    slam = SingleRobotSlam(cfg, 360, traj.gt[0], traj.ranges[0],
                           2 * np.pi * 0.75, 10.0)
    T = min(args.ticks, len(traj.gt))
    for t in range(1, T):
        if slam.observe(traj.rel_odom[t - 1], traj.ranges[t]):
            n = int(slam.state.graph.n_vertices)
            if n % 100 == 0:
                i = slam.infos[-1]
                print(f"kf {n}: backend={i.solver_backend} "
                      f"chi2={i.chi2:.2f}", file=sys.stderr, flush=True)

    lat = np.asarray(slam.metrics.values("keyframe_latency")) * 1e3
    compile_idx = set(slam.runner.compile_events)
    steady = np.asarray([v for i, v in enumerate(lat)
                         if i not in compile_idx])
    k = steady.size
    early = steady[: max(k // 5, 1)]
    late = steady[-max(k // 5, 1):]
    backends = [i.solver_backend for i in slam.infos]
    out = {
        "keyframes": int(lat.size),
        "compile_events": sorted(compile_idx),
        "early_p50_ms": round(float(np.percentile(early, 50)), 1),
        "late_p50_ms": round(float(np.percentile(late, 50)), 1),
        "late_over_early": round(
            float(np.percentile(late, 50))
            / max(float(np.percentile(early, 50)), 1e-9), 2),
        "p99_ms": round(float(np.percentile(steady, 99)), 1),
        "backend_counts": {
            str(b): int(sum(1 for x in backends if x == b))
            for b in sorted(set(backends))},
        "final_vertices": int(slam.state.graph.n_vertices),
    }
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
