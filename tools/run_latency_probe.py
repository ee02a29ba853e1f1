"""Diagnose the keyframe-latency tail: rerun the bench replay and dump
every steady keyframe above 150 ms with its bucket, index, and distance
to the nearest compile/prewarm event — separates 'prewarm compiles
contend with the tunnel' from 'random tunnel brownouts'."""

import json
import platform
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main(ticks=2300):
    from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
    from cg_mrslam_tpu.pipeline import slam as SL
    from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
    from cg_mrslam_tpu.sim import world as W

    cfg = Config(
        slam=SlamConfig(),
        close_matcher=MatcherConfig(extent=30.0, resolution=0.025,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=70.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=1024, max_edges=4096)
    world = W.hospital_world(40.0, 20.0, seed=0)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(40.0, 20.0, 0, 4), seed=1,
        beams=360, fov=2 * np.pi * 0.75, max_range=10.0,
        odom_noise=(0.01, 0.004))
    slam = SingleRobotSlam(cfg, 360, traj.gt[0], traj.ranges[0],
                           2 * np.pi * 0.75, 10.0)
    T = min(ticks, len(traj.gt))
    buckets = []
    warm_spans = []   # (kf_index_started, thread) for inflight tracking
    t_start = time.perf_counter()
    kf_times = []     # wall time at each keyframe (for overlap analysis)
    for t in range(1, T):
        nb, eb = SL._bucket_pair(slam.state, slam.runner.n_live,
                                 slam.runner.e_live)
        inflight_before = {k: th.is_alive()
                           for k, th in slam.runner._inflight.items()}
        if slam.observe(traj.rel_odom[t - 1], traj.ranges[t]):
            buckets.append((nb, eb))
            kf_times.append(time.perf_counter() - t_start)
            warm_spans.append(dict(inflight=[
                str(k) for k, alive in inflight_before.items() if alive]))
    lat = np.asarray(slam.metrics.values("keyframe_latency"))
    compile_idx = set(slam.runner.compile_events)
    rows = []
    for i, v in enumerate(lat):
        if i in compile_idx or v < 0.15:
            continue
        rows.append({
            "kf": i, "ms": round(float(v) * 1e3, 1),
            "bucket": list(buckets[i]),
            "inflight_compiles": warm_spans[i]["inflight"],
            "dist_to_compile_event": min(
                (abs(i - c) for c in compile_idx), default=-1),
        })
    steady = np.asarray([v for i, v in enumerate(lat)
                         if i not in compile_idx])
    out = {
        "keyframes": int(lat.size),
        "excluded": sorted(compile_idx),
        "p50_ms": round(float(np.percentile(steady, 50)) * 1e3, 1),
        "p90_ms": round(float(np.percentile(steady, 90)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(steady, 99)) * 1e3, 1),
        "slow_steady_keyframes_over_150ms": rows,
    }
    print(json.dumps(out, indent=1))
    Path("artifacts/latency_tail_probe.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2300)
