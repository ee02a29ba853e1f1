"""Live-engine finiteness check on chip (the bf16-assembly regression).

Advances the single-robot engine ~90 keyframes on the hospital world at
capacity 4096 and asserts chi2 stays finite and collapsed. This is the
reproducer for the round-4 root cause of the historical "dense f32
garbage on chip" class of failures: einsums in the normal-equation
assembly ran at DEFAULT MXU precision (bf16 multiplicands), so at
coordinates ~20 m the lever-arm products (~(20 m)^2 x 1e4 information)
picked up ~0.4% relative noise that acted as fake gradients growing
with distance from the origin — a pure odometry chain diverged chi2
1e-4 -> 1 -> 4e6 -> NaN between keyframes 55-60, identically under
Cholesky and the matmul inverse (i.e. upstream of the solve), while f32
CPU was clean. Round-start (r03) code showed the same divergence
(chi2 ~1e23 garbage), so every assembly-path einsum is now pinned to
Precision.HIGHEST (solver/gauss_newton.py, solver/pcg.py,
core/linearize.py, parallel/sharding.py, pipeline/closure.py,
mr/condensed.py — matching solver/{spd,chain}.py's existing convention).

Usage: python tools/check_live_finite.py  (exit 0 = clean)
"""
from __future__ import annotations

import platform
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
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
    t = 1
    kf = 0
    worst = 0.0
    while kf < 90 and t < len(traj.gt):
        if slam.observe(traj.rel_odom[t - 1], traj.ranges[t]):
            kf += 1
            c = slam.infos[-1].chi2
            if kf % 10 == 0:
                print(f"kf {kf}: chi2={c:.4f}", flush=True)
            if not np.isfinite(c):
                print("FAIL: non-finite chi2", flush=True)
                return 1
            worst = max(worst, c)
    # a sane single-robot run stays near the noise floor; the bf16 bug
    # blew straight past this by 20 orders of magnitude
    if worst > 100.0:
        print(f"FAIL: chi2 diverged (worst {worst:.1f})", flush=True)
        return 1
    print(f"OK: {kf} keyframes, worst chi2 {worst:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
