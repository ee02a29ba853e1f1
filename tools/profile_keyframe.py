"""Per-stage latency breakdown of the fused keyframe step on the chip.

VERDICT r2 item 1 demands a profiled breakdown of where the ~100 ms p50
keyframe goes. This tool rebuilds the bench_keyframe_latency workload,
advances the engine to a mid-run state, then times each stage of
``pipeline.slam.keyframe_step`` as its own jitted program (distinct
inputs per rep + scalar fetch, like bench.timed) plus the dispatch
floor (a trivial jitted identity on the same state pytree).

Stage times are measured INDEPENDENTLY (each is a full dispatch), so
their sum exceeds the fused step by (n_stages-1) dispatch floors; the
device-side cost of stage i ~= t_i - floor.

Usage:  python tools/profile_keyframe.py [--keyframes 60] [--json out]
"""

from __future__ import annotations

import argparse
import json
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

import jax.numpy as jnp  # noqa: E402


def timed(fn, *args, reps: int = 6, perturb=None) -> float:
    """Median wall ms with warmup; perturb(args, k) must return distinct
    inputs per rep (the remote tunnel memoizes identical calls)."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for k in range(reps):
        a = perturb(args, k) if perturb is not None else args
        a = jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=60)
    ap.add_argument("--capacity", type=int, default=256,
                    help="max_vertices (edges = 4x); use 1024 with "
                         "--keyframes 560 --loops 4 to profile the "
                         "chain-band bucket")
    ap.add_argument("--loops", type=int, default=2)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--skip-solver", action="store_true",
                    help="skip the solver/marginal stages — jitting the "
                         "chain-band optimize_auto/marginal auto STANDALONE "
                         "at capacity 1024 aborts the XLA compile helper "
                         "(scatter_emitter CHECK, see verify skill); the "
                         "fused step compiles the same code fine, so the "
                         "solver share = fused - other stages")
    args = ap.parse_args()

    from cg_mrslam_tpu.config import Config, MatcherConfig, SlamConfig
    from cg_mrslam_tpu.core import scan as S
    from cg_mrslam_tpu.pipeline import closure as CL
    from cg_mrslam_tpu.pipeline import graph_dist as GD
    from cg_mrslam_tpu.pipeline import slam as SL
    from cg_mrslam_tpu.sim import world as W
    from cg_mrslam_tpu.solver import gauss_newton as gn

    cfg = Config(
        slam=SlamConfig(),
        close_matcher=MatcherConfig(extent=30.0, resolution=0.025,
                                    kernel_radius=0.2),
        lc_matcher=MatcherConfig(extent=70.0, resolution=0.1,
                                 kernel_radius=0.5),
        max_vertices=args.capacity, max_edges=4 * args.capacity)

    world = W.hospital_world(40.0, 20.0, seed=0)
    traj = W.simulate_robot(
        world, W.corridor_waypoints(40.0, 20.0, 0, args.loops), seed=1,
        beams=360, fov=2 * np.pi * 0.75, max_range=10.0,
        odom_noise=(0.01, 0.004))
    slam = SL.SingleRobotSlam(cfg, 360, traj.gt[0], traj.ranges[0],
                              2 * np.pi * 0.75, 10.0)
    kf = 0
    t = 1
    pending = None
    while kf < args.keyframes and t < len(traj.gt):
        if slam.observe(traj.rel_odom[t - 1], traj.ranges[t]):
            kf += 1
            pending = t
        t += 1
    print(f"advanced to {kf} keyframes, n_live={slam._n_live}, "
          f"e_live={slam._e_live}", file=sys.stderr)

    # mid-run state at the live bucket
    nb, eb = SL._bucket_pair(slam.state, slam._n_live, slam._e_live)
    state = jax.block_until_ready(SL._slice_state(slam.state, nb, eb))
    est = jnp.asarray(slam._est, jnp.float32)
    # next unseen scan as the keyframe input
    ranges = jnp.asarray(traj.ranges[min(pending + 1, len(traj.ranges) - 1)],
                         jnp.float32)

    results = {}

    def perturb_state(a, k):
        st = a[0]
        g2 = st.graph
        import dataclasses
        g2 = dataclasses.replace(g2, poses=g2.poses + 1e-5 * (k + 1))
        return (dataclasses.replace(st, graph=g2),) + a[1:]

    # 0. dispatch floor
    floor_fn = jax.jit(lambda s: s.graph.poses + 1.0)
    results["dispatch_floor"] = timed(floor_fn, state,
                                      perturb=perturb_state)

    # 1. full fused step (what the engine actually dispatches)
    full = jax.jit(lambda s, e, r: SL.keyframe_step(s, e, r, cfg),
                   static_argnums=())
    results["fused_step"] = timed(
        full, state, est, ranges,
        perturb=lambda a, k: (perturb_state(a, k)[0], a[1], a[2]))

    # 2. addDataSM (close-match grid 1200^2 + score volume + edge)
    addkf = jax.jit(lambda s, e, r: SL._add_keyframe(s, e, r, cfg)[0])
    results["add_keyframe"] = timed(
        addkf, state, est, ranges,
        perturb=lambda a, k: (perturb_state(a, k)[0], a[1], a[2]))

    st1, _ = jax.block_until_ready(
        jax.jit(lambda s, e, r: SL._add_keyframe(s, e, r, cfg))(
            state, est, ranges))
    g1 = st1.graph
    cur = g1.n_vertices - 1

    # the solver/marginal stages mirror keyframe_step's banding: dense
    # inside DENSE_MAX, permuted chain/PCG auto band above it
    if g1.poses.shape[-2] > gn.DENSE_MAX:
        from cg_mrslam_tpu.solver.chain import chain_order

        order = chain_order(st1.v_owner, st1.v_remote, g1.vmask)
    else:
        order = None

    def pg(a, k):
        import dataclasses
        return (dataclasses.replace(a[0], poses=a[0].poses + 1e-5 * (k + 1)),
                ) + a[1:]

    # 3. pre-optimize (1 GN, auto band like the fused step)
    if not args.skip_solver:
        results["pre_optimize_gn1"] = timed(
            jax.jit(lambda g: gn.optimize_auto(g, 1, order=order)), g1,
            perturb=pg)

    # 4. candidates: bounded distances + sets + components + regions
    def cands(g, c):
        dist = GD.bounded_distances(g, c)
        sets = GD.candidate_sets(
            g, c, dist, max_graph_dist_sm=cfg.slam.max_graph_dist_sm,
            min_graph_dist_lc=cfg.slam.min_graph_dist_lc,
            max_euc_dist_lc=cfg.slam.max_euc_dist_lc)
        cand = sets.near | sets.loop
        labels = GD.components(g, cand)
        regions = GD.pick_regions(g, cand, labels, c, cfg.max_regions)
        return labels, regions

    results["candidates"] = timed(jax.jit(cands), g1, cur, perturb=pg)
    labels, regions = jax.block_until_ready(jax.jit(cands)(g1, cur))

    # 5. covariance gate (banded marginals — dense spd_inverse inside
    # DENSE_MAX, chain/PCG CG column solves above)
    if not args.skip_solver:
        results["covariance_gate"] = timed(
            jax.jit(lambda g, c: SL._covariance_gate(
                g, c, regions.rep_vertex, regions.valid, cfg,
                order=order)),
            g1, cur, perturb=pg)

    # 6. region matching (max_regions LC grids + searches)
    cand_mask = jnp.ones((g1.poses.shape[0],), bool)
    cur_pts, cur_valid = S.points_from_ranges(st1.scans, ranges)

    def matchr(s, e):
        return SL._match_regions(s, e, cand_mask, labels, regions,
                                 cur_pts, cur_valid, cfg)

    results["match_regions"] = timed(
        jax.jit(matchr), st1, g1.poses[cur], perturb=perturb_state)

    # 7. vote
    def vote(s):
        buf2, accept, _ = CL.windowed_vote(
            s.buffer, s.graph.poses, window=cfg.slam.window_loop_closure,
            inlier_threshold=cfg.slam.inlier_threshold,
            min_inliers=cfg.slam.min_inliers)
        return CL.add_accepted(s.graph, s.buffer, accept)

    results["vote"] = timed(jax.jit(vote), st1, perturb=perturb_state)

    # 8. optimize(5) (auto band)
    if not args.skip_solver:
        results["optimize_gn5"] = timed(
            jax.jit(lambda g: gn.optimize_auto(g, 5, order=order)), g1,
            perturb=pg)

    floor = results["dispatch_floor"]
    print(f"\nbucket (nb={nb}, eb={eb});  all times = median wall ms "
          f"per dispatch (incl. ~{floor:.0f} ms floor)")
    stages = [k for k in results if k not in
              ("dispatch_floor", "fused_step")]
    dev_sum = 0.0
    for k in ["dispatch_floor", "fused_step"] + stages:
        v = results[k]
        dev = max(v - floor, 0.0)
        if k in stages:
            dev_sum += dev
        tag = "" if k in ("dispatch_floor",) else f"   (device ~{dev:6.1f})"
        print(f"  {k:20s} {v:8.1f} ms{tag}")
    print(f"  {'stage device sum':20s} {dev_sum:8.1f} ms vs fused device "
          f"~{max(results['fused_step'] - floor, 0):.1f} ms")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
