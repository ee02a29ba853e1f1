"""Deep profile of the two dominant keyframe stages + chain throughput.

Part A (latency): optimize(5) internals at the live bucket size (N=256):
assembly, spd_inverse, pcg_refine, full dense GN5, chain GN5 at the same
size. Part B (latency): match_regions internals (EDT grid build, LC score
volumes). Part C (throughput): the hospital-scale chain solve batch-512
component times + CG iteration counts.

Usage: python tools/profile_solver.py [a|b|c ...]
"""

from __future__ import annotations

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


def _graph_256():
    from bench import build_hospital_batch
    g = build_hospital_batch(1, n=256, closures=12)
    return jax.tree_util.tree_map(lambda a: a[0], g)


def pg(a, k):
    import dataclasses
    return (dataclasses.replace(a[0], poses=a[0].poses + 1e-5 * (k + 1)),
            ) + a[1:]


def ph(a, k):
    return (a[0] + 1e-6 * (k + 1),) + a[1:]


def part_a():
    from cg_mrslam_tpu.solver import chain as CH
    from cg_mrslam_tpu.solver import gauss_newton as gn
    from cg_mrslam_tpu.solver.spd import pcg_refine, spd_inverse

    g = _graph_256()
    floor = timed(jax.jit(lambda gg: gg.poses + 1), g, perturb=pg)
    print(f"[A] floor                {floor:7.1f} ms")
    print(f"[A] assemble             "
          f"{timed(jax.jit(lambda gg: gn.build_normal_equations(gg).H[0, 0]), g, perturb=pg):7.1f}")
    eq = jax.block_until_ready(jax.jit(gn.build_normal_equations)(g))
    H, _ = gn._gauge_fix(eq.H, eq.b, eq.free3)
    H = jax.block_until_ready(H + 1e-6 * jnp.eye(H.shape[0]))
    print(f"[A] spd_inverse 768^2    "
          f"{timed(jax.jit(lambda h: spd_inverse(h)[0, 0]), H, perturb=ph):7.1f}")
    minv = jax.block_until_ready(jax.jit(spd_inverse)(H))
    print(f"[A] pcg_refine 768 rhs1  "
          f"{timed(jax.jit(lambda h: pcg_refine(h, eq.b[:, None], minv)[0, 0]), H, perturb=ph):7.1f}")
    print(f"[A] cho_factor+solve     "
          f"{timed(jax.jit(lambda h: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h, lower=True), eq.b)[0]), H, perturb=ph):7.1f}")
    print(f"[A] dense optimize(1)    "
          f"{timed(jax.jit(lambda gg: gn.optimize(gg, 1).poses[0, 0]), g, perturb=pg):7.1f}")
    print(f"[A] dense optimize(5)    "
          f"{timed(jax.jit(lambda gg: gn.optimize(gg, 5).poses[0, 0]), g, perturb=pg):7.1f}")
    print(f"[A] chain optimize(5)    "
          f"{timed(jax.jit(lambda gg: CH.optimize_chain(gg, 5, loop_cap=32).poses[0, 0]), g, perturb=pg):7.1f}")
    print(f"[A] chain optimize(5) cg12 "
          f"{timed(jax.jit(lambda gg: CH.optimize_chain(gg, 5, loop_cap=32, cg_iters=12).poses[0, 0]), g, perturb=pg):7.1f}")


def part_b():
    from cg_mrslam_tpu.config import Config
    from cg_mrslam_tpu.matcher.grid import build_grid
    from cg_mrslam_tpu.matcher.search import grid_search

    cfg = Config()
    mcfg = cfg.lc_matcher
    w = cfg.windows
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-8, 8, (16 * 360, 2)), jnp.float32)
    valid = jnp.ones((16 * 360,), bool)
    center = jnp.zeros((2,), jnp.float32)
    cur = jnp.asarray(rng.uniform(-8, 8, (360, 2)), jnp.float32)
    cv = jnp.ones((360,), bool)
    base = jnp.zeros((3,), jnp.float32)

    bg = jax.jit(lambda p: build_grid(p, valid, center, cells=mcfg.cells,
                                      resolution=mcfg.resolution,
                                      kernel_radius=mcfg.kernel_radius))
    floor = timed(jax.jit(lambda p: p + 1), pts, perturb=ph)
    print(f"[B] floor                {floor:7.1f} ms")
    bgs = jax.jit(lambda p: bg(p).sum())
    print(f"[B] build_grid 700^2 x1  {timed(bgs, pts, perturb=ph):7.1f}")
    bg4 = jax.jit(lambda p: jax.vmap(
        lambda q: build_grid(q, valid, center, cells=mcfg.cells,
                             resolution=mcfg.resolution,
                             kernel_radius=mcfg.kernel_radius))(p))
    pts4 = jnp.broadcast_to(pts, (4,) + pts.shape)
    bg4s = jax.jit(lambda p: bg4(p).sum())
    print(f"[B] build_grid 700^2 x4  {timed(bg4s, pts4, perturb=ph):7.1f}")
    grid = jax.block_until_ready(bg(pts))

    def near(g2):
        return grid_search(g2, center, mcfg.resolution, cur, cv, base,
                           th_span=w.close_dth, th_res=w.lc_th_res,
                           x_span=w.close_dx, y_span=w.close_dy, topk=1,
                           prior_weight=w.close_prior_weight)

    def lc(g2):
        return grid_search(g2, center, mcfg.resolution, cur, cv, base,
                           th_span=w.lc_dth, th_res=w.lc_th_res,
                           x_span=w.lc_dx, y_span=w.lc_dy, topk=1)

    print(f"[B] near search x1       {timed(jax.jit(lambda g2: near(g2).scores[0]), grid, perturb=ph):7.1f}")
    print(f"[B] lc search x1         {timed(jax.jit(lambda g2: lc(g2).scores[0]), grid, perturb=ph):7.1f}")
    g8 = jnp.broadcast_to(grid, (8,) + grid.shape)
    print(f"[B] lc search x8 vmap    "
          f"{timed(jax.jit(lambda gs: jax.vmap(lc)(gs).scores.sum()), g8, perturb=ph):7.1f}")


def part_c():
    import dataclasses

    from bench import build_hospital_batch
    from cg_mrslam_tpu.solver import chain as CH

    B = 512
    g = build_hospital_batch(B)

    def pgb(a, k):
        return (dataclasses.replace(a[0], poses=a[0].poses + 1e-5 * (k + 1)),
                ) + a[1:]

    floor = timed(jax.jit(lambda gg: gg.poses + 1), g, perturb=pgb, reps=3)
    print(f"[C] floor                 {floor:8.1f} ms")

    def assemble(gg):
        td, b, loops, dropped = CH._assemble(gg, None, 64)
        return td.D.sum()

    print(f"[C] assemble x{B}         "
          f"{timed(jax.jit(jax.vmap(assemble)), g, perturb=pgb, reps=3):8.1f}")

    def factor(gg):
        td, b, loops, dropped = CH._assemble(gg, None, 64)
        f = CH._cr_factor(td.D, td.L)
        return f["root_inv"].sum()

    print(f"[C] assemble+factor       "
          f"{timed(jax.jit(jax.vmap(factor)), g, perturb=pgb, reps=3):8.1f}")

    def one_delta(gg):
        dx, _ = CH._chain_delta_impl(gg, None, 64)
        return dx.sum()

    print(f"[C] chain_delta x1 iter   "
          f"{timed(jax.jit(jax.vmap(one_delta)), g, perturb=pgb, reps=3):8.1f}")

    for ci in (48, 16, 8):
        def gn5(gg, ci=ci):
            return CH.optimize_chain(gg, 5, loop_cap=64, cg_iters=ci).poses.sum()
        print(f"[C] GN5 cg_iters={ci:3d}      "
              f"{timed(jax.jit(jax.vmap(gn5)), g, perturb=pgb, reps=3):8.1f}")

    # CG iteration counts actually taken (tol 1e-6): instrument one graph
    g1 = jax.tree_util.tree_map(lambda a: a[0], g)
    from cg_mrslam_tpu.core.linearize import chi2
    print(f"[C] chi2 start {float(chi2(g1)):.1f}")


if __name__ == "__main__":
    parts = sys.argv[1:] or ["a", "b", "c"]
    if "a" in parts:
        part_a()
    if "b" in parts:
        part_b()
    if "c" in parts:
        part_c()
