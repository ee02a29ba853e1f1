"""Round-3 chain-solver profile on the REAL chip.

stages: per-stage cost of the batch-512 hospital GN5
levers: operating points — frozen preconditioner + CG budget schedules
        at damp 1e-3 (smaller damp measured DIVERGENT in f32: d1e-4 ->
        chi2 1e8; the λ floor is the CR factorization's f32 limit),
        each checked for convergence (mean + max chi2) and against the
        dense solver's chi2 on a 16-graph subset.
merged: the honest 2-robot merged fixture workload with order=
        permutation (requires tests/fixtures/merged_2robot_1024.npz).

Usage: python tools/profile_chain3.py [stages|levers|merged ...]
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

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def timed(fn, g, reps=2):
    t0 = time.perf_counter()
    out = fn(g)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    warm = time.perf_counter() - t0
    ts = []
    for k in range(reps):
        gi = jax.block_until_ready(
            dataclasses.replace(g, poses=g.poses + 1e-4 * (k + 1)))
        t0 = time.perf_counter()
        out = fn(gi)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, warm


LEVERS = (
    dict(cg_iters=24, cg_tol=1e-4, cg_schedule=None),   # operating point
    dict(cg_iters=48, cg_tol=1e-6, cg_schedule=None),   # guard validation
)


def _report_point(name, g, B, kw, dense_chi2=None):
    from cg_mrslam_tpu.core.linearize import chi2
    from cg_mrslam_tpu.solver import chain as CH

    def gn5(gg):
        return CH.optimize_chain(gg, 5, loop_cap=64, **kw)

    ms, w = timed(jax.jit(jax.vmap(lambda gg: gn5(gg).poses.sum())), g)
    out = jax.jit(jax.vmap(gn5))(jax.block_until_ready(g))
    cs = np.asarray(jax.vmap(chi2)(out))
    extra = ""
    if dense_chi2 is not None:
        extra = f"  dense-ref chi2 {dense_chi2:.5f}"
    print(f"{name:34s} {ms:8.1f} ms -> {B / ms * 1e3:6.1f} solves/s  "
          f"chi2 mean {cs.mean():.5f} max {cs.max():.4f} "
          f"(warm {w:.1f}s){extra}", flush=True)


def main():
    from bench import build_hospital_batch
    from cg_mrslam_tpu.core.linearize import chi2
    from cg_mrslam_tpu.solver import chain as CH
    from cg_mrslam_tpu.solver import gauss_newton as gn

    which = set(sys.argv[1:]) or {"levers"}
    B = 512
    g = build_hospital_batch(B)

    if "stages" in which:
        def assemble(gg):
            td, b, loops, dropped = CH._assemble(gg, None, 64)
            return td.D.sum() + b.sum()

        ms, w = timed(jax.jit(jax.vmap(assemble)), g)
        print(f"assemble      {ms:8.1f} ms   (warm {w:.1f}s)", flush=True)

        def setup(gg):
            td, b, loops, dropped = CH._assemble(gg, None, 64)
            pst = CH._precond_setup(td, loops, gg.poses.shape[0])
            return pst.HinvU.sum() + pst.s_inv.sum()

        ms, w = timed(jax.jit(jax.vmap(setup)), g)
        print(f"asm+precond   {ms:8.1f} ms   (warm {w:.1f}s)", flush=True)

    if "levers" in which:
        c0 = float(jax.vmap(chi2)(g).mean())
        print(f"chi2 start {c0:.1f}", flush=True)
        # NOTE: the dense solver at N=1024 on this chip produces garbage
        # chi2 (measured 1.9e23 — the round-2 dense-NaN class of failure
        # at scale), so there is no on-chip dense oracle here; quality is
        # judged by chi2 collapse + the CPU parity suite.
        for kw in LEVERS:
            name = (f"gn5 cg{kw['cg_iters']} t{kw['cg_tol']:g} "
                    f"sch{kw['cg_schedule']}")
            _report_point(name, g, B, kw)

    if "sweep-merged" in which:
        # VERDICT r03 item 5: re-derive the CHAIN_KW operating point on
        # the workload it serves (the merged 2-robot fixture), and leave
        # a committed artifact so the choice is re-derivable. Writes
        # artifacts/chain_sweep_merged.json.
        import json

        from bench import build_merged_batch

        from cg_mrslam_tpu.solver.pcg import optimize_pcg

        gm, order, meta = build_merged_batch(B)
        c0 = float(np.asarray(jax.vmap(chi2)(gm)).mean())
        print(f"merged fixture: {meta}  chi2 start {c0:.1f}", flush=True)
        # The real protocol snapshot is NOT chainable (363 loop-class
        # edges under the permutation — 334 inter-robot closures), so
        # the operating point being swept is the chain-preconditioned
        # PCG budget that bench.MERGED_PCG_ITERS commits to. Dense CPU
        # oracle on fixture element 0: chi2 33857 -> 12.796.
        rows = []
        for kw in (dict(cg_iters=6), dict(cg_iters=8),
                   dict(cg_iters=12), dict(cg_iters=16),
                   dict(cg_iters=24), dict(cg_iters=48),
                   dict(cg_iters=96)):
            def gn5m(gg, kw=kw):
                return optimize_pcg(gg, 5, order=order, **kw)

            ms, w = timed(jax.jit(jax.vmap(
                lambda gg: gn5m(gg).poses.sum())), gm)
            out = jax.jit(jax.vmap(gn5m))(jax.block_until_ready(gm))
            cs = np.asarray(jax.vmap(chi2)(out))
            row = dict(kw, batch_ms=round(ms, 1),
                       solves_per_s=round(B / ms * 1e3, 1),
                       chi2_mean=float(cs.mean()),
                       chi2_max=float(cs.max()))
            rows.append(row)
            print(row, flush=True)
        art = Path(__file__).resolve().parents[1] / \
            "artifacts/chain_sweep_merged.json"
        art.parent.mkdir(exist_ok=True)
        art.write_text(json.dumps(
            {"workload": ("merged_2robot_1024 batch 512, GN5, "
                          "chain-preconditioned PCG (order=permutation) "
                          "on the full edge set"),
             "dense_oracle_elem0_chi2": 12.796015,
             "chi2_start_mean": c0, "meta": meta, "points": rows},
            indent=1))
        print(f"wrote {art}", flush=True)

    if "merged" in which:
        from bench import MERGED_PCG_ITERS, build_merged_batch
        from cg_mrslam_tpu.solver.pcg import optimize_pcg

        gm, order, meta = build_merged_batch(B)
        print(f"merged fixture: {meta}", flush=True)

        def gn5m(gg):
            # the bench's exact operating point (see bench.bench_merged:
            # the snapshot is not chainable, PCG on the full edge set)
            return optimize_pcg(gg, 5, order=order,
                                cg_iters=MERGED_PCG_ITERS)

        ms, w = timed(jax.jit(jax.vmap(
            lambda gg: gn5m(gg).poses.sum())), gm)
        out = jax.jit(jax.vmap(gn5m))(jax.block_until_ready(gm))
        cs = np.asarray(jax.vmap(chi2)(out))
        c0 = float(np.asarray(jax.vmap(chi2)(gm)).mean())
        print(f"merged gn5 {ms:8.1f} ms -> {B / ms * 1e3:6.1f} solves/s "
              f" chi2 {c0:.1f} -> mean {cs.mean():.5f} max {cs.max():.4f}"
              f" (warm {w:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
