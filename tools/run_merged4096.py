"""BASELINE config 4 probe: 4096 noise-perturbed replays of the 2-robot
merged graph solved concurrently on ONE chip (GN x5 chain-preconditioned
PCG, same operating point as the headline bench row). Standalone so the
memory/time envelope is known before the row lands in bench.py.
"""

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

from bench import MERGED_PCG_ITERS, build_merged_batch


def main(batch=4096, chunk=512):
    """The full batch at one dispatch needs 66 GB of HBM temporaries
    (measured: XLA OOM at 65.72G/15.75G) — the per-edge linearization
    blocks scale linearly with batch. ``lax.map`` over ``batch/chunk``
    slabs keeps ONE slab's temporaries live at a time (XLA reuses the
    buffers across iterations) while the whole 4096-replica workload
    remains a single device program."""
    from cg_mrslam_tpu.core.linearize import chi2
    from cg_mrslam_tpu.solver.pcg import optimize_pcg

    g, order, meta = build_merged_batch(batch)
    g = jax.tree_util.tree_map(
        lambda a: a.reshape((batch // chunk, chunk) + a.shape[1:]), g)
    step = jax.jit(lambda gb: jax.lax.map(jax.vmap(
        lambda gg: optimize_pcg(gg, iterations=5, order=order,
                                cg_iters=MERGED_PCG_ITERS)), gb))
    t0 = time.perf_counter()
    out = jax.block_until_ready(step(g))
    compile_s = time.perf_counter() - t0
    import dataclasses
    g2 = jax.block_until_ready(
        dataclasses.replace(g, poses=g.poses + 1e-4))
    t0 = time.perf_counter()
    out = step(g2)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    cfun = jax.jit(jax.vmap(jax.vmap(chi2)))
    c0 = float(cfun(g2).mean())
    c1 = float(cfun(out).mean())
    assert np.isfinite(c1) and c1 < 1e-3 * c0, (c0, c1)
    rec = {
        "batch": batch, "chunk": chunk, "solve_wall_s": round(dt, 2),
        "solves_per_s": round(batch / dt, 1),
        "first_call_incl_compile_s": round(compile_s, 1),
        "chi2_mean": [round(c0, 1), round(c1, 4)],
        "meta": meta,
    }
    print(json.dumps(rec))
    out_path = Path(__file__).resolve().parents[1] / \
        "artifacts/merged4096.json"
    out_path.write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
