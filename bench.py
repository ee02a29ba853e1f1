"""Headline benchmark: concurrent pose-graph solves per second on one chip.

Mirrors the BASELINE.md north star (concurrent 2-robot hospital-scale graph
solves; the reference's per-keyframe g2o optimize(5) is the unit of work,
``/root/reference/src/slam/graph_slam.cpp:561-574`` / ``src/cg_mrslam.cpp:225``).
Prints ONE JSON line. ``vs_baseline`` is solves/s divided by the 1000/s
driver-set target (the reference itself publishes no numbers — BASELINE.md).
"""

import json
import platform
import time

import jax

# hostname-keyed: AOT cache artifacts are machine-specific (see conftest)
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build_batch  # noqa: E402
from cg_mrslam_tpu.solver import gauss_newton as gn  # noqa: E402


def main():
    import dataclasses

    import numpy as np

    batch = 1024
    g = _build_batch(batch)

    step = jax.jit(jax.vmap(lambda gg: gn.optimize(gg, iterations=5)))
    out = step(g)
    np.asarray(out.poses[0, 0])  # compile + warm (fetch forces completion)

    # Distinct inputs per rep: the remote-execution tunnel memoizes repeat
    # calls with identical arguments, and block_until_ready alone does not
    # prove device-side completion — a small fetch does.
    reps = 5
    inputs = [
        jax.block_until_ready(
            dataclasses.replace(g, poses=g.poses + 1e-3 * (k + 1))
        )
        for k in range(reps)
    ]
    t0 = time.perf_counter()
    for gi in inputs:
        out = step(gi)
        np.asarray(out.poses[0, 0])
    dt = (time.perf_counter() - t0) / reps

    solves_per_s = batch / dt
    print(json.dumps({
        "metric": "graph_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s (40-pose loop, GN x5, batch 1024, 1 chip)",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
