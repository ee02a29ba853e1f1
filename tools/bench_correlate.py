"""Microbenchmark the correlate score-volume kernel + variants on chip.

Times the close-match shape from PERF.md (1200 grid, 65 theta, 25x25
window, 1024 points) and the LC shape, for: the XLA gather path, the
shipping pallas kernel, and experimental variants. Asserts bitwise
parity of every variant against the XLA path first.
"""

import argparse
import platform
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.matcher.grid import build_grid
from cg_mrslam_tpu.matcher.search import make_lattice, score_volume
from cg_mrslam_tpu.ops import correlate as C


def timeit(f, args_list, reps=3):
    jax.block_until_ready(f(args_list[0]))      # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for a in args_list:
            r = f(a)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / len(args_list))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=1200)
    ap.add_argument("--pts", type=int, default=1024)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-10, 10, (args.pts, 2)).astype(np.float32))
    pv = jnp.asarray(rng.random(args.pts) > 0.2)   # ~20% invalid beams
    c0 = jnp.zeros(2, jnp.float32)
    res = 0.025
    grid = build_grid(pts, pv, c0, cells=args.cells, resolution=res,
                      kernel_radius=0.2)
    thetas = make_lattice(0.2, 0.00625)            # 65
    ty = jnp.arange(-12, 13, dtype=jnp.int32)
    tx = jnp.arange(-12, 13, dtype=jnp.int32)
    bases = [jnp.asarray([0.1 * k, -0.2, 0.3], jnp.float32)
             for k in range(6)]

    print(f"shape: grid {args.cells}^2, T={len(thetas)}, win 25x25, "
          f"P={args.pts}", flush=True)

    ref = None
    if not args.skip_xla:
        f_xla = jax.jit(lambda b: score_volume(
            grid, c0, res, pts, pv, b, thetas, ty, tx))
        dt = timeit(f_xla, bases)
        ref = np.asarray(f_xla(bases[0]))
        print(f"xla gather      : {dt*1e3:8.2f} ms", flush=True)

    for name in C.VARIANTS + C.PROBE_VARIANTS:
        f = jax.jit(lambda b, name=name: C.pallas_score_volume(
            grid, c0, res, pts, pv, b, thetas, ty, tx, variant=name))
        out = np.asarray(f(bases[0]))
        if ref is not None:
            err = np.abs(out - ref).max()
            ok = "OK " if err < 1e-4 else f"MISMATCH {err:.2e}"
        else:
            ok = "?"
        dt = timeit(f, bases)
        print(f"pallas[{name:12s}]: {dt*1e3:8.2f} ms  parity={ok}",
              flush=True)


if __name__ == "__main__":
    main()
