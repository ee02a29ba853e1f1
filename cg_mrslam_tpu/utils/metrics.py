"""Structured metrics, timing, and kernel speed-of-light accounting.

The reference's only observability is printf narration and clock() spans
(``/root/reference/src/srslam.cpp:208-215``,
``src/matcher/scan_matcher.cpp:146-155``; SURVEY §5). This module replaces
it with:

* :class:`Recorder` — append-only structured metric records with
  percentile summaries and JSONL export (chi2, inliers, matcher scores,
  bytes exchanged, per-stage latency);
* :func:`trace` — a jax profiler trace scope (TensorBoard-compatible);
* :func:`speed_of_light` — roofline accounting for the hot kernels
  (BASELINE.md requires per-kernel speed-of-light measurement).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class Recorder:
    """Append-only metric store: one record = (name, value, tags)."""

    def __init__(self) -> None:
        self._records: List[dict] = []

    def log(self, name: str, value: float, **tags) -> None:
        self._records.append(
            {"t": time.time(), "name": name, "value": float(value), **tags})

    @contextlib.contextmanager
    def timer(self, name: str, **tags) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.log(name, time.perf_counter() - t0, unit="s", **tags)

    def values(self, name: str) -> List[float]:
        return [r["value"] for r in self._records if r["name"] == name]

    def summary(self) -> Dict[str, dict]:
        """Per-metric count/mean/p50/p99/max."""
        import numpy as np

        by: Dict[str, list] = defaultdict(list)
        for r in self._records:
            by[r["name"]].append(r["value"])
        out = {}
        for k, v in by.items():
            a = np.asarray(v)
            out[k] = {
                "count": int(a.size),
                "mean": float(a.mean()),
                "p50": float(np.percentile(a, 50)),
                "p99": float(np.percentile(a, 99)),
                "max": float(a.max()),
            }
        return out

    def to_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for r in self._records:
                f.write(json.dumps(r) + "\n")

    def __len__(self) -> int:
        return len(self._records)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax profiler trace scope; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Peak numbers for common single-chip targets (dense f32/bf16 matmul peak,
# HBM bandwidth). Values are public spec sheets; used only for roofline
# ratios in reports.
CHIP_PEAKS = {
    "v5e": {"flops": 394e12, "hbm_gbs": 819e9},     # bf16 peak, HBM BW
    "v5p": {"flops": 918e12, "hbm_gbs": 2765e9},
    "cpu": {"flops": 1e11, "hbm_gbs": 5e10},
}


def speed_of_light(flops: float, bytes_moved: float, seconds: float,
                   chip: str = "v5e") -> dict:
    """Roofline accounting: achieved fraction of compute and bandwidth
    peaks, and which bound the kernel is closest to."""
    peak = CHIP_PEAKS[chip]
    f_frac = (flops / seconds) / peak["flops"] if seconds > 0 else 0.0
    b_frac = (bytes_moved / seconds) / peak["hbm_gbs"] if seconds > 0 else 0.0
    t_flops = flops / peak["flops"]
    t_bytes = bytes_moved / peak["hbm_gbs"]
    return {
        "seconds": seconds,
        "flops_frac_of_peak": f_frac,
        "bw_frac_of_peak": b_frac,
        "bound": "compute" if t_flops > t_bytes else "bandwidth",
        "sol_seconds": max(t_flops, t_bytes),
        "sol_frac": max(t_flops, t_bytes) / seconds if seconds > 0 else 0.0,
    }
