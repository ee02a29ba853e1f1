"""Generate PERF.md — the committed roofline artifact (round-1 item 10,
round-2 item 4): measured ceilings + speed-of-light accounting for the
hot loops, straight from ``cg_mrslam_tpu.utils.sol.report()`` on the
chip this runs on.

Usage: python tools/run_perf_report.py [--out PERF.md]
"""
from __future__ import annotations

import argparse
import json
import platform
import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_tpu_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / "PERF.md"))
    args = ap.parse_args()

    from cg_mrslam_tpu.utils import sol

    rows = sol.report()
    ceil, kernels = rows[0], rows[1:]

    dev = jax.devices()[0]
    lines = [
        "# PERF — speed-of-light accounting (measured on chip)",
        "",
        f"Generated {date.today()} on `{dev.device_kind}` via "
        "`tools/run_perf_report.py` (all ceilings measured in-session "
        "on the same chip; see `cg_mrslam_tpu/utils/sol.py`).",
        "",
        "## Measured ceilings",
        "",
        "| ceiling | value |",
        "|---|---|",
        f"| HBM sustained read | {ceil['hbm_gbps']:.0f} GB/s |",
        f"| MXU bf16 matmul | {ceil['mxu_bf16_tflops']:.1f} TFLOP/s |",
        f"| MXU f32 matmul | {ceil['mxu_f32_tflops']:.1f} TFLOP/s |",
        f"| VPU f32 (architectural) | {ceil['vpu_f32_tflops']:.1f} "
        "TFLOP/s |",
        f"| dispatch floor (tunnel round trip) | "
        f"{ceil['dispatch_s'] * 1e3:.0f} ms |",
        "",
        "## Hot-loop accounting",
        "",
        "| kernel | device ms | GB/s | TFLOP/s | of HBM | of compute "
        "| SoL fraction | bound |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for k in kernels:
        if "skipped" in k:
            lines.append(f"| {k['kernel']} | skipped: {k['skipped']} "
                         "| | | | | | |")
            continue
        comp_key = [c for c in k if c.startswith("of_") and
                    c != "of_hbm_peak"][0]
        lines.append(
            f"| {k['kernel']} | {k['device_ms']} | "
            f"{k['achieved_GBps']} | {k['achieved_TFLOPs']} | "
            f"{k['of_hbm_peak']} | {k[comp_key]} ({comp_key[3:-5]}) | "
            f"{k['sol_fraction']} | {k['bound']} |")
    lines += [
        "",
        "Raw rows (JSON):",
        "```json",
        json.dumps(rows, indent=1),
        "```",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
