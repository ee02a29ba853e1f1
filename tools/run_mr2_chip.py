"""Two-process multi-robot run on real hardware (VERDICT r03 item 7).

Spawns two ``cg_mrslam --idRobot`` processes exchanging real UDP
datagrams on localhost (the reference's deployment shape,
``/root/reference/src/cg_mrslam.cpp:206-259`` + ``graph_comm.cpp:126-208``)
and merges their ``--stats-json`` outputs into one committed artifact.

Robot 0 runs on the TPU chip; robot 1 runs on CPU by default
(``--both-tpu`` to override): the axon tunnel serializes chip access, so
two chip processes would measure queueing, not SLAM. One chip node +
one CPU node still exercises the full native-UDP exchange protocol,
closure votes, and condensed-star splicing ON REAL HARDWARE.

Usage: python tools/run_mr2_chip.py [--ticks 400] [--out artifacts/...]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--max-vertices", type=int, default=256)
    ap.add_argument("--beams", type=int, default=180)
    ap.add_argument("--both-tpu", action="store_true")
    ap.add_argument("--tick-seconds", type=float, default=1.0,
                    help="wall-clock pacing per tick (keeps the chip "
                         "and CPU nodes' simulated clocks aligned; the "
                         "first run measured 166 s vs 367 s free-run "
                         "skew, which cut the condensed exchange short)")
    ap.add_argument("--robots", type=int, default=2,
                    help="process count; robot 0 rides the chip, the "
                         "rest run on CPU (the reference's experiments "
                         "use 2- and 4-robot deployments, README.md)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = str(ROOT / f"artifacts/mr{args.robots}_chip_run.json")

    workdir = Path(f"/tmp/mr{args.robots}_chip")
    workdir.mkdir(exist_ok=True)
    common = [
        "--nRobots", str(args.robots), "--modality", "real",
        "--ticks", str(args.ticks),
        "--max-vertices", str(args.max_vertices),
        "--max-edges", str(4 * args.max_vertices),
        "--beams", str(args.beams), "--no-map", "-o", "mr2chip",
        "--tick-seconds", str(args.tick_seconds),
    ]
    procs = []
    t0 = time.time()
    for r in range(args.robots):
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
        if r >= 1 and not args.both_tpu:
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
        cmd = [sys.executable, "-m", "cg_mrslam_tpu", "cg_mrslam",
               "--idRobot", str(r), "--stats-json", f"r{r}.json"] + common
        procs.append(subprocess.Popen(
            cmd, cwd=workdir, env=env,
            stdout=open(workdir / f"r{r}.log", "w"),
            stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=3000) for p in procs]
    wall = time.time() - t0

    stats = []
    for r in range(args.robots):
        p = workdir / f"r{r}.json"
        stats.append(json.loads(p.read_text()) if p.exists()
                     else {"error": f"robot {r} wrote no stats",
                           "rc": rcs[r]})
    out = {
        "what": (f"{args.robots}-process cg_mrslam over localhost UDP; "
                 "robot 0 on the TPU chip"
                 + ("" if args.both_tpu else ", the rest on CPU")),
        "ticks": args.ticks, "wall_s": round(wall, 1), "rcs": rcs,
        "robots": stats,
    }
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    ok = (all(rc == 0 for rc in rcs)
          and all(s.get("inter_robot_accepted", 0) > 0 for s in stats)
          and any(s.get("condensed_star_edges_in", 0) > 0 for s in stats))
    print(f"wrote {args.out}; inter-robot closures + spliced stars: "
          f"{'OK' if ok else 'MISSING'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
