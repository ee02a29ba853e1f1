"""Diagnose the FleetSim/host-loop ATE on the failing seed.

Runs the host-loop MultiRobotSim on the exact test_fleet_sim config and
prints per-robot, per-keyframe position error against ground truth plus
structural counters, to localize WHERE the 1.82 m mean ATE comes from:
uniform drift (too few closures), a single bent region (one bad closure),
or a global gauge/exchange artifact.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # beat the axon sitecustomize
jax.config.update("jax_enable_x64", True)

from cg_mrslam_tpu.config import Config, MatcherConfig, MRConfig, SlamConfig
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.sim import world as W

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    mr=MRConfig(n_robots=2, min_inliers_mr=4, sim_comm_range=6.0,
                max_score_mr=0.2),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=96, max_edges=512)

TICKS = int(sys.argv[1]) if len(sys.argv) > 1 else 260

world = W.hospital_world(width=16.0, height=10.0, seed=2)
hs = MRS.MultiRobotSim(CFG, world, beams=120, seed=11, n_loops=2,
                       width=16.0, height=10.0)
hs.run(max_ticks=TICKS)

for r in range(2):
    st = hs.states[r]
    vo = np.asarray(st.slam.v_owner)
    vm = np.asarray(st.slam.graph.vmask)
    vr = np.asarray(st.slam.v_remote)
    own = np.where((vo == r) & vm)[0]
    # order own keyframes by keyframe index
    own = own[np.argsort(vr[own])]
    gt = np.asarray(hs.kf_gt[r])
    p = np.asarray(st.slam.graph.poses)[own]
    n = min(len(gt), len(p))
    err = np.linalg.norm(p[:n, :2] - gt[:n, :2], axis=1)
    print(f"\n=== robot {r}: {n} keyframes, ATE {err.mean():.3f} m, "
          f"max {err.max():.3f} m @ kf {err.argmax()}")
    print("per-kf err:", np.array2string(err, precision=2,
                                         max_line_width=100))
    g = st.slam.graph
    em = np.asarray(g.emask)
    ij = np.asarray(g.e_ij)[em]
    lvl = np.asarray(g.e_level)[em]
    eo = np.asarray(g.e_owner)[em]
    cross = (vo[ij[:, 0]] != vo[ij[:, 1]]) & (lvl == 0)
    # own-loop edges: both endpoints mine, level 0, non-consecutive kf
    own_e = (vo[ij[:, 0]] == r) & (vo[ij[:, 1]] == r) & (lvl == 0)
    consec = np.abs(vr[ij[:, 0]] - vr[ij[:, 1]]) == 1
    print(f"edges: {em.sum()} total | own odo {int((own_e & consec).sum())}"
          f" | own loop {int((own_e & ~consec).sum())}"
          f" | inter-robot {int(cross.sum())}"
          f" | star {int((lvl > 0).sum())}")
    # heading error too: gauge problems show as pure rotation
    dth = np.abs((p[:n, 2] - gt[:n, 2] + np.pi) % (2 * np.pi) - np.pi)
    print(f"heading err mean {dth.mean():.3f} rad, max {dth.max():.3f}")
    from cg_mrslam_tpu.core.linearize import chi2
    print("chi2:", float(chi2(st.slam.graph)))
