"""Check every inter-robot / loop edge of the failing FleetSim seed
against GROUND TRUTH: an edge (i,j) with measurement z is wrong iff
z differs from the true relative pose gt_i^-1 * gt_j. Prints the worst
edges with their per-edge chi2 — separating 'the matcher lied' from
'the optimizer failed'."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
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


def se2_rel(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                     (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi])


for r in range(2):
    st = hs.states[r]
    g = st.slam.graph
    vo = np.asarray(st.slam.v_owner)
    vr = np.asarray(st.slam.v_remote)
    em = np.asarray(g.emask)
    ij = np.asarray(g.e_ij)
    z = np.asarray(g.e_z)
    lvl = np.asarray(g.e_level)
    from cg_mrslam_tpu.core.linearize import edge_chi2
    ec2 = np.asarray(edge_chi2(g))

    print(f"\n=== robot {r} ===")
    rows = []
    for e in np.nonzero(em)[0]:
        i, j = ij[e]
        oi, oj = vo[i], vo[j]
        ki, kj = vr[i], vr[j]
        # ground truth of each endpoint (owner's gt at that keyframe)
        if ki < 0 or kj < 0:
            continue
        if ki >= len(hs.kf_gt[oi]) or kj >= len(hs.kf_gt[oj]):
            continue
        gti = np.asarray(hs.kf_gt[oi][ki], np.float64)
        gtj = np.asarray(hs.kf_gt[oj][kj], np.float64)
        true_z = se2_rel(gti, gtj)
        dz = z[e] - true_z
        dz[2] = (dz[2] + np.pi) % (2 * np.pi) - np.pi
        terr = np.hypot(dz[0], dz[1])
        cls = ("odo" if oi == oj == r and abs(ki - kj) == 1 and lvl[e] == 0
               else "ownloop" if oi == oj == r and lvl[e] == 0
               else "inter" if lvl[e] == 0
               else f"star{lvl[e]}")
        rows.append((terr, abs(dz[2]), ec2[e], cls, int(oi), int(ki),
                     int(oj), int(kj)))
    rows.sort(reverse=True)
    print(" terr  therr   chi2    class  (oi,ki)->(oj,kj)")
    for t_, th, c2, cls, oi, ki, oj, kj in rows[:15]:
        print(f" {t_:5.2f}  {th:5.2f} {c2:8.1f}  {cls:7s} "
              f"({oi},{ki})->({oj},{kj})")
    by = {}
    for t_, th, c2, cls, *_ in rows:
        by.setdefault(cls, []).append(t_)
    for cls, v in sorted(by.items()):
        v = np.asarray(v)
        print(f"  {cls:8s} n={len(v):3d} terr mean {v.mean():.3f} "
              f"max {v.max():.3f} | wrong(>0.5m) {(v > 0.5).sum()}")
