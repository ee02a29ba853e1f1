"""Multi-robot end-to-end: two robots patrol the same corridor in opposite
directions, exchange combo/closure/star messages when in range, and must
(a) instantiate each other's vertices, (b) accept inter-robot closures via
the per-peer vote, (c) splice condensed stars, and (d) agree on each
other's trajectories."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
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
    max_vertices=192,
    max_edges=1024,
)


def test_two_robot_exchange():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(CFG, world, beams=120, seed=11, n_loops=2,
                            width=16.0, height=10.0)
    sim.run(max_ticks=700)

    st0, st1 = sim.states

    # (a) each robot holds foreign vertices from the other
    own0 = np.asarray(st0.slam.v_owner)[np.asarray(st0.slam.graph.vmask)]
    own1 = np.asarray(st1.slam.v_owner)[np.asarray(st1.slam.graph.vmask)]
    assert (own0 == 1).sum() > 3, (own0 == 1).sum()
    assert (own1 == 0).sum() > 3, (own1 == 0).sum()

    # (b) inter-robot closure edges exist: edges between own and foreign
    def inter_edges(st):
        g = st.slam.graph
        em = np.asarray(g.emask)
        ij = np.asarray(g.e_ij)[em]
        vo = np.asarray(st.slam.v_owner)
        lvl = np.asarray(g.e_level)[em]
        cross = (vo[ij[:, 0]] != vo[ij[:, 1]]) & (lvl == 0)
        return cross.sum()

    assert inter_edges(st0) > 0 or inter_edges(st1) > 0, (
        inter_edges(st0), inter_edges(st1))

    # (c) at least one robot spliced a condensed star (level == 1 + peer)
    lvl0 = np.asarray(st0.slam.graph.e_level)[np.asarray(st0.slam.graph.emask)]
    lvl1 = np.asarray(st1.slam.graph.e_level)[np.asarray(st1.slam.graph.emask)]
    got_star = (lvl0 == 2).sum() + (lvl1 == 1).sum()
    assert got_star > 0, (lvl0.tolist(), lvl1.tolist())

    # (d) cross-consistency: robot 0's estimate of robot 1's vertex k is
    # close to robot 1's own estimate of that vertex (shared gt frame)
    def cross_err(host, guest):
        """Per constrained foreign vertex: |host's estimate − owner's own
        estimate|. Unconstrained foreign slots (parked vertices whose
        match never passed the vote) are excluded — they carry no
        information and the reference leaves the same leftovers."""
        g = host.slam.graph
        gv = np.asarray(g.vmask)
        vo = np.asarray(host.slam.v_owner)
        vr = np.asarray(host.slam.v_remote)
        deg = np.zeros(len(gv), int)
        em = np.asarray(g.emask)
        ij = np.asarray(g.e_ij)
        for m in np.nonzero(em)[0]:
            deg[ij[m, 0]] += 1
            deg[ij[m, 1]] += 1
        gid = int(guest.slam.my_id)
        errs = []
        gvr = np.asarray(guest.slam.v_remote)
        gvo = np.asarray(guest.slam.v_owner)
        gmask = np.asarray(guest.slam.graph.vmask)
        for slot in np.nonzero(gv & (vo == gid) & (deg > 0))[0]:
            m = gmask & (gvo == gid) & (gvr == vr[slot])
            if not m.any():
                continue
            other = np.asarray(guest.slam.graph.poses)[np.argmax(m)]
            mine = np.asarray(host.slam.graph.poses)[slot]
            errs.append(np.hypot(*(mine[:2] - other[:2])))
        return np.asarray(errs)

    e01 = cross_err(st0, st1)
    assert len(e01) > 3
    assert np.median(e01) < 0.6, (np.median(e01), e01)


def test_detect_robot_in_range_gate_traces():
    # detectRobotInRange wiring (mr_graph_slam.cpp:218-226): with the flag
    # on, try_match_parked adds the verifyMatching visibility gate inside
    # the same fused program; this exercises trace+execute with a parked
    # foreign vertex present
    import dataclasses as dc

    from cg_mrslam_tpu.mr import mrslam as MR

    cfg = dc.replace(CFG, mr=dc.replace(CFG.mr, detect_robot_in_range=True))
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    sim = MRS.MultiRobotSim(cfg, world, beams=120, seed=11, n_loops=1)
    sim.run(max_ticks=40)
    combo = MR.build_combo(sim.states[1])
    st = MR.receive_combo(sim.states[0], combo, jnp.asarray(True))
    st = MR.try_match_parked(st, cfg)   # gate active inside the program
    assert int(st.slam.graph.n_vertices) >= 1
