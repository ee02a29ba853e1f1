"""FleetSim (one fused program per round) vs the host-loop MultiRobotSim.

Both drivers implement the same synchronous round — every gated robot's
keyframe step, then the combo/closure-list/star exchange — so on the same
world/seed they must produce the same keyframe counts and closely
matching trajectories (float noise from bucket-padding differences only).
"""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import (Config, MatcherConfig, MRConfig,
                                  SlamConfig)
from cg_mrslam_tpu.mr import sim as MRS
from cg_mrslam_tpu.parallel import fleet
from cg_mrslam_tpu.parallel.fleet_sim import FleetSim
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

TICKS = 260


def test_fleet_sim_matches_host_loop():
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    fs = FleetSim(CFG, world, beams=120, seed=11, n_loops=2,
                  width=16.0, height=10.0)
    fs.run(max_ticks=TICKS)

    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    hs = MRS.MultiRobotSim(CFG, world, beams=120, seed=11, n_loops=2,
                           width=16.0, height=10.0)
    hs.run(max_ticks=TICKS)

    # Bitwise trajectory equality between the fused FleetSim program and
    # the host-loop program is NOT a property of the design: they are
    # differently-fused XLA programs, and the correlative matcher's
    # argmax flips to an adjacent theta bin (one 0.00625 rad resolution
    # step) when near-tied scores drift in the last bits. What IS
    # guaranteed: identical graph STRUCTURE (every discrete decision —
    # keyframes, vertices, edges, topology, levels, ownership — matches
    # exactly) and equal map QUALITY (per-run ATE against ground truth
    # agrees to a few cm).
    ref = fleet.stack_states(hs.states)
    for r in range(2):
        assert len(fs.kf_gt[r]) == len(hs.kf_gt[r])
        nv = int(ref.slam.graph.n_vertices[r])
        assert int(fs.states.slam.graph.n_vertices[r]) == nv
        assert (int(fs.states.slam.graph.n_edges[r])
                == int(ref.slam.graph.n_edges[r]))
        em = np.asarray(ref.slam.graph.emask[r])
        np.testing.assert_array_equal(
            np.asarray(fs.states.slam.graph.emask[r]), em)
        np.testing.assert_array_equal(
            np.asarray(fs.states.slam.graph.e_ij[r])[em],
            np.asarray(ref.slam.graph.e_ij[r])[em])
        np.testing.assert_array_equal(
            np.asarray(fs.states.slam.graph.e_level[r])[em],
            np.asarray(ref.slam.graph.e_level[r])[em])
        np.testing.assert_array_equal(
            np.asarray(fs.states.slam.v_owner[r]),
            np.asarray(ref.slam.v_owner[r]))

        def ate(states, kf_gt):
            vo = np.asarray(states.slam.v_owner[r])
            vm = np.asarray(states.slam.graph.vmask[r])
            own = np.where((vo == r) & vm)[0]
            gt = np.asarray(kf_gt[r])
            p = np.asarray(states.slam.graph.poses[r])[own]
            n = min(len(gt), len(p))
            return np.linalg.norm(p[:n, :2] - gt[:n, :2], axis=1).mean()

        ate_f = ate(fs.states, fs.kf_gt)
        ate_h = ate(ref, hs.kf_gt)
        assert abs(ate_f - ate_h) < 0.05, (ate_f, ate_h)
        # absolute guard (round-1 ADVICE): a regression common to BOTH
        # programs must not hide behind the difference check — each run
        # must itself localize against ground truth
        assert ate_f < 0.5, ate_f
        assert ate_h < 0.5, ate_h

    # the fused round actually found inter-robot structure
    assert int(fs.states.slam.graph.n_edges.sum()) > 0
    owners = np.asarray(fs.states.slam.v_owner)
    vm = np.asarray(fs.states.slam.graph.vmask)
    # each robot hosts at least one foreign vertex after exchange
    for r in range(2):
        assert ((owners[r] != r) & vm[r]).any()
