"""Checkpoint/resume: save mid-run, reload, continue keyframing; and
multi-robot resume preserving edge provenance (the own-edges rule)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import dataclasses

import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.config import Config, MatcherConfig, MRConfig, SlamConfig
from cg_mrslam_tpu.io import g2o
from cg_mrslam_tpu.pipeline.slam import SingleRobotSlam
from cg_mrslam_tpu.sim import world as W

CFG = Config(
    slam=SlamConfig(min_inliers=4, window_loop_closure=8),
    close_matcher=MatcherConfig(extent=16.0, resolution=0.05,
                                kernel_radius=0.2),
    lc_matcher=MatcherConfig(extent=24.0, resolution=0.1,
                             kernel_radius=0.5),
    max_vertices=128, max_edges=512)


def test_save_resume_continue(tmp_path):
    world = W.hospital_world(width=16.0, height=10.0, seed=2)
    wps = W.corridor_waypoints(16.0, 10.0, 0, 1)
    traj = W.simulate_robot(world, wps, seed=5, beams=120, max_range=8.0)
    fov = 2 * np.pi * 0.75
    slam = SingleRobotSlam(CFG, 120, traj.gt[0], traj.ranges[0], fov, 8.0)

    cut = 120
    for t in range(1, cut):
        slam.observe(traj.rel_odom[t - 1], traj.ranges[t])
    n_before = int(slam.state.graph.n_vertices)
    assert n_before > 10

    path = str(tmp_path / "ckpt.g2o")
    ids = (np.asarray(slam.state.v_remote)
           + np.asarray(slam.state.v_owner) * CFG.slam.base_id)
    g2o.save(path, slam.state.graph, ids=ids.astype(np.int64),
             scans=slam.state.scans)

    slam2 = SingleRobotSlam.resume(CFG, path)
    assert int(slam2.state.graph.n_vertices) == n_before
    np.testing.assert_allclose(
        np.asarray(slam2.state.graph.poses[:n_before]),
        np.asarray(slam.state.graph.poses[:n_before]), atol=1e-5)
    # scans survived the roundtrip
    assert int(np.asarray(slam2.state.scans.smask).sum()) == n_before

    # continue the run: keyframes append and optimization stays sane
    for t in range(cut, min(cut + 120, len(traj.gt))):
        slam2.observe(traj.rel_odom[t - 1], traj.ranges[t])
    n_after = int(slam2.state.graph.n_vertices)
    assert n_after > n_before
    p = np.asarray(slam2.state.graph.poses)[
        np.asarray(slam2.state.graph.vmask)]
    assert np.isfinite(p).all()
    # continued estimates stay near ground truth (close match anchors on
    # the reloaded map)
    err = np.asarray(slam2.infos[-1].pose)[:2] - traj.gt[
        min(cut + 119, len(traj.gt) - 1)][:2]
    assert np.hypot(*err) < 1.0, err


def _tiny_mr_state(cfg, my_id=0, peer=1):
    """Hand-built two-robot state for robot 0: an own 6-vertex chain, two
    foreign vertices from the peer, one accepted inter-robot closure
    (owner=me, level 0), and a spliced condensed edge from the peer
    (owner=peer, level=1+peer)."""
    from cg_mrslam_tpu.core import graph as G
    from cg_mrslam_tpu.mr import mrslam as MR

    beams = 16
    ranges = np.full(beams, 4.0, np.float32)
    st = MR.init_mr_state(cfg, beams, [0.0, 0.0, 0.0], ranges,
                          fov=np.pi, max_range=5.0, my_id=my_id)
    slam = st.slam
    g = slam.graph
    info = np.asarray([100.0, 0, 0, 100.0, 0, 1000.0], np.float32)
    # own chain 0..5
    for k in range(1, 6):
        g = G.add_vertex(g, np.asarray([float(k), 0.0, 0.0], np.float32))
        g = G.add_edge(g, k - 1, k, np.asarray([1.0, 0, 0], np.float32),
                       info, owner=my_id)
    v_owner = np.asarray(slam.v_owner).copy()
    v_remote = np.asarray(slam.v_remote).copy()
    v_remote[1:6] = np.arange(1, 6)
    # two foreign vertices (peer keyframes 0, 1) at slots 6, 7
    import jax.numpy as jnp
    for k, fp in enumerate(([2.0, 1.0, 0.0], [3.0, 1.0, 0.0])):
        g = G.add_vertex(g, np.asarray(fp, np.float32))
        v_owner[6 + k] = peer
        v_remote[6 + k] = k
    scans = slam.scans
    from cg_mrslam_tpu.core import scan as S
    for k in range(6 + 2):
        scans = S.set_scan(scans, k, jnp.asarray(ranges))
    # my accepted closure onto peer vertex 0 (slot 6)
    g = G.add_edge(g, 3, 6, np.asarray([-1.0, 1.0, 0.0], np.float32),
                   info, owner=my_id)
    # peer's condensed star edge between its two vertices, spliced
    g = G.add_edge(g, 6, 7, np.asarray([1.0, 0.0, 0.0], np.float32),
                   info, owner=peer, level=1 + peer)
    slam = dataclasses.replace(slam, graph=g,
                               v_owner=jnp.asarray(v_owner),
                               v_remote=jnp.asarray(v_remote),
                               scans=scans)
    return dataclasses.replace(st, slam=slam)


def test_mr_resume_preserves_own_edges_rule(tmp_path):
    """Owner/level survive a save→resume round trip, so a resumed robot
    builds the SAME condensed star as an uninterrupted one (no
    double-counting of peer-derived information — the failure mode
    condensed_graph_buffer.cpp:347-366 exists to prevent)."""
    import jax.numpy as jnp

    from cg_mrslam_tpu.core import graph as G
    from cg_mrslam_tpu.io import g2o as g2o_io
    from cg_mrslam_tpu.mr import mrslam as MR

    cfg = Config(mr=MRConfig(n_robots=2), max_vertices=32, max_edges=64,
                 max_beams=16)
    st = _tiny_mr_state(cfg)

    # peer asks for a star on my vertices 2 and 4
    cl = MR.ClosureList(idxs=jnp.asarray([2, 4], jnp.int32),
                        valid=jnp.asarray([True, True]))
    st = MR.receive_closure_list(st, jnp.asarray(1, jnp.int32), cl,
                                 jnp.asarray(True))
    star_before = MR.build_star(st, jnp.asarray(1, jnp.int32))

    path = str(tmp_path / "mr.g2o")
    ids = (np.asarray(st.slam.v_remote)
           + np.asarray(st.slam.v_owner) * cfg.slam.base_id)
    g2o_io.save(path, st.slam.graph, ids=ids.astype(np.int64),
                scans=st.slam.scans)

    st2 = MR.mr_state_from_g2o(cfg, path, my_id=0)
    # provenance survived: the spliced peer edge is NOT mine
    own = np.asarray(G.own_edge_mask(st2.slam.graph, 0))
    lvl = np.asarray(st2.slam.graph.e_level)
    owner = np.asarray(st2.slam.graph.e_owner)
    em = np.asarray(st2.slam.graph.emask)
    assert (owner[em] == 1).sum() == 1           # the spliced star edge
    assert (lvl[em] == 2).sum() == 1
    assert own[em].sum() == em.sum() - 1
    # out_closures recovered from my cross-owner edge (slot 6 = peer kf 0)
    assert bool(np.asarray(st2.out_closures)[1, 6])

    # peer resends its closure list (protocol is resend-tolerant) and the
    # resumed robot condenses the SAME star
    st2 = MR.receive_closure_list(st2, jnp.asarray(1, jnp.int32), cl,
                                  jnp.asarray(True))
    star_after = MR.build_star(st2, jnp.asarray(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(star_before.valid),
                                  np.asarray(star_after.valid))
    np.testing.assert_allclose(np.asarray(star_before.z),
                               np.asarray(star_after.z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(star_before.info),
                               np.asarray(star_after.info), atol=1e-3)

    # control: WITHOUT provenance the spliced star edge reloads at level
    # 0, so the replace-wholesale rule (stale = owner==peer &
    # level==1+peer) cannot find it — a re-received star DUPLICATES the
    # peer's information instead of replacing it
    stripped = str(tmp_path / "legacy.g2o")
    with open(path) as f, open(stripped, "w") as out:
        for line in f:
            if not line.startswith("# CGM_EDGE_META"):
                out.write(line)
    st3 = MR.mr_state_from_g2o(cfg, stripped, my_id=0)
    resend = MR.StarMsg(
        gauge=jnp.asarray(0, jnp.int32),
        boundary=jnp.asarray([1], jnp.int32),
        z=jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        info=jnp.asarray([[100.0, 0, 0, 100.0, 0, 1000.0]], jnp.float32),
        valid=jnp.asarray([True]))

    def live_edges(s):
        return int(np.asarray(s.slam.graph.emask).sum())

    n2 = live_edges(st2)
    st2b = MR.receive_star(st2, jnp.asarray(1, jnp.int32), resend,
                           jnp.asarray(True))
    assert live_edges(st2b) == n2              # replaced, not duplicated
    n3 = live_edges(st3)
    st3b = MR.receive_star(st3, jnp.asarray(1, jnp.int32), resend,
                           jnp.asarray(True))
    assert live_edges(st3b) == n3 + 1          # legacy path duplicates
