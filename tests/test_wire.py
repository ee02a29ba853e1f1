"""Wire codec roundtrips + GraphMessage fallback merge."""

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config, MRConfig
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.mr import wire


def _state(my_id=0, n_keyframes=6):
    cfg = Config(max_vertices=64, max_edges=256,
                 mr=MRConfig(n_robots=2))
    rng = np.random.default_rng(my_id)
    st = MR.init_mr_state(cfg, 32, np.zeros(3, np.float32),
                          np.full(32, 5.0, np.float32), 2 * np.pi * 0.75,
                          8.0, my_id=my_id)
    # grow a little own chain (host-side via the public graph ops)
    import dataclasses
    from cg_mrslam_tpu.core import graph as G
    slam = st.slam
    for k in range(1, n_keyframes):
        pose = jnp.asarray([k * 0.5, 0.0, 0.0])
        slam = dataclasses.replace(
            slam,
            graph=G.add_edge(G.add_vertex(slam.graph, pose), k - 1, k,
                             jnp.asarray([0.5, 0.0, 0.0]),
                             np.asarray([100, 0, 0, 100, 0, 1000],
                                        np.float32),
                             owner=my_id),
            v_owner=slam.v_owner.at[k].set(my_id),
            v_remote=slam.v_remote.at[k].set(k))
    return dataclasses.replace(st, slam=slam), cfg


def test_combo_roundtrip():
    st, _ = _state()
    combo = MR.build_combo(st)
    buf = wire.encode(combo)
    assert len(buf) < wire.MAX_DATAGRAM
    sender, back = wire.decode(buf, beams=32)
    assert sender == 0
    np.testing.assert_allclose(np.asarray(back.poses),
                               np.asarray(combo.poses), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.idxs),
                                  np.asarray(combo.idxs))
    np.testing.assert_array_equal(np.asarray(back.valid),
                                  np.asarray(combo.valid))
    np.testing.assert_allclose(np.asarray(back.ranges),
                               np.asarray(combo.ranges), atol=1e-4)


def test_closure_and_star_roundtrip():
    idxs = jnp.asarray([3, 5, 0], jnp.int32)
    valid = jnp.asarray([True, True, False])
    cl = MR.ClosureList(idxs=idxs, valid=valid)
    r, back = wire.decode(wire.encode(cl, robot=1))
    assert r == 1
    np.testing.assert_array_equal(np.asarray(back.idxs), [3, 5, 0])
    np.testing.assert_array_equal(np.asarray(back.valid), [1, 1, 0])

    star = MR.StarMsg(
        gauge=jnp.asarray(4, jnp.int32),
        boundary=jnp.asarray([1, 2], jnp.int32),
        z=jnp.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], jnp.float32),
        info=jnp.tile(jnp.asarray([10, 0, 0, 10, 0, 100], jnp.float32),
                      (2, 1)),
        valid=jnp.asarray([True, True]))
    r, back = wire.decode(wire.encode(star, robot=1))
    assert int(back.gauge) == 4
    np.testing.assert_allclose(np.asarray(back.z), np.asarray(star.z),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.info),
                               np.asarray(star.info), atol=1e-5)


def test_combo_self_describing_geometry():
    """Combo decodes WITHOUT receiver-known beam count and carries its
    sender's laser geometry (msg_factory.h:162-181 laser params)."""
    st, _ = _state()
    combo = MR.build_combo(st)
    _, back = wire.decode(wire.encode(combo))  # note: no beams= hint
    assert np.asarray(back.ranges).shape[0] == 32
    assert abs(float(back.angular_step)
               - float(st.slam.scans.angular_step)) < 1e-6
    assert abs(float(back.max_range) - 8.0) < 1e-5


def test_standalone_messages_roundtrip():
    """VertexArray (t=1), RobotLaser (t=2), EdgeArray (t=5) — the
    reference's standalone wire messages (msg_factory.h:141-221)."""
    va = MR.VertexArray(
        robot=jnp.asarray(2, jnp.int32),
        poses=jnp.asarray([[1.0, 2.0, 0.5], [3.0, 4.0, -0.5]], jnp.float32),
        idxs=jnp.asarray([7, 8], jnp.int32),
        valid=jnp.asarray([True, True]))
    r, back = wire.decode(wire.encode(va))
    assert r == 2 and isinstance(back, MR.VertexArray)
    np.testing.assert_allclose(np.asarray(back.poses),
                               np.asarray(va.poses), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.idxs), [7, 8])

    rl = MR.RobotLaser(
        robot=jnp.asarray(1, jnp.int32), node_id=jnp.asarray(5, jnp.int32),
        ranges=jnp.asarray(np.linspace(0.5, 7.5, 64), jnp.float32),
        first_beam_angle=jnp.float32(-1.5), angular_step=jnp.float32(0.05),
        max_range=jnp.float32(8.0))
    r, back = wire.decode(wire.encode(rl))
    assert r == 1 and isinstance(back, MR.RobotLaser)
    assert int(back.node_id) == 5
    np.testing.assert_allclose(np.asarray(back.ranges),
                               np.asarray(rl.ranges), atol=1e-4)
    assert abs(float(back.first_beam_angle) + 1.5) < 1e-6

    ea = MR.EdgeArray(
        robot=jnp.asarray(0, jnp.int32),
        ids=jnp.asarray([[0, 1], [1, 2]], jnp.int32),
        z=jnp.asarray([[1.0, 0, 0], [0.9, 0.1, 0.05]], jnp.float32),
        info=jnp.tile(jnp.asarray([100, 0, 0, 100, 0, 1000], jnp.float32),
                      (2, 1)),
        valid=jnp.asarray([True, True]))
    r, back = wire.decode(wire.encode(ea))
    assert isinstance(back, MR.EdgeArray)
    np.testing.assert_array_equal(np.asarray(back.ids), [[0, 1], [1, 2]])
    np.testing.assert_allclose(np.asarray(back.info),
                               np.asarray(ea.info), atol=1e-4)


def test_heterogeneous_beam_resample():
    """A 64-beam peer's combo resamples exactly onto a 32-beam receiver's
    grid: valid returns interpolate at true angles, invalid returns snap
    to max range instead of blending."""
    from cg_mrslam_tpu.core.scan import resample_scan_np

    fov = 2 * np.pi * 0.75
    b_src, b_dst, maxr = 64, 32, 8.0
    src_step, dst_step = fov / b_src, fov / b_dst
    src_fba = -fov / 2
    a = src_fba + src_step * np.arange(b_src)
    ranges = np.clip(3.0 + np.sin(a) * 2.0, 0.2, maxr).astype(np.float32)
    ranges[10] = maxr  # one no-return in the middle
    out = resample_scan_np(ranges, src_fba, src_step, maxr,
                           b_dst, -fov / 2, dst_step, maxr)
    dst_a = -fov / 2 + dst_step * np.arange(b_dst)
    want = 3.0 + np.sin(dst_a) * 2.0
    # beams whose source bracket is valid interpolate closely
    near_invalid = np.abs(dst_a - a[10]) < 2 * src_step
    ok = ~near_invalid & (want < maxr - 0.2) & (want > 0.3)
    np.testing.assert_allclose(out[ok], want[ok], atol=0.05)
    # dst beams whose interpolation BRACKET contains the invalid source
    # beam read max range, never a blend
    snapped = np.abs(dst_a - a[10]) <= src_step
    assert snapped.any()
    assert (out[snapped] >= maxr - 1e-4).all(), out[snapped]


def test_graph_msg_fallback_merge():
    st0, _ = _state(my_id=0)
    st1, _ = _state(my_id=1)
    msg = MR.build_graph_msg(st0)
    assert int(np.asarray(msg.vvalid).sum()) == 6
    assert int(np.asarray(msg.evalid).sum()) == 5

    live = jnp.asarray(True)
    st1b = MR.receive_graph_msg(st1, msg, live)
    vo = np.asarray(st1b.slam.v_owner)[np.asarray(st1b.slam.graph.vmask)]
    assert (vo == 0).sum() == 6
    lvl = np.asarray(st1b.slam.graph.e_level)[
        np.asarray(st1b.slam.graph.emask)]
    assert (lvl == 1).sum() == 5

    # idempotent under resend (replace-wholesale)
    st1c = MR.receive_graph_msg(st1b, msg, live)
    assert int(st1c.slam.graph.emask.sum()) == int(
        st1b.slam.graph.emask.sum())
    # undelivered message changes nothing
    st1d = MR.receive_graph_msg(st1c, msg, jnp.asarray(False))
    assert int(st1d.slam.graph.emask.sum()) == int(
        st1c.slam.graph.emask.sum())
    assert int(st1d.slam.graph.n_vertices) == int(st1c.slam.graph.n_vertices)
