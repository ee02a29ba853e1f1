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
