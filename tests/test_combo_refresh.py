"""Combo "Update estimate" branches (reference mr_graph_slam.cpp:131-155).

A combo carries the sender's last ≤5 pose estimates. Vertices the
receiver already holds but that are still awaiting structure (parked, or
hypothesis-buffered — live-edge degree 0) must snap to the transmitted
estimate, so retried global matches start from the sender's freshest
optimized pose. Vertices already constrained by accepted closures or
spliced stars must NOT move — they belong to the receiver's optimizer.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config, MRConfig
from cg_mrslam_tpu.core import graph as G
from cg_mrslam_tpu.mr import mrslam as MR


def _state(my_id=0, n_keyframes=6):
    cfg = Config(max_vertices=64, max_edges=256, mr=MRConfig(n_robots=2))
    st = MR.init_mr_state(cfg, 32, np.zeros(3, np.float32),
                          np.full(32, 5.0, np.float32), 2 * np.pi * 0.75,
                          8.0, my_id=my_id)
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


def _slot(st, owner, ridx):
    return int(MR.find_slot(st.slam, jnp.int32(owner), jnp.int32(ridx)))


def test_second_combo_refreshes_parked_estimate():
    receiver, _ = _state(my_id=0)
    sender, _ = _state(my_id=1)
    live = jnp.asarray(True)

    receiver = MR.receive_combo(receiver, MR.build_combo(sender), live)
    n = receiver.slam.v_owner.shape[0]
    s5 = _slot(receiver, 1, 5)
    assert s5 < n and bool(receiver.parked[s5])
    np.testing.assert_allclose(
        np.asarray(receiver.slam.graph.poses[s5]), [2.5, 0.0, 0.0],
        atol=1e-6)

    # the sender keyframes once more AND re-optimizes: every pose shifts
    sslam = sender.slam
    moved = sslam.graph.poses + jnp.asarray([0.0, 0.3, 0.05])
    sslam = dataclasses.replace(
        sslam,
        graph=G.add_edge(
            G.add_vertex(dataclasses.replace(sslam.graph, poses=moved),
                         jnp.asarray([3.0, 0.3, 0.05])),
            5, 6, jnp.asarray([0.5, 0.0, 0.0]),
            np.asarray([100, 0, 0, 100, 0, 1000], np.float32), owner=1),
        v_owner=sslam.v_owner.at[6].set(1),
        v_remote=sslam.v_remote.at[6].set(6))
    sender = dataclasses.replace(sender, slam=sslam)

    receiver = MR.receive_combo(receiver, MR.build_combo(sender), live)
    # vertex 5 was parked (degree 0) -> estimate refreshed from poses[1]
    np.testing.assert_allclose(
        np.asarray(receiver.slam.graph.poses[s5]), [2.5, 0.3, 0.05],
        atol=1e-6)
    assert bool(receiver.parked[s5])  # still awaiting its global match
    # newest vertex 6 instantiated and parked as usual
    s6 = _slot(receiver, 1, 6)
    assert s6 < n and bool(receiver.parked[s6])


def test_combo_does_not_drag_constrained_vertices():
    receiver, _ = _state(my_id=0)
    sender, _ = _state(my_id=1)
    live = jnp.asarray(True)
    receiver = MR.receive_combo(receiver, MR.build_combo(sender), live)
    s5 = _slot(receiver, 1, 5)

    # an accepted inter-robot closure pins the foreign vertex into MY graph
    g = G.add_edge(receiver.slam.graph, 3, s5,
                   jnp.asarray([0.1, 0.0, 0.0]),
                   np.asarray([100, 0, 0, 100, 0, 1000], np.float32),
                   owner=0)
    receiver = dataclasses.replace(
        receiver, slam=dataclasses.replace(receiver.slam, graph=g),
        parked=receiver.parked.at[s5].set(False))
    before = np.asarray(receiver.slam.graph.poses[s5]).copy()

    sslam = sender.slam
    moved = sslam.graph.poses + jnp.asarray([0.0, 1.0, 0.2])
    sender = dataclasses.replace(
        sender, slam=dataclasses.replace(sslam, graph=dataclasses.replace(
            sslam.graph, poses=moved)))
    receiver = MR.receive_combo(receiver, MR.build_combo(sender), live)
    np.testing.assert_allclose(
        np.asarray(receiver.slam.graph.poses[s5]), before, atol=1e-6)


def test_dead_delivery_refreshes_nothing():
    receiver, _ = _state(my_id=0)
    sender, _ = _state(my_id=1)
    receiver = MR.receive_combo(receiver, MR.build_combo(sender),
                                jnp.asarray(True))
    s5 = _slot(receiver, 1, 5)
    before = np.asarray(receiver.slam.graph.poses[s5]).copy()
    sslam = sender.slam
    sender = dataclasses.replace(
        sender, slam=dataclasses.replace(sslam, graph=dataclasses.replace(
            sslam.graph, poses=sslam.graph.poses + 1.0)))
    receiver = MR.receive_combo(receiver, MR.build_combo(sender),
                                jnp.asarray(False))
    np.testing.assert_allclose(
        np.asarray(receiver.slam.graph.poses[s5]), before, atol=1e-6)
