"""Closure-list rotation + union receive: an accepted set larger than
one datagram is fully covered across successive sends (reference ships
the ENTIRE list each time, mr_graph_slam.cpp:607-670; the static wire
shape covers it by rotating the cap-window instead)."""

import dataclasses as dc

import numpy as np
import jax.numpy as jnp

from cg_mrslam_tpu.config import Config, MRConfig
from cg_mrslam_tpu.mr import mrslam as MR


def _states():
    cfg = Config(mr=MRConfig(n_robots=2), max_vertices=64, max_edges=128,
                 max_beams=8)
    ranges = np.full(8, 4.0, np.float32)
    sender = MR.init_mr_state(cfg, 8, [0.0, 0.0, 0.0], ranges, np.pi,
                              5.0, my_id=0)
    receiver = MR.init_mr_state(cfg, 8, [1.0, 0.0, 0.0], ranges, np.pi,
                                5.0, my_id=1)
    # sender: peer 1 owns slots 1..40, closures accepted on ALL of them
    n = 64
    v_owner = np.zeros(n, np.int32)
    v_owner[1:41] = 1
    v_remote = np.full(n, -1, np.int32)
    v_remote[0] = 0
    v_remote[1:41] = np.arange(40)
    vmask = np.zeros(n, bool)
    vmask[:41] = True
    slam = dc.replace(
        sender.slam,
        graph=dc.replace(sender.slam.graph, vmask=jnp.asarray(vmask)),
        v_owner=jnp.asarray(v_owner), v_remote=jnp.asarray(v_remote))
    out_c = np.zeros((2, n), bool)
    out_c[1, 1:41] = True
    sender = dc.replace(sender, slam=slam, out_closures=jnp.asarray(out_c))

    # receiver: its own keyframes 0..39 live in slots 0..39
    rv_remote = np.full(n, -1, np.int32)
    rv_remote[:40] = np.arange(40)
    rvmask = np.zeros(n, bool)
    rvmask[:40] = True
    rslam = dc.replace(
        receiver.slam,
        graph=dc.replace(receiver.slam.graph, vmask=jnp.asarray(rvmask)),
        v_remote=jnp.asarray(rv_remote))
    return sender, dc.replace(receiver, slam=rslam)


def test_rotated_windows_cover_full_set_via_union():
    sender, receiver = _states()
    cap = 16
    live = jnp.asarray(True)
    off = 0
    seen_idxs = set()
    for _ in range(4):  # ceil(40/16)=3 sends suffice; 4th is idempotent
        cl = MR.build_closure_list(sender, jnp.asarray(1, jnp.int32),
                                   cap=cap, off=jnp.asarray(off))
        dropped = int(np.asarray(cl.dropped))
        assert dropped == 40 - cap   # per-send truncation still counted
        seen_idxs |= set(np.asarray(cl.idxs)[np.asarray(cl.valid)].tolist())
        receiver = MR.receive_closure_list(
            receiver, jnp.asarray(0, jnp.int32), cl, live)
        off = (off + cap) % (dropped + cap)
    assert seen_idxs == set(range(40))         # every closure shipped
    row = np.asarray(receiver.in_closures[0])
    assert row[:40].all() and not row[40:].any()  # union accumulated all


def test_off_zero_matches_newest_cap_window():
    sender, _ = _states()
    cl = MR.build_closure_list(sender, jnp.asarray(1, jnp.int32), cap=16)
    got = sorted(np.asarray(cl.idxs)[np.asarray(cl.valid)].tolist())
    assert got == list(range(24, 40))          # newest 16 keyframes
