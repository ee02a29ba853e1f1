"""SPMD multi-robot deployment: robots as mesh shards, exchange as
collectives.

The reference distributes robots as one UDP process per robot
(``/root/reference/src/mrslam/graph_comm.cpp``). The TPU-native
deployment maps each robot's state to one device along a ``robots`` mesh
axis; a communication round is ONE SPMD program in which every message
family (combo, closure list, condensed star) is produced locally,
``all_gather``-ed over the robot axis (ICI), and consumed under the
connectivity mask. No sockets, no threads, no serialization — the wire
format is the fixed-shape message pytree itself.

Two entry points with identical semantics:

* :func:`fleet_round` — batched reference implementation (``vmap`` over
  the robot axis on one device); also the oracle for the sharded path.
* :func:`fleet_round_sharded` — ``shard_map`` over a ``robots`` mesh
  axis with explicit ``all_gather`` collectives; this is what runs on a
  multi-chip slice (validated on the virtual CPU mesh in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cg_mrslam_tpu.config import Config
from cg_mrslam_tpu.mr import mrslam as MR


def stack_states(states) -> MR.MRState:
    """List of per-robot MRStates → one batched state [R, ...]."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(batched: MR.MRState, r: int):
    return [jax.tree_util.tree_map(lambda a: a[k], batched)
            for k in range(r)]


def _receive_phase(states: MR.MRState, combos, lists, stars, conn,
                   cfg: Config) -> MR.MRState:
    """Per-robot consumption of the gathered message tables.

    ``combos [R,...]``, ``lists [R_src, R_dst, ...]``,
    ``stars [R_src, R_dst, ...]``; robot ``r`` consumes column ``r`` of
    each table, gated by ``conn[r, src]``.
    """
    rr = conn.shape[0]
    rids = jnp.arange(rr, dtype=jnp.int32)

    def per_robot(st, r):
        def rx_combo(s, t):
            combo, live = t
            return MR.receive_combo(s, combo, live), None

        st, _ = jax.lax.scan(rx_combo, st, (combos, conn[r]))
        st = MR.try_match_parked(st, cfg)
        st = MR.vote_inter_robot(st, cfg)

        def rx_list(s, t):
            src, cl, live = t
            return MR.receive_closure_list(s, src, cl, live), None

        my_lists = jax.tree_util.tree_map(lambda a: a[:, r], lists)
        st, _ = jax.lax.scan(rx_list, st, (rids, my_lists, conn[r]))

        def rx_star(s, t):
            src, msg, live = t
            return MR.receive_star(s, src, msg, live), None

        my_stars = jax.tree_util.tree_map(lambda a: a[:, r], stars)
        st, _ = jax.lax.scan(rx_star, st, (rids, my_stars, conn[r]))
        return st

    return jax.vmap(per_robot)(states, rids)


def _build_phase(states: MR.MRState, rr: int):
    """Everything a robot sends this round, as [R_src(, R_dst), ...]."""
    rids = jnp.arange(rr, dtype=jnp.int32)
    combos = jax.vmap(MR.build_combo)(states)
    lists = jax.vmap(
        lambda st: jax.vmap(lambda p: MR.build_closure_list(st, p))(rids)
    )(states)
    stars = jax.vmap(
        lambda st: jax.vmap(lambda p: MR.build_star(st, p))(rids)
    )(states)
    return combos, lists, stars


@partial(jax.jit, static_argnames=("cfg",))
def fleet_round(states: MR.MRState, conn: jax.Array,
                cfg: Config) -> MR.MRState:
    """One synchronous exchange round, batched over robots [R, ...]."""
    rr = conn.shape[0]
    combos, lists, stars = _build_phase(states, rr)
    return _receive_phase(states, combos, lists, stars, conn, cfg)


def fleet_round_sharded(states: MR.MRState, conn: jax.Array, cfg: Config,
                        mesh: Mesh) -> MR.MRState:
    """Same round as an SPMD program over the mesh's ``robots`` axis.

    Each device builds its robot's messages, the tables are gathered over
    ICI with ``all_gather``, and the device consumes its column."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    rr = conn.shape[0]

    def body(st_local, conn_full):
        combos_l, lists_l, stars_l = _build_phase(st_local, rr)
        gather = partial(jax.lax.all_gather, axis_name="robots",
                         tiled=True)
        combos = jax.tree_util.tree_map(gather, combos_l)
        lists = jax.tree_util.tree_map(gather, lists_l)
        stars = jax.tree_util.tree_map(gather, stars_l)
        # local receive: this shard's rows of the batched state
        me = jax.lax.axis_index("robots")

        def per_robot(st, k):
            r = me  # one robot per shard row here (shard size 1)
            rids = jnp.arange(rr, dtype=jnp.int32)

            def rx_combo(s, t):
                combo, live = t
                return MR.receive_combo(s, combo, live), None

            st, _ = jax.lax.scan(rx_combo, st, (combos, conn_full[r]))
            st = MR.try_match_parked(st, cfg)
            st = MR.vote_inter_robot(st, cfg)

            def rx_list(s, t):
                src, cl, live = t
                return MR.receive_closure_list(s, src, cl, live), None

            my_lists = jax.tree_util.tree_map(lambda a: a[:, r], lists)
            st, _ = jax.lax.scan(rx_list, st, (rids, my_lists,
                                               conn_full[r]))

            def rx_star(s, t):
                src, msg, live = t
                return MR.receive_star(s, src, msg, live), None

            my_stars = jax.tree_util.tree_map(lambda a: a[:, r], stars)
            st, _ = jax.lax.scan(rx_star, st, (rids, my_stars,
                                               conn_full[r]))
            return st

        return jax.vmap(per_robot)(st_local,
                                   jnp.arange(1, dtype=jnp.int32))

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("robots"), P()),
        out_specs=P("robots"),
    )
    return fn(states, conn)
