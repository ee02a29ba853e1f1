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


def _combo_phase(states: MR.MRState, combos, conn, cfg: Config):
    """Receive everyone's combos, then match + vote (``combos [R,...]``;
    robot ``r`` consumes row ``conn[r]``)."""
    rr = conn.shape[0]
    rids = jnp.arange(rr, dtype=jnp.int32)

    def per_robot(st, r):
        def rx_combo(s, t):
            combo, live = t
            return MR.receive_combo(s, combo, live), None

        st, _ = jax.lax.scan(rx_combo, st, (combos, conn[r]))
        st = MR.try_match_parked(st, cfg)
        return MR.vote_inter_robot(st, cfg)

    return jax.vmap(per_robot)(states, rids)


def _list_phase(states: MR.MRState, lists, conn):
    """Consume closure lists ``[R_src, R_dst, ...]``: robot ``r`` takes
    column ``r``."""
    rr = conn.shape[0]
    rids = jnp.arange(rr, dtype=jnp.int32)

    def per_robot(st, r):
        def rx_list(s, t):
            src, cl, live = t
            return MR.receive_closure_list(s, src, cl, live), None

        my_lists = jax.tree_util.tree_map(lambda a: a[:, r], lists)
        st, _ = jax.lax.scan(rx_list, st, (rids, my_lists, conn[r]))
        return st

    return jax.vmap(per_robot)(states, rids)


def _star_phase(states: MR.MRState, stars, conn):
    """Consume condensed stars ``[R_src, R_dst, ...]``."""
    rr = conn.shape[0]
    rids = jnp.arange(rr, dtype=jnp.int32)

    def per_robot(st, r):
        def rx_star(s, t):
            src, msg, live = t
            return MR.receive_star(s, src, msg, live), None

        my_stars = jax.tree_util.tree_map(lambda a: a[:, r], stars)
        st, _ = jax.lax.scan(rx_star, st, (rids, my_stars, conn[r]))
        return st

    return jax.vmap(per_robot)(states, rids)


def _build_lists(states: MR.MRState, rr: int,
                 cap: int = MR.CLOSURE_LIST):
    rids = jnp.arange(rr, dtype=jnp.int32)
    return jax.vmap(
        lambda st: jax.vmap(
            lambda p: MR.build_closure_list(st, p, cap=cap))(rids)
    )(states)


def _build_stars(states: MR.MRState, rr: int, cap: int = MR.STAR_EDGES):
    rids = jnp.arange(rr, dtype=jnp.int32)
    return jax.vmap(
        lambda st: jax.vmap(lambda p: MR.build_star(st, p, cap=cap))(rids)
    )(states)


@partial(jax.jit, static_argnames=("cfg",))
def fleet_round(states: MR.MRState, conn: jax.Array,
                cfg: Config) -> MR.MRState:
    """One synchronous exchange round, batched over robots [R, ...].

    Three build→deliver→consume phases IN ORDER — closure lists are built
    AFTER this round's votes, and stars AFTER this round's list
    deliveries, exactly like the host-loop harness (``mr.sim``) and the
    reference's processing cadence. Building all three tables up front
    would lag lists/stars one round behind and the trajectories diverge."""
    rr = conn.shape[0]
    combos = jax.vmap(MR.build_combo)(states)
    states = _combo_phase(states, combos, conn, cfg)
    states = _list_phase(
        states, _build_lists(states, rr, cfg.mr.closure_list_cap), conn)
    return _star_phase(
        states, _build_stars(states, rr, cfg.mr.star_edges_cap), conn)


def fleet_round_sharded(states: MR.MRState, conn: jax.Array, cfg: Config,
                        mesh: Mesh) -> MR.MRState:
    """Same round as an SPMD program over the mesh's ``robots`` axis.

    Each device builds its robots' messages, the tables are gathered
    over ICI with ``all_gather``, and the device consumes its columns.
    The shard may hold a BLOCK of robots (R / n_devices > 1 — e.g. a
    64-robot fleet on 8 devices): the per-robot protocol logic is
    ``vmap``-ed over the local block, so every device runs one fused
    program for its whole block and the collective payload per round
    stays the three gathered message tables."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    rr = conn.shape[0]

    def body(st_local, conn_full):
        me = jax.lax.axis_index("robots")
        loc = st_local.slam.my_id.shape[0]       # robots on this shard
        rids = jnp.arange(rr, dtype=jnp.int32)
        gather = partial(jax.lax.all_gather, axis_name="robots",
                         tiled=True)
        my_conn = jax.lax.dynamic_slice_in_dim(conn_full, me * loc, loc,
                                               axis=0)     # [loc, R]

        # phase 1: combos — build local block, gather, consume per robot
        combos = jax.tree_util.tree_map(
            gather, jax.vmap(MR.build_combo)(st_local))      # [R, ...]

        def rx_combos(st, conn_row):
            def rx_combo(s, t):
                combo, live = t
                return MR.receive_combo(s, combo, live), None

            st, _ = jax.lax.scan(rx_combo, st, (combos, conn_row))
            st = MR.try_match_parked(st, cfg)
            return MR.vote_inter_robot(st, cfg)

        st_local = jax.vmap(rx_combos)(st_local, my_conn)

        # phase 2: closure lists built from the POST-vote state
        lists_l = jax.vmap(lambda st: jax.vmap(
            lambda p: MR.build_closure_list(
                st, p, cap=cfg.mr.closure_list_cap))(rids))(st_local)
        lists = jax.tree_util.tree_map(gather, lists_l)  # [R_src, R_dst]

        def rx_lists(st, gid, conn_row):
            my_lists = jax.tree_util.tree_map(lambda a: a[:, gid], lists)

            def rx_list(s, t):
                src, cl, live = t
                return MR.receive_closure_list(s, src, cl, live), None

            st, _ = jax.lax.scan(rx_list, st, (rids, my_lists, conn_row))
            return st

        gids = me * loc + jnp.arange(loc, dtype=jnp.int32)
        st_local = jax.vmap(rx_lists)(st_local, gids, my_conn)

        # phase 3: stars built from the POST-list state
        stars_l = jax.vmap(lambda st: jax.vmap(
            lambda p: MR.build_star(
                st, p, cap=cfg.mr.star_edges_cap))(rids))(st_local)
        stars = jax.tree_util.tree_map(gather, stars_l)

        def rx_stars(st, gid, conn_row):
            my_stars = jax.tree_util.tree_map(lambda a: a[:, gid], stars)

            def rx_star(s, t):
                src, msg, live = t
                return MR.receive_star(s, src, msg, live), None

            st, _ = jax.lax.scan(rx_star, st, (rids, my_stars, conn_row))
            return st

        return jax.vmap(rx_stars)(st_local, gids, my_conn)

    # check_vma=False: jax 0.9's static varying-axes typing rejects the
    # receive scans' carry (replicated scalars like the scan geometry
    # become varying once mixed with per-robot data — exactly what this
    # protocol does by construction). The runtime semantics are
    # unchanged; parity vs the host loop is pinned by tests/test_fleet
    # and the driver's multichip dryrun.
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("robots"), P()),
        out_specs=P("robots"),
        check_vma=False,
    )
    return fn(states, conn)
