"""Fleet driver: N robots, ONE device program per keyframe round.

The host-loop sim (``mr.sim.MultiRobotSim``) issues one dispatch per
message — fine on CPU, but through a TPU dispatch costing ~30-40 ms of
round-trip a 2-robot exchange round would spend seconds in overhead.
Here an entire round — every robot's (masked) keyframe step plus the full
combo/closure-list/star exchange — is a single jitted program over the
stacked ``[R, ...]`` state (``fleet.fleet_round`` consumes the message
tables batched; on a multi-chip mesh the same body runs SPMD via
``fleet.fleet_round_sharded``).

Robots that did not cross the keyframe gate this round still compute the
step (fixed shapes) and discard it with a ``where`` — for fleet sizes of
2-8 robots the wasted FLOPs are far cheaper than a second dispatch.

Replaces the reference's N-process deployment (one ``cg_mrslam`` process
per robot + UDP, ``/root/reference/src/mrslam/graph_comm.cpp``) for
single-host simulation and benchmarking; active-size bucketing mirrors
``pipeline.slam.keyframe_step_bucketed`` (bucket = max live size across
the fleet, since the state is stacked).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cg_mrslam_tpu.config import Config
from cg_mrslam_tpu.mr import mrslam as MR
from cg_mrslam_tpu.mr import network as NET
from cg_mrslam_tpu.parallel import fleet
from cg_mrslam_tpu.pipeline import slam as SL
from cg_mrslam_tpu.sim import world as W


def _slice_mr(st: MR.MRState, nb: int, eb: int) -> MR.MRState:
    """Bucket-slice one robot's FULL MR state (slam + parking + closure
    bookkeeping); mirrors ``pipeline.slam._slice_state``."""
    return dataclasses.replace(
        st, slam=SL._slice_state(st.slam, nb, eb),
        parked=st.parked[:nb], park_age=st.park_age[:nb],
        in_closures=st.in_closures[:, :nb],
        out_closures=st.out_closures[:, :nb])


def _merge_mr(full: MR.MRState, part: MR.MRState) -> MR.MRState:
    nb = part.parked.shape[0]
    return dataclasses.replace(
        full, slam=SL._merge_state(full.slam, part.slam),
        parked=full.parked.at[:nb].set(part.parked),
        park_age=full.park_age.at[:nb].set(part.park_age),
        in_closures=full.in_closures.at[:, :nb].set(part.in_closures),
        out_closures=full.out_closures.at[:, :nb].set(part.out_closures),
        peer_buf=part.peer_buf)


@partial(jax.jit, static_argnames=("cfg", "nb", "eb"))
def fleet_keyframe_round(states: MR.MRState, do: jax.Array,
                         ests: jax.Array, ranges: jax.Array,
                         conn: jax.Array, cfg: Config,
                         nb: int, eb: int):
    """Masked keyframe step for every robot + one exchange round.

    ``states`` is the stacked ``[R, ...]`` fleet state, ``do [R]`` marks
    robots whose keyframe gate fired, ``ests [R,3]`` / ``ranges [R,B]``
    their dead-reckoned estimates and scans, ``conn [R,R]`` this round's
    connectivity. Returns ``(new_states, packed [R,9])`` where columns
    0-6 are the StepInfo pack and 7-8 the POST-exchange vertex/edge
    counts (the exchange itself grows the graph — foreign vertices,
    inter-robot closures, star edges — so the host's bucket mirror must
    track the post-round sizes, not the step's).
    """

    full = states
    # the ENTIRE round — keyframe steps AND the exchange's global matches,
    # votes and star condensations (dense solves) — runs on the bucket
    # slice; foreign vertices/edges the exchange adds stay inside it
    # because the host sizes nb/eb from POST-exchange counts
    states = jax.vmap(lambda st: _slice_mr(st, nb, eb))(states)

    def one(st: MR.MRState, d, est, rng):
        new_slam, info = SL.keyframe_step(st.slam, est, rng, cfg)
        slam = jax.tree_util.tree_map(
            lambda a, b: jnp.where(d, a, b), new_slam, st.slam)
        return (dataclasses.replace(st, slam=slam),
                jnp.where(d, SL._pack_info(info),
                          jnp.zeros(SL.INFO_WIDTH)))

    states, infos = jax.vmap(one)(states, do, ests, ranges)
    rr = conn.shape[0]
    combos = jax.vmap(MR.build_combo)(states)
    states = fleet._combo_phase(states, combos, conn, cfg)
    states = fleet._list_phase(
        states, fleet._build_lists(states, rr, cfg.mr.closure_list_cap),
        conn)
    states = fleet._star_phase(
        states, fleet._build_stars(states, rr, cfg.mr.star_edges_cap),
        conn)
    states = jax.vmap(_merge_mr)(full, states)
    counts = jnp.stack([states.slam.graph.n_vertices,
                        states.slam.graph.n_edges],
                       axis=-1).astype(jnp.float32)
    return states, jnp.concatenate([infos, counts], axis=-1)


class FleetSim:
    """Host driver around :func:`fleet_keyframe_round`: dead-reckoning and
    keyframe gating per robot on the host, everything else on device."""

    def __init__(self, cfg: Config, world: W.World, beams: int = 180,
                 fov: float = 2 * np.pi * 0.75, max_range: float = 8.0,
                 seed: int = 0, n_loops: int = 2,
                 odom_noise=(0.02, 0.008), width: float = 16.0,
                 height: float = 10.0):
        self.cfg = cfg
        self.R = cfg.mr.n_robots
        self.beams = beams
        self.trajs = [
            W.simulate_robot(world, W.corridor_waypoints(width, height, r,
                                                         n_loops),
                             seed=seed + 7 * r, beams=beams, fov=fov,
                             max_range=max_range, odom_noise=odom_noise)
            for r in range(self.R)
        ]
        self.states = fleet.stack_states([
            MR.init_mr_state(cfg, beams, self.trajs[r].gt[0],
                             self.trajs[r].ranges[0], fov, max_range,
                             my_id=r)
            for r in range(self.R)
        ])
        self._est = [t.gt[0].astype(np.float64).copy() for t in self.trajs]
        self._kf_est = [e.copy() for e in self._est]
        self.kf_gt: List[list] = [[t.gt[0]] for t in self.trajs]
        self.closure_stats = np.zeros(self.R, np.int64)
        self.round_latencies: List[float] = []
        self._n_live = np.ones(self.R, np.int64)
        self._e_live = np.zeros(self.R, np.int64)

    def _dead_reckon(self, r: int, rel):
        e = self._est[r]
        c, s = np.cos(e[2]), np.sin(e[2])
        self._est[r] = np.array([
            e[0] + c * rel[0] - s * rel[1],
            e[1] + s * rel[0] + c * rel[1],
            (e[2] + rel[2] + np.pi) % (2 * np.pi) - np.pi])

    def _buckets(self):
        # worst-case growth of one ROUND: the local keyframe step (1
        # vertex; odom + direct + full closure-buffer flush edges) plus
        # the exchange (1 foreign vertex per peer; per peer a full
        # inter-robot window flush + a replaced star)
        peers = self.R - 1
        kf_buf = (self.cfg.slam.window_loop_closure
                  * self.cfg.max_regions * SL.LC_HYPOTHESES)
        grow_e = (1 + self.cfg.max_regions + kf_buf
                  + peers * (2 * self.cfg.mr.window_mr_loop_closure
                             + self.cfg.mr.star_edges_cap))
        cap_n, cap_e = self.cfg.max_vertices, self.cfg.max_edges
        nb = SL._bucket_for(int(self._n_live.max()) + 1 + peers, cap_n)
        eb = SL._bucket_for(max(int(self._e_live.max()) + grow_e, 4 * nb),
                            cap_e)
        return nb, eb

    def run(self, max_ticks: int | None = None):
        import time

        cfg = self.cfg
        T = min(len(t.gt) for t in self.trajs)
        if max_ticks:
            T = min(T, max_ticks)
        for t in range(1, T):
            do = np.zeros(self.R, bool)
            for r in range(self.R):
                self._dead_reckon(r, self.trajs[r].rel_odom[t - 1])
                d = np.hypot(*(self._est[r][:2] - self._kf_est[r][:2]))
                dth = abs((self._est[r][2] - self._kf_est[r][2] + np.pi)
                          % (2 * np.pi) - np.pi)
                do[r] = (d > cfg.slam.linear_update
                         or dth > cfg.slam.angular_update) \
                    and self._n_live[r] < cfg.max_vertices - 4
            if not do.any():
                continue
            gt_pos = np.stack([tr.gt[min(t, len(tr.gt) - 1), :2]
                               for tr in self.trajs])
            conn = np.asarray(NET.sim_connectivity(
                jnp.asarray(gt_pos, jnp.float32), cfg.mr.sim_comm_range))
            nb, eb = self._buckets()
            t0 = time.perf_counter()
            self.states, infos = fleet_keyframe_round(
                self.states, jnp.asarray(do),
                jnp.asarray(np.stack(self._est), jnp.float32),
                jnp.asarray(np.stack([tr.ranges[t] for tr in self.trajs]),
                            jnp.float32),
                jnp.asarray(conn), cfg, nb, eb)
            infos = np.asarray(infos)          # ONE fetch for the fleet
            self.round_latencies.append(time.perf_counter() - t0)
            for r in range(self.R):
                # post-exchange sizes apply to every robot (exchange grows
                # graphs even without a local keyframe)
                self._n_live[r] = int(infos[r, SL.INFO_WIDTH])
                self._e_live[r] = int(infos[r, SL.INFO_WIDTH + 1])
                if not do[r]:
                    continue
                self.kf_gt[r].append(self.trajs[r].gt[t])
                self._est[r] = infos[r, :3].astype(np.float64)
                self._kf_est[r] = self._est[r].copy()
                self.closure_stats[r] += int(infos[r, 4])

    @property
    def robot_states(self):
        return fleet.unstack_states(self.states, self.R)
