"""Virtual network: connectivity gating + loss injection for multi-robot
exchange.

TPU-native replacement for the reference's UDP communication backend
(``/root/reference/src/mrslam/graph_comm.cpp``): instead of datagrams on
port 42001 between processes, robots exchange fixed-shape arrays gated by
a boolean connectivity matrix. The three modalities of ``robotsInRange``
(``graph_comm.cpp:70-101``) become mask constructors:

* REAL — always connected (the radio decides, ``:74-78``);
* SIM — ground-truth distance < 5 m (``:79-87``, ``SIM_COMM_RANGE`` at
  ``graph_comm.h:48``);
* BAG — a ping from that robot within the last 10 s (``:88-98``).

The reference's protocol is loss-tolerant by design (estimates resent,
stars replaced wholesale — ``condensed_graph_buffer.cpp:487-499``), so the
mask can additionally model drops/partitions for fault-injection tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def real_connectivity(n_robots: int) -> jax.Array:
    """All pairs connected (REAL modality)."""
    m = jnp.ones((n_robots, n_robots), bool)
    return m & ~jnp.eye(n_robots, dtype=bool)


def sim_connectivity(gt_positions: jax.Array,
                     comm_range: float = 5.0) -> jax.Array:
    """Range-gated pairs from ground-truth positions ``[R, 2]``."""
    d = jnp.linalg.norm(
        gt_positions[:, None, :] - gt_positions[None, :, :], axis=-1)
    m = d < comm_range
    return m & ~jnp.eye(gt_positions.shape[0], dtype=bool)


def bag_connectivity(last_ping_age: jax.Array,
                     ping_timeout: float = 10.0) -> jax.Array:
    """Ping-replay gating: ``last_ping_age [R, R]`` seconds since robot j
    last pinged robot i."""
    m = last_ping_age < ping_timeout
    return m & ~jnp.eye(last_ping_age.shape[0], dtype=bool)


def inject_drops(mask: jax.Array, key: jax.Array,
                 drop_prob: float) -> jax.Array:
    """Randomly sever live links (fault injection; the reference's UDP
    silently drops — the protocol must converge regardless)."""
    keep = jax.random.bernoulli(key, 1.0 - drop_prob, mask.shape)
    return mask & keep


class PingLog:
    """Connectivity beacon record/replay — the ``comm_publisher`` node +
    BAG modality (``/root/reference/src/comm_publisher.cpp:29-129``
    broadcasts "I am robot N" every 250 ms and publishes a Ping message
    per reception; BAG runs replay those pings to reconstruct who could
    talk to whom, ``graph_comm.cpp:88-98``).

    ``record(t, i, j)`` logs that robot ``i`` heard robot ``j`` at time
    ``t``; :meth:`connectivity` replays the log into a mask for any time.
    """

    def __init__(self, n_robots: int):
        self.n = n_robots
        self.events: list[tuple[float, int, int]] = []

    def record(self, t: float, hearer: int, sender: int) -> None:
        self.events.append((float(t), int(hearer), int(sender)))

    def record_from_positions(self, t: float, positions,
                              comm_range: float = 5.0) -> None:
        """Beacon emulation: every pair in radio range pings (what the
        comm_publisher produces when run alongside a real experiment)."""
        import numpy as np

        pos = np.asarray(positions)
        for i in range(self.n):
            for j in range(self.n):
                if i != j and np.hypot(*(pos[i] - pos[j])) < comm_range:
                    self.record(t, i, j)

    def connectivity(self, t: float, timeout: float = 10.0) -> jax.Array:
        """BAG-modality mask at time ``t``: ping age < timeout."""
        import numpy as np

        age = np.full((self.n, self.n), np.inf)
        for (ts, i, j) in self.events:
            if ts <= t:
                age[i, j] = min(age[i, j], t - ts)
        return bag_connectivity(jnp.asarray(age, jnp.float32), timeout)
