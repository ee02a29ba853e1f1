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
