"""Multi-device sharding of batched pose-graph solves.

The reference's only distribution mechanism is peer-to-peer UDP between
robot processes (``/root/reference/src/mrslam/graph_comm.cpp``); it has no
numeric parallelism beyond 4 OpenMP threads in the matcher
(``chargrid.cpp:223-232``). The TPU-native framework distributes along two
orthogonal mesh axes instead:

* ``graphs`` — data parallelism over independent SLAM worlds (Monte-Carlo
  replicas, per-robot graphs, parameter sweeps). No communication.
* ``shard`` — the graph dimension: EDGES of each graph are sharded across
  devices; every device assembles the normal-equation contribution of its
  edge shard and a ``psum`` over ICI reduces H and b before the
  (replicated) solve. This is the analogue of tensor/sequence sharding
  for this workload — it scales the per-graph edge count, which is what
  grows with trajectory length (SURVEY §5 long-context row).

Everything is ``shard_map`` + XLA collectives; no NCCL/MPI translation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from functools import partial as _partial

# full-f32 MXU precision — see solver/gauss_newton.py rationale
_es = _partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cg_mrslam_tpu.core.graph import PoseGraph, unpack_info
from cg_mrslam_tpu.core.linearize import linearize
from cg_mrslam_tpu.utils import se2


def make_mesh(n_devices: int, shard: int = 2, devices=None) -> Mesh:
    """Mesh over the first ``n_devices`` devices: (graphs × shard).
    ``devices`` overrides the default-platform device list (e.g.
    ``jax.devices("cpu")`` for a virtual validation mesh when the
    default backend is a single TPU)."""
    devices = jax.devices() if devices is None else devices
    devs = np.asarray(devices[:n_devices]).reshape(-1, shard)
    return Mesh(devs, ("graphs", "shard"))


def shard_batch(g: PoseGraph, mesh: Mesh) -> PoseGraph:
    """Place a batched graph ``[B, ...]``: batch axis over ``graphs``,
    edge axis over ``shard``, vertex arrays replicated within a row."""
    def put(x, edge_axis: bool):
        spec = P("graphs", "shard") if edge_axis else P("graphs")
        return jax.device_put(x, NamedSharding(mesh, spec))

    edge_fields = {"e_ij", "e_z", "e_info", "emask", "e_level", "e_owner"}
    import dataclasses
    return dataclasses.replace(g, **{
        f.name: put(getattr(g, f.name), f.name in edge_fields)
        for f in dataclasses.fields(g)
    })


def _local_normal_eq(poses, e_ij, e_z, e_info, emask, dtype):
    """H, b, degree from one edge shard (one graph)."""
    n = poses.shape[0]
    mask = emask.astype(dtype)
    e, Ji, Jj = linearize(poses, e_ij, e_z)
    omega = unpack_info(e_info) * mask[:, None, None]
    JiT_O = _es("eki,ekl->eil", Ji, omega)
    JjT_O = _es("eki,ekl->eil", Jj, omega)
    Hii = _es("eil,elj->eij", JiT_O, Ji)
    Hij = _es("eil,elj->eij", JiT_O, Jj)
    Hjj = _es("eil,elj->eij", JjT_O, Jj)
    bi = _es("eil,el->ei", JiT_O, e)
    bj = _es("eil,el->ei", JjT_O, e)
    vi, vj = e_ij[:, 0], e_ij[:, 1]
    blk_r = jnp.stack([vi, vi, vj, vj], axis=1)
    blk_c = jnp.stack([vi, vj, vi, vj], axis=1)
    vals = jnp.stack([Hii, Hij, jnp.swapaxes(Hij, -1, -2), Hjj], axis=1)
    off = jnp.arange(3, dtype=jnp.int32)
    rows = (3 * blk_r)[:, :, None, None] + off[None, None, :, None]
    cols = (3 * blk_c)[:, :, None, None] + off[None, None, None, :]
    rows, cols = jnp.broadcast_arrays(rows, cols)
    H = jnp.zeros((3 * n, 3 * n), dtype)
    H = H.at[rows.reshape(-1), cols.reshape(-1)].add(vals.reshape(-1))
    b = jnp.zeros((3 * n,), dtype)
    bidx = (3 * jnp.stack([vi, vj], 1))[:, :, None] + off[None, None, :]
    b = b.at[bidx.reshape(-1)].add(jnp.stack([bi, bj], 1).reshape(-1))
    deg = jnp.zeros((n,), jnp.int32)
    em = emask.astype(jnp.int32)
    deg = deg.at[vi].add(em).at[vj].add(em)
    return H, b, deg


def sharded_optimize(g: PoseGraph, mesh: Mesh, iterations: int = 5):
    """Batched GN with edge-sharded Hessian assembly.

    ``g`` is a batched graph ``[B, ...]`` already placed by
    :func:`shard_batch`. Per iteration each device assembles H/b from its
    local edge shard, ``psum`` over the ``shard`` axis reduces them (the
    ICI collective), and the solve runs replicated. Returns the optimized
    batched graph poses ``[B, N, 3]``.
    """
    dtype = g.poses.dtype

    def body(poses, vmask, fixed, e_ij, e_z, e_info, emask):
        # shapes inside shard_map: poses [Bl, N, 3], e_* [Bl, El, ...]
        def one_iter(p, _):
            H, b, deg = jax.vmap(
                lambda pp, ij, z, info, em: _local_normal_eq(
                    pp, ij, z, info, em, dtype)
            )(p, e_ij, e_z, e_info, emask)
            H = jax.lax.psum(H, "shard")
            b = jax.lax.psum(b, "shard")
            deg = jax.lax.psum(deg, "shard")
            free = vmask & ~fixed & (deg > 0)
            free3 = jnp.repeat(free, 3, axis=-1).astype(dtype)
            Hf = H * free3[:, :, None] * free3[:, None, :]
            Hf = Hf + jax.vmap(jnp.diag)(1.0 - free3)
            dx = -jax.vmap(
                lambda hh, bb: jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(hh, lower=True), bb)
            )(Hf, b * free3)
            dx = dx * free3
            return se2.oplus(p, dx.reshape(p.shape)), None

        p, _ = jax.lax.scan(one_iter, poses, None, length=iterations)
        return p

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("graphs"), P("graphs"), P("graphs"),
                  P("graphs", "shard"), P("graphs", "shard"),
                  P("graphs", "shard"), P("graphs", "shard")),
        out_specs=P("graphs"),
    )
    return fn(g.poses, g.vmask, g.fixed, g.e_ij, g.e_z, g.e_info, g.emask)


def _local_pcg_factors(poses, e_ij, e_z, e_info, emask, dtype):
    """Per-edge-shard linearization for the matrix-free path: gradient
    blocks, block-diagonal Hessian blocks, degrees (all to be psum'd)."""
    mask = emask.astype(dtype)
    e, Ji, Jj = linearize(poses, e_ij, e_z)
    omega = unpack_info(e_info) * mask[:, None, None]
    JiT_O = _es("eki,ekl->eil", Ji, omega)
    JjT_O = _es("eki,ekl->eil", Jj, omega)
    n = poses.shape[0]
    vi, vj = e_ij[:, 0], e_ij[:, 1]
    b = jnp.zeros((n, 3), dtype)
    b = b.at[vi].add(_es("eil,el->ei", JiT_O, e))
    b = b.at[vj].add(_es("eil,el->ei", JjT_O, e))
    diag = jnp.zeros((n, 3, 3), dtype)
    diag = diag.at[vi].add(_es("eil,elj->eij", JiT_O, Ji))
    diag = diag.at[vj].add(_es("eil,elj->eij", JjT_O, Jj))
    deg = jnp.zeros((n,), jnp.int32)
    em = emask.astype(jnp.int32)
    deg = deg.at[vi].add(em).at[vj].add(em)
    return (Ji, Jj, omega), b, diag, deg


def sharded_optimize_pcg(g: PoseGraph, mesh: Mesh, iterations: int = 5,
                         cg_iters: int = 64):
    """Matrix-free sharded GN: the 100k-pose regime over devices.

    Same mesh layout as :func:`sharded_optimize`, but H is NEVER
    materialized (at 100k poses the dense H would be 360 GB): each CG
    iteration computes the local Hessian-vector product from the
    device's edge shard (two gathers + a scatter-add) and a ``psum``
    over ``shard`` reduces it — the per-iteration collective is one
    ``[N,3]`` vector, so the ICI traffic is O(N) per CG step regardless
    of edge count. Block-Jacobi preconditioning from the psum'd diagonal
    blocks. Returns optimized poses ``[B, N, 3]``.
    """
    dtype = g.poses.dtype

    def body(poses, vmask, fixed, e_ij, e_z, e_info, emask):
        def one_iter(p, _):
            (Ji, Jj, omega), b, diag, deg = jax.vmap(
                lambda pp, ij, z, info, em: _local_pcg_factors(
                    pp, ij, z, info, em, dtype)
            )(p, e_ij, e_z, e_info, emask)
            b = jax.lax.psum(b, "shard")
            diag = jax.lax.psum(diag, "shard")
            deg = jax.lax.psum(deg, "shard")
            free = vmask & ~fixed & (deg > 0)
            freeb = free[..., None].astype(dtype)
            eye = jnp.eye(3, dtype=dtype)
            dsafe = jnp.where(free[..., None, None], diag, eye) \
                + 1e-6 * eye
            minv = jnp.linalg.inv(dsafe)

            def hvp(x):
                def one(ij, jji, jjj, om, xx):
                    vi, vj = ij[:, 0], ij[:, 1]
                    xi, xj = xx[vi], xx[vj]
                    yi = _es("eki,ekl,elm,em->ei", jji, om, jji,
                                    xi) \
                        + _es("eki,ekl,elm,em->ei", jji, om, jjj,
                                     xj)
                    yj = _es("eki,ekl,elm,em->ei", jjj, om, jji,
                                    xi) \
                        + _es("eki,ekl,elm,em->ei", jjj, om, jjj,
                                     xj)
                    return jnp.zeros_like(xx).at[vi].add(yi).at[vj].add(
                        yj)

                y = jax.vmap(one)(e_ij, Ji, Jj, omega, x)
                return jax.lax.psum(y, "shard") * freeb

            rhs = -b * freeb

            def precond(r):
                return _es("...nij,...nj->...ni", minv, r) * freeb

            x0 = jnp.zeros_like(rhs)
            r0 = rhs
            z0 = precond(r0)

            def cg(state, _):
                x, r, z, pdir, rz = state
                hp = hvp(pdir)
                denom = jnp.sum(pdir * hp, axis=(-2, -1), keepdims=True)
                alpha = rz / jnp.maximum(denom, 1e-30)
                x = x + alpha * pdir
                r = r - alpha * hp
                z = precond(r)
                rz2 = jnp.sum(r * z, axis=(-2, -1), keepdims=True)
                beta = rz2 / jnp.maximum(rz, 1e-30)
                return (x, r, z, z + beta * pdir, rz2), None

            rz0 = jnp.sum(r0 * z0, axis=(-2, -1), keepdims=True)
            (dx, *_), _ = jax.lax.scan(cg, (x0, r0, z0, z0, rz0), None,
                                       length=cg_iters)
            return se2.oplus(p, dx), None

        p, _ = jax.lax.scan(one_iter, poses, None, length=iterations)
        return p

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("graphs"), P("graphs"), P("graphs"),
                  P("graphs", "shard"), P("graphs", "shard"),
                  P("graphs", "shard"), P("graphs", "shard")),
        out_specs=P("graphs"),
    )
    return fn(g.poses, g.vmask, g.fixed, g.e_ij, g.e_z, g.e_info, g.emask)
