"""Multi-device sharded solve must equal the single-device solve.

Runs on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _build_batch
from cg_mrslam_tpu.parallel import sharding as SH
from cg_mrslam_tpu.solver import gauss_newton as gn


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_matches_single_device():
    g = _build_batch(8)
    mesh = SH.make_mesh(8, shard=2)
    gs = SH.shard_batch(g, mesh)
    poses_sharded = np.asarray(SH.sharded_optimize(gs, mesh, iterations=5))

    # psum reduction order differs from the single-device sum; GN
    # iterations amplify the last-bit drift to ~1e-3 (same bound as
    # __graft_entry__.dryrun_multichip). Angles compared modulo 2pi.
    ref = jax.vmap(lambda gg: gn.optimize(gg, iterations=5))(g)
    d = poses_sharded - np.asarray(ref.poses)
    d[..., 2] = (d[..., 2] + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(d).max() < 5e-3, np.abs(d).max()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_handles_uneven_edge_shards():
    # edge count not a multiple of shard size still solves correctly
    # (padding slots are masked)
    g = _build_batch(4, n_vertices=64, n_edges=130)
    mesh = SH.make_mesh(4, shard=2)
    gs = SH.shard_batch(g, mesh)
    poses = np.asarray(SH.sharded_optimize(gs, mesh, iterations=3))
    ref = jax.vmap(lambda gg: gn.optimize(gg, iterations=3))(g)
    np.testing.assert_allclose(poses, np.asarray(ref.poses), atol=5e-4)


def test_sharded_pcg_matches_single_device():
    """Matrix-free sharded GN (edge shards + psum'd Hessian-vector
    products) equals the single-device PCG solver."""
    import jax

    from cg_mrslam_tpu.solver import pcg as PCG

    mesh = SH.make_mesh(8, shard=2)
    g = _build_batch(mesh.shape["graphs"] * 2)
    gs = SH.shard_batch(g, mesh)
    poses = SH.sharded_optimize_pcg(gs, mesh, iterations=3, cg_iters=48)
    ref = jax.vmap(lambda gg: PCG.optimize_pcg(gg, iterations=3,
                                               cg_iters=48))(g)
    d = np.asarray(poses) - np.asarray(ref.poses)
    d[..., 2] = (d[..., 2] + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(d).max() < 5e-3, np.abs(d).max()
