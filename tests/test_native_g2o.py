"""Native C++ .g2o parser: parity with the Python parser + speed sanity."""

import time

import numpy as np
import pytest

from cg_mrslam_tpu import native
from cg_mrslam_tpu.io import g2o


def _write_sample(path, n=200, with_lasers=True):
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for k in range(n):
            x, y, th = rng.normal(0, 5, 3)
            f.write(f"VERTEX_SE2 {k + 10000} {x:.6f} {y:.6f} {th:.6f}\n")
            if with_lasers and k % 2 == 0:
                rs = " ".join(f"{r:.3f}" for r in rng.uniform(0.5, 8, 16))
                f.write(
                    f"ROBOTLASER1 0 -1.5708 3.1416 0.19635 8.00 0.01 0 16 "
                    f"{rs} 0 {x:.4f} {y:.4f} {th:.4f} {x:.4f} {y:.4f} "
                    f"{th:.4f} 0 0 0 0 0 0 host 0\n")
        f.write("FIX 10000\n")
        for k in range(n - 1):
            z = rng.normal(0, 1, 3)
            f.write(
                f"EDGE_SE2 {k + 10000} {k + 10001} "
                f"{z[0]:.6f} {z[1]:.6f} {z[2]:.6f} "
                f"100 0 0 100 0 1000\n")


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_native_matches_python(tmp_path):
    path = str(tmp_path / "s.g2o")
    _write_sample(path)
    a = g2o.load(path, native=True)
    b = g2o.load(path, native=False)
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(np.asarray(a.graph.poses),
                               np.asarray(b.graph.poses), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.graph.fixed),
                                  np.asarray(b.graph.fixed))
    np.testing.assert_array_equal(np.asarray(a.graph.e_ij),
                                  np.asarray(b.graph.e_ij))
    np.testing.assert_allclose(np.asarray(a.graph.e_info),
                               np.asarray(b.graph.e_info), atol=1e-6)
    assert a.scans is not None and b.scans is not None
    np.testing.assert_array_equal(np.asarray(a.scans.smask),
                                  np.asarray(b.scans.smask))
    np.testing.assert_allclose(np.asarray(a.scans.ranges),
                               np.asarray(b.scans.ranges), atol=1e-3)


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_native_faster_on_big_file(tmp_path):
    path = str(tmp_path / "big.g2o")
    _write_sample(path, n=3000, with_lasers=False)
    g2o.load(path, native=True)   # warm: jax backend init + .so build
    g2o.load(path, native=False)
    t0 = time.perf_counter()
    g2o.load(path, native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    g2o.load(path, native=False)
    t_py = time.perf_counter() - t0
    # loose bound: native must not be slower (it is typically ≥5x faster)
    assert t_native < t_py * 1.5, (t_native, t_py)
