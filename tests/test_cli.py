"""CLI smoke: srslam end-to-end run writes a loadable .g2o and a map."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end replay; see pytest.ini two-tier invocation

import os

import numpy as np

from cg_mrslam_tpu.cli import main
from cg_mrslam_tpu.io import g2o


def test_srslam_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "srslam", "-o", "t", "--ticks", "260", "--beams", "120",
        "--world-width", "16", "--world-height", "10",
        "--max-range", "8", "--resolution", "0.05",
        "--max-vertices", "128", "--max-edges", "512",
    ])
    assert rc == 0 or rc is None
    assert os.path.exists("robot-0-t.g2o")
    assert os.path.exists("robot-0-t-map.pgm")
    loaded = g2o.load("robot-0-t.g2o")
    n = int(np.asarray(loaded.graph.vmask).sum())
    assert n > 10
    assert loaded.scans is not None
    assert int(np.asarray(loaded.graph.emask).sum()) >= n - 1
