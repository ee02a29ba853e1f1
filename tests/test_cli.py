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


def test_srslam_save_every_keyframe(tmp_path, monkeypatch):
    """Reference crash-tolerance cadence (cg_mrslam.cpp:228-230): with
    --save-every-keyframe the .g2o checkpoint exists and is loadable
    BEFORE the end-of-run save — killing the run mid-way must leave a
    resumable graph on disk. Pinned by observing the file during the
    run via the engine's own keyframe prints being interleaved with
    writes (the per-keyframe writer joins its previous thread, so after
    main() returns every intermediate write has landed; we assert the
    final file parses AND that a mid-run mtime was recorded)."""
    monkeypatch.chdir(tmp_path)
    import cg_mrslam_tpu.cli as cli

    mtimes = []
    orig = cli._checkpoint_every_keyframe

    def spy(slam_state, cfg, name, robot_id=0):
        orig(slam_state, cfg, name, robot_id=robot_id)
        t = getattr(cli._checkpoint_every_keyframe, "_thread", None)
        if t is not None:
            t.join()
        mtimes.append(os.path.getmtime(f"robot-{robot_id}-{name}.g2o"))

    monkeypatch.setattr(cli, "_checkpoint_every_keyframe", spy)
    rc = main([
        "srslam", "-o", "ck", "--ticks", "200", "--beams", "120",
        "--world-width", "16", "--world-height", "10",
        "--max-range", "8", "--resolution", "0.05",
        "--max-vertices", "128", "--max-edges", "512",
        "--save-every-keyframe",
    ])
    assert rc == 0 or rc is None
    # one checkpoint per keyframe (minus any in-flight join at exit)
    assert len(mtimes) >= 5
    loaded = g2o.load("robot-0-ck.g2o")
    assert int(np.asarray(loaded.graph.vmask).sum()) > 5
