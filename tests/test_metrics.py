"""Recorder / roofline accounting unit tests."""

import json

from cg_mrslam_tpu.utils.metrics import Recorder, speed_of_light


def test_recorder_summary_and_jsonl(tmp_path):
    r = Recorder()
    for k in range(100):
        r.log("lat", k / 1000.0, unit="s")
    with r.timer("span"):
        pass
    s = r.summary()
    assert s["lat"]["count"] == 100
    assert abs(s["lat"]["p99"] - 0.099) < 2e-3
    assert "span" in s and s["span"]["count"] == 1
    p = str(tmp_path / "m.jsonl")
    r.to_jsonl(p)
    lines = [json.loads(x) for x in open(p)]
    assert len(lines) == 101
    assert lines[0]["name"] == "lat"


def test_speed_of_light():
    # 1 TFLOP in 10 ms on v5e: 100 TFLOP/s vs 394 peak
    out = speed_of_light(1e12, 1e9, 0.01, chip="v5e")
    assert abs(out["flops_frac_of_peak"] - 1e14 / 394e12) < 1e-6
    assert out["bound"] == "compute"
    assert 0 < out["sol_frac"] <= 1.001
