"""Window extraction of scripts/bench_sustained.py: the CPU-side per-frame
JSONL -> per-window steps/s + Amdahl bound arithmetic."""

import importlib.util
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "bench_sustained", os.path.join(HERE, "scripts",
                                        "bench_sustained.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cpu_windows_arithmetic(tmp_path, monkeypatch):
    mod = _load_module()
    # synthetic 500-frame trace: 1 s/frame, half the time in particle loops
    rows = [{"frame": i, "secs": 1.0 + 0.5 * (50 <= i < 70),
             "particle_secs": 0.5, "ke": 1.0, "dt": 0.1}
            for i in range(500)]
    path = tmp_path / "pf.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    monkeypatch.setattr(mod, "PERFRAME", str(path))
    out = mod.cpu_windows()
    assert out["frames_available"] == 500
    np.testing.assert_allclose(out["early"]["steps_per_sec"], 1.0)
    np.testing.assert_allclose(out["post_impact"]["steps_per_sec"], 1 / 1.5)
    # Amdahl bound: serial fraction = secs - particle_secs per frame
    np.testing.assert_allclose(
        out["early"]["amdahl_bound_steps_per_sec"], 2.0)
    np.testing.assert_allclose(
        out["post_impact"]["amdahl_bound_steps_per_sec"], 1.0)
    full = out["full"]
    exp_secs = (498 * 1.0 + 20 * 0.5) / 498     # frames 2..499
    np.testing.assert_allclose(full["steps_per_sec"], 1 / exp_secs)


def test_real_trace_windows_consistent():
    """The checked-in 500-frame ref_cpu trace parses and its windows obey
    the published relations (Amdahl bound >= measured steps/s)."""
    mod = _load_module()
    out = mod.cpu_windows()
    if out is None:
        import pytest
        pytest.skip("per-frame trace not present")
    for w in ("early", "post_impact", "full"):
        assert out[w]["amdahl_bound_steps_per_sec"] >= out[w]["steps_per_sec"]
        assert 0 < out[w]["particle_fraction"] < 1
