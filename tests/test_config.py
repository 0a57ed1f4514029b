"""JSON scene config tests."""

import json

import numpy as np
import pytest

from fluidsim_tpu.config import scene_from_config, make_sim


CFG = {
    "kind": "flip",
    "bound": 12,
    "density": 3,
    "seed": [{"box": [[-4, -4, -4], [4, 4, 4]]},
             {"sphere": {"center": [0, 7, 0], "radius": 2}}],
    "solid": [{"box": [[-2, -10, -2], [2, -6, 2]]}],
    "params": {"max_dt": 0.05},
}


def test_scene_from_config_geometry():
    scene, overrides = scene_from_config(dict(CFG))
    assert scene.spec.bound == 12 and scene.spec.wall == 10
    b = scene.spec.bound
    assert scene.seed_mask[b, b, b]                      # box centre seeded
    assert scene.seed_mask[b, b + 7, b]                  # sphere seeded
    assert scene.solid[b, b - 8, b]                      # obstacle solid
    assert not scene.seed_mask[b, b - 8, b]              # seed excludes solid
    assert overrides == {"max_dt": 0.05}


def test_make_sim_runs_and_applies_params(tmp_path):
    path = str(tmp_path / "scene.json")
    json.dump(CFG, open(path, "w"))
    sim = make_sim(path)
    assert sim.params.max_dt == 0.05
    m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))


def test_mpm_config():
    cfg = {"kind": "mpm", "bound": 15, "density": 50,
           "seed": [{"sphere": {"center": [0, -10, 0], "radius": 3}}]}
    sim = make_sim(cfg)
    assert sim.num_particles > 100
    m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))


def test_config_rejects_empty_seed():
    with pytest.raises(ValueError):
        scene_from_config({"kind": "flip", "bound": 10, "seed": []})


def test_cli_config(tmp_path):
    from fluidsim_tpu.cli import main as cli_main
    path = str(tmp_path / "scene.json")
    json.dump(CFG, open(path, "w"))
    out = str(tmp_path / "sim")
    rc = cli_main(["fluid", "--config", path, "--frames", "2", "--out", out,
                   "--no-accum", "--echo-every", "100"])
    assert rc == 0
    import os
    assert os.path.exists(os.path.join(out, "mygrids1.vdb"))
