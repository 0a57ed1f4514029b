"""CLI + checkpoint/resume tests."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.cli import main as cli_main
from fluidsim_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from fluidsim_tpu.io.vdb import read_vdb
from fluidsim_tpu.models.flip import FlipSim, FlipState
from fluidsim_tpu.scenes import get_scene


def test_cli_fluid_writes_vdb_and_metrics(tmp_path):
    out = str(tmp_path / "sim")
    metrics = str(tmp_path / "m.jsonl")
    rc = cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
                   "--density", "3", "--frames", "3", "--out", out,
                   "--metrics", metrics, "--echo-every", "100"])
    assert rc == 0
    for i in range(3):
        (g,) = read_vdb(os.path.join(out, f"mygrids{i}.vdb"))
        assert g.values.max() > 0        # occupancy present
    accum = read_vdb(os.path.join(out, "mygrids.vdb"))
    assert len(accum) == 3
    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) == 3
    assert {"frame", "dt", "kinetic_energy", "error"} <= set(lines[0])


def test_cli_mpm_runs(tmp_path):
    out = str(tmp_path / "sim")
    rc = cli_main(["mpm", "--scene", "mpm_pea", "--frames", "2", "--out", out,
                   "--no-accum", "--echo-every", "100"])
    assert rc == 0
    (g,) = read_vdb(os.path.join(out, "mygrids1.vdb"))
    assert g.values.max() > 0


def test_cli_print(tmp_path, capsys):
    out = str(tmp_path / "sim")
    cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
              "--density", "3", "--frames", "1", "--out", out, "--no-accum",
              "--echo-every", "100"])
    rc = cli_main(["print", os.path.join(out, "mygrids0.vdb")])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "1 grid(s)" in cap and "float" in cap


def test_checkpoint_resume_bit_exact(tmp_path):
    scene = get_scene("water_cube_drop", bound=10, density=3.0)
    sim = FlipSim(scene)
    for _ in range(3):
        sim.step()
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, sim.state, sim.params)

    # run two more frames from the live sim
    for _ in range(2):
        sim.step()
    pos_live = np.asarray(sim.state.pos)

    # resume from checkpoint into a fresh sim and run the same two frames
    sim2 = FlipSim(scene)
    sim2.state, meta = load_checkpoint(ck, FlipState)
    assert meta["params"]["bound"] == 10
    for _ in range(2):
        sim2.step()
    np.testing.assert_array_equal(np.asarray(sim2.state.pos), pos_live)
    np.testing.assert_array_equal(np.asarray(sim2.state.vel),
                                  np.asarray(sim.state.vel))


def test_checkpoint_wrong_class_rejected(tmp_path):
    scene = get_scene("water_cube_drop", bound=10, density=3.0)
    sim = FlipSim(scene)
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, sim.state, sim.params)
    from fluidsim_tpu.models.mpm import MpmState
    try:
        load_checkpoint(ck, MpmState)
        assert False, "should have raised"
    except ValueError as e:
        assert "FlipState" in str(e)


def test_cli_resume_flow(tmp_path):
    out = str(tmp_path / "sim")
    cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
              "--density", "3", "--frames", "4", "--out", out, "--no-vdb",
              "--checkpoint-every", "2", "--echo-every", "100"])
    ck = os.path.join(out, "ckpt_3.npz")
    assert os.path.exists(ck)
    metrics = str(tmp_path / "resumed.jsonl")
    rc = cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
                   "--density", "3", "--frames", "2", "--out", out, "--no-vdb",
                   "--resume", ck, "--metrics", metrics, "--echo-every", "100"])
    assert rc == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines[0]["frame"] == 4 and lines[-1]["frame"] == 5
