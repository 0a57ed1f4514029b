"""Workload-level physics oracles (the validation layer the reference lacks,
SURVEY.md §4): hydrostatic equilibrium, obstacle impermeability, energy
behaviour, and solver quality across scenes."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.models.flip import FlipSim, FlipParams
from fluidsim_tpu.models.mpm import MpmSim, MpmParams
from fluidsim_tpu.scenes import get_scene, Scene, _box_mask
from fluidsim_tpu.core.gridspec import GridSpec


def _pool_scene():
    spec = GridSpec(bound=12, wall=10)
    return Scene(name="pool", kind="flip", spec=spec, solid=spec.wall_mask(),
                 normals=spec.wall_normals(),
                 # rests directly on the floor (solid below y = -10)
                 seed_mask=_box_mask(spec, (-9, -10, -9), (9, -6, 9)),
                 density=4.0, gravity=(0.0, -10.0, 0.0))


def test_hydrostatic_pool_clean_projection():
    # The clean (non-compat) projection balances gravity exactly: a resting
    # pool keeps its surface height and stays essentially still.
    sim = FlipSim(_pool_scene(), params=FlipParams(
        bound=12, wall=10, compat_projection=False))
    y0 = float(np.median(np.asarray(sim.state.pos)[:, 1]))
    for _ in range(20):
        m = sim.step()
    vel = np.asarray(sim.state.vel)
    assert float(np.sqrt((vel ** 2).mean())) < 0.5
    pos = np.asarray(sim.state.pos)
    assert abs(float(np.median(pos[:, 1])) - y0) < 0.3
    assert (pos[:, 1] > -10.6).all()


def test_hydrostatic_pool_compat_behaviour():
    # The reference's quirky projection (dt/10 gradient, per-pass gravity,
    # 0.1 tolerance) lets a resting pool compact toward the floor — that IS
    # the reference behaviour; assert its signature: velocities decay, no
    # floor penetration, and the surface stabilises low.
    sim = FlipSim(_pool_scene())
    for _ in range(20):
        m = sim.step()
    vel = np.asarray(sim.state.vel)
    assert float(np.sqrt((vel ** 2).mean())) < 3.0
    pos = np.asarray(sim.state.pos)
    assert (pos[:, 1] > -11.5).all()        # nothing through the floor
    assert float(np.median(pos[:, 1])) < -9.0   # compacted (reference quirk)


def test_obstacle_impermeable():
    # Water falling onto an interior solid block never enters it.
    spec = GridSpec(bound=12, wall=10)
    block = _box_mask(spec, (-3, -10, -3), (3, -4, 3))
    sc = Scene(name="obst", kind="flip", spec=spec,
               solid=spec.wall_mask() | block,
               normals=spec.wall_normals(),
               seed_mask=_box_mask(spec, (-2, 2, -2), (2, 8, 2)),
               density=4.0, gravity=(0.0, -10.0, 0.0))
    sim = FlipSim(sc)
    for _ in range(40):
        sim.step()
    pos = np.asarray(sim.state.pos)
    # particles may rest on the block's surface shell (the bounce probes
    # round positions, fluid.cc:1006-1029), but never in its interior
    r = np.round(pos).astype(int)
    interior = ((np.abs(r[:, 0]) <= 2) & (r[:, 1] >= -9) & (r[:, 1] <= -5)
                & (np.abs(r[:, 2]) <= 2))
    frac = interior.mean()
    assert frac < 0.002, f"{frac:.2%} of particles inside the solid block"


def test_flip_energy_decays_after_settling():
    sim = FlipSim(get_scene("water_cube_drop", bound=12, density=3.0))
    kes = []
    for _ in range(60):
        kes.append(float(sim.step()["kinetic_energy"]))
    peak = int(np.argmax(kes))
    assert peak < 40                        # impact happened
    late = np.mean(kes[-5:])
    assert late < 0.35 * kes[peak], "energy did not dissipate after impact"


def test_mpm_settles_on_floor():
    sim = MpmSim("mpm_sphere", density=60.0)   # light seeding for CI speed
    for _ in range(80):
        m = sim.step()
    pos = np.asarray(sim.state.pos)
    # the ball fell from y=-10 (v0=-50) and rests near the floor (wall -13)
    assert np.median(pos[:, 1]) < -10.0
    assert (pos[:, 1] >= -13.5).all()
    assert np.isfinite(float(m["kinetic_energy"]))


def test_projection_quality_all_flip_scenes():
    # every (shrunken) FLIP scene converges the outer loop to tolerance
    # (side_fluid's reference geometry needs bound > 40, too slow for CI)
    for name in ("pea_fluid", "stable_fluid"):
        sc = get_scene(name, bound=14)
        sim = FlipSim(sc)
        for _ in range(3):
            m = sim.step()
            assert float(m["error"]) <= sim.params.outer_tol + 1e-5, name
