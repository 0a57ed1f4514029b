"""End-to-end FLIP step tests on a small water-cube scene."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.models.flip import FlipSim, FlipParams
from fluidsim_tpu.scenes import get_scene


def _small_sim(frames=0, bound=12, density=4.0):
    scene = get_scene("water_cube_drop", bound=bound, density=density)
    sim = FlipSim(scene)
    for _ in range(frames):
        sim.step()
    return sim


def test_seeding_counts_and_bounds():
    sim = _small_sim()
    assert sim.num_particles > 0
    pos = np.asarray(sim.state.pos)
    assert (np.abs(pos) < sim.params.bound - 2).all()


def test_steps_stay_finite_and_bounded():
    sim = _small_sim()
    for _ in range(10):
        m = sim.step()
        assert np.isfinite(float(m["kinetic_energy"]))
        assert 0 < float(m["dt"]) <= sim.params.max_dt + 1e-6
    pos = np.asarray(sim.state.pos)
    assert np.isfinite(pos).all()
    # particles may momentarily poke into wall cells but not leave the box
    assert (np.abs(pos) <= sim.params.bound + 1).all()


def test_free_fall_gains_kinetic_energy():
    # The cube starts at rest well above the floor: gravity enters through the
    # projection's velUpdate (fluid.cc:638-641), so KE must grow initially.
    sim = _small_sim()
    m1 = sim.step()
    m3 = None
    for _ in range(3):
        m3 = sim.step()
    assert float(m3["kinetic_energy"]) > float(m1["kinetic_energy"]) > 0


def test_projection_error_below_tolerance():
    sim = _small_sim()
    for _ in range(5):
        m = sim.step()
        assert float(m["error"]) <= sim.params.outer_tol + 1e-5


def test_free_fall_velocity_matches_gravity():
    # Gravity enters via velUpdate once per *outer projection pass*
    # (fluid.cc:638-641,1475) — the reference's quirk, reproduced here.  So the
    # expected vertical velocity is -g * sum(dt_frame * n_outer_passes).
    sim = _small_sim()
    impulse = 0.0
    for _ in range(3):
        m = sim.step()
        # the dt used inside the projection is the *previous* frame's dt; the
        # first frame uses max_dt. Reconstruct: dt_used is dt before update.
        impulse += float(m["outer_iters"]) * float(m["dt_used"])
    vy = np.asarray(sim.state.vel)[:, 1]
    med = np.median(vy)
    assert med < 0
    np.testing.assert_allclose(med, -10.0 * impulse, rtol=0.3)


def test_pic_mode_runs():
    scene = get_scene("water_cube_drop", bound=10, density=3.0)
    sim = FlipSim(scene, params=FlipParams(bound=10, wall=8, mode="pic"))
    m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))


def test_occupancy_tracks_cube():
    sim = _small_sim()
    m = sim.step()
    occ = np.asarray(m["occupancy"])
    # occupancy concentrated where the cube is (centre of the grid)
    b = sim.params.bound
    cube = occ[b - 4:b + 5, b - 4:b + 5, b - 4:b + 5]
    assert cube.sum() > 0.5 * occ.sum() * (cube.size / occ.size) * 5


def test_analytic_wall_bounce_matches_grid_probe():
    """The walls-only analytic solid probe must reproduce the grid-gather
    probe exactly, including particles that step outside the box (where the
    OpenVDB background read is False — not solid)."""
    from fluidsim_tpu.models.flip import advect_bounce

    scene = get_scene("water_cube_drop", bound=12, density=4.0)
    solid = jnp.asarray(scene.solid)
    rng = np.random.default_rng(3)
    p = 4096
    # positions spanning inside, near-wall, and outside-the-box
    pos = jnp.asarray(rng.uniform(-15, 15, size=(p, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 30, size=(p, 3)).astype(np.float32))
    for rounding in ("round", "out"):
        for e in (0.0, 0.5):
            pg, vg = advect_bounce(pos, vel, 0.1, solid, 12, e, rounding)
            pa, va = advect_bounce(pos, vel, 0.1, solid, 12, e, rounding,
                                   analytic_wall=scene.spec.wall)
            np.testing.assert_array_equal(np.asarray(pg), np.asarray(pa))
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(va))


def test_walls_only_autodetect():
    """FlipSim flips walls_only_solid on for pure-wall scenes and leaves it
    off when obstacles are present."""
    assert FlipSim(get_scene("water_cube_drop", bound=12,
                             density=2.0)).params.walls_only_solid
    assert not FlipSim(get_scene("two_blocks")).params.walls_only_solid


def test_scan_steps_match_per_step():
    """steps(k) (lax.scan, one dispatch) must be bit-identical to k calls
    of step(); run(chunk=) must handle a partial tail chunk."""
    a = FlipSim(get_scene("water_cube_drop", bound=10, density=3.0))
    b = FlipSim(get_scene("water_cube_drop", bound=10, density=3.0))
    c = FlipSim(get_scene("water_cube_drop", bound=10, density=3.0))
    for _ in range(5):
        ma = a.step()
    mb = b.steps(5)
    # scan vs per-step are separately-compiled programs; XLA may fuse f32
    # reductions differently, so assert tight tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(a.state.pos),
                               np.asarray(b.state.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.state.vel),
                               np.asarray(b.state.vel), atol=1e-4)
    np.testing.assert_allclose(float(ma["kinetic_energy"]),
                               float(mb["kinetic_energy"][-1]), rtol=1e-4)
    assert mb["kinetic_energy"].shape == (5,)
    assert "occupancy" not in mb

    c.run(5, chunk=3)        # 3 + tail 2
    np.testing.assert_allclose(np.asarray(c.state.pos),
                               np.asarray(b.state.pos), atol=1e-5)


def test_mpm_scan_steps_match_per_step():
    """Scan vs per-step: XLA compiles the two programs separately and may
    fuse f32 reductions differently, so the oracle is tight-tolerance
    equivalence, not bit equality (measured drift ~2e-6 after 4 frames)."""
    from fluidsim_tpu.models.mpm import MpmSim

    m1 = MpmSim("mpm_cone", density=40.0)
    m2 = MpmSim("mpm_cone", density=40.0)
    for _ in range(4):
        a = m1.step()
    b = m2.steps(4)
    np.testing.assert_allclose(np.asarray(m1.state.pos),
                               np.asarray(m2.state.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1.state.FE),
                               np.asarray(m2.state.FE), atol=1e-5)
    np.testing.assert_allclose(float(a["kinetic_energy"]),
                               float(b["kinetic_energy"][-1]), rtol=1e-4)
