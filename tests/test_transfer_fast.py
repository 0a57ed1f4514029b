"""Fast (sorted channel-fused) transfers vs the naive reference formulation —
they must agree to f32 reduction tolerance."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.core.gridspec import GridSpec, cell_center_velocity
from fluidsim_tpu.ops import transfer, transfer_fast as tf
from fluidsim_tpu.models.flip import FlipSim, FlipParams
from fluidsim_tpu.scenes import get_scene


def _setup(bound=10, n_particles=500, seed=0):
    spec = GridSpec(bound=bound, wall=bound - 2)
    solid = jnp.asarray(spec.wall_mask())
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-bound + 2.2, bound - 2.2,
                                  size=(n_particles, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n_particles, 3)), jnp.float32)
    return spec, solid, pos, vel


def test_p2g_fused_matches_naive():
    spec, solid, pos, vel = _setup()
    B = spec.bound
    w_ref, mom_ref = transfer.p2g_velocity(pos, vel, solid, B)
    occ_ref = transfer.p2g_mass(pos, solid, B)
    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, B)
    w_f, mom_f, occ_f = tf.p2g_fused(pos_s, vel_s, flat, solid, B)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mom_f), np.asarray(mom_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(occ_f), np.asarray(occ_ref),
                               rtol=1e-4, atol=1e-5)


def test_g2p_fused_matches_naive():
    spec, solid, pos, vel = _setup(seed=1)
    B, wall = spec.bound, spec.wall
    w, mom = transfer.p2g_velocity(pos, vel, solid, B)
    velg = transfer.normalize_velocity(w, mom)
    vc = cell_center_velocity(velg)
    vc2 = vc * 1.7 + 0.3

    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, B)
    ref_delta = transfer.g2p_flip_delta(pos_s, vc2, vc, B, wall)
    fast_delta = tf.g2p_fused(pos_s, flat, vc2 - vc, B, wall)
    np.testing.assert_allclose(np.asarray(fast_delta), np.asarray(ref_delta),
                               rtol=1e-3, atol=1e-5)

    ref_pic = transfer.g2p_gather(pos_s, vc, B, wall)
    fast_pic = tf.g2p_fused(pos_s, flat, vc, B, wall)
    np.testing.assert_allclose(np.asarray(fast_pic), np.asarray(ref_pic),
                               rtol=1e-3, atol=1e-5)


def test_sentinel_particles_contribute_nothing():
    spec, solid, pos, vel = _setup(seed=2)
    B = spec.bound
    # park half the particles far outside (migration dead slots)
    pos = pos.at[::2].set(1.0e6)
    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, B)
    w_f, mom_f, occ_f = tf.p2g_fused(pos_s, vel_s, flat, solid, B)
    w_ref, mom_ref = transfer.p2g_velocity(pos, vel, solid, B)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_ref),
                               rtol=1e-4, atol=1e-5)
    delta = tf.g2p_fused(pos_s, flat, jnp.ones(spec.shape + (3,), jnp.float32),
                         B, spec.wall)
    dead = np.asarray(pos_s)[:, 0] > spec.bound
    assert (np.asarray(delta)[dead] == 0).all()


def test_full_step_fast_matches_naive():
    scene = get_scene("water_cube_drop", bound=12, density=3.0)
    fast = FlipSim(scene, params=FlipParams(bound=12, wall=10, fast_transfer=True))
    naive = FlipSim(scene, params=FlipParams(bound=12, wall=10, fast_transfer=False))
    for i in range(4):
        mf = fast.step()
        mn = naive.step()
        np.testing.assert_allclose(float(mf["kinetic_energy"]),
                                   float(mn["kinetic_energy"]), rtol=2e-3)
        np.testing.assert_allclose(float(mf["dt"]), float(mn["dt"]), rtol=1e-3)
        assert int(mf["num_fluid_cells"]) == int(mn["num_fluid_cells"])
    # particle sets coincide (fast path re-sorts each frame)
    pf = np.asarray(fast.state.pos)
    pn = np.asarray(naive.state.pos)
    np.testing.assert_allclose(pf[np.lexsort(pf.T)], pn[np.lexsort(pn.T)],
                               atol=5e-3)


def test_obstacle_scene_fast_matches_naive():
    scene = get_scene("two_blocks")
    # shrink: use small custom scene with an interior solid block
    import numpy as np
    from fluidsim_tpu.scenes import Scene, _box_mask
    from fluidsim_tpu.core.gridspec import GridSpec
    spec = GridSpec(bound=10, wall=8)
    solid = spec.wall_mask() | _box_mask(spec, (-2, -8, -2), (2, -4, 2))
    sc = Scene(name="t", kind="flip", spec=spec, solid=solid,
               normals=spec.wall_normals(),
               seed_mask=_box_mask(spec, (-3, 0, -3), (3, 6, 3)),
               density=3.0, gravity=(0.0, -10.0, 0.0))
    fast = FlipSim(sc, params=FlipParams(bound=10, wall=8, fast_transfer=True))
    naive = FlipSim(sc, params=FlipParams(bound=10, wall=8, fast_transfer=False))
    for _ in range(3):
        mf = fast.step()
        mn = naive.step()
        np.testing.assert_allclose(float(mf["kinetic_energy"]),
                                   float(mn["kinetic_energy"]), rtol=2e-3)
