"""Chunked fused transfers vs the one-shot fused path."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.core.gridspec import GridSpec, cell_center_velocity
from fluidsim_tpu.ops import transfer, transfer_fast as tf
from fluidsim_tpu.ops import transfer_chunked as tc


def _setup(bound=10, n_particles=800, seed=0):
    spec = GridSpec(bound=bound, wall=bound - 2)
    solid = jnp.asarray(spec.wall_mask())
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-bound + 2.2, bound - 2.2,
                                  size=(n_particles, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n_particles, 3)), jnp.float32)
    return spec, solid, pos, vel


def test_p2g_chunked_matches_fused():
    spec, solid, pos, vel = _setup()
    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, spec.bound)
    w_ref, mom_ref, occ_ref = tf.p2g_fused(pos_s, vel_s, flat, solid,
                                           spec.bound)
    for n_chunks in (2, 4, 7):
        w, mom, occ, ovf = tc.p2g_fused_chunked(pos_s, vel_s, flat, solid,
                                                spec.bound, n_chunks=n_chunks)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mom), np.asarray(mom_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(occ), np.asarray(occ_ref),
                                   rtol=1e-4, atol=1e-5)


def test_g2p_chunked_matches_fused():
    spec, solid, pos, vel = _setup(seed=1)
    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, spec.bound)
    w, mom, occ = tf.p2g_fused(pos_s, vel_s, flat, solid, spec.bound)
    velg = transfer.normalize_velocity(w, mom)
    vc = cell_center_velocity(velg)
    ref = tf.g2p_fused(pos_s, flat, vc, spec.bound, spec.wall)
    for n_chunks in (3, 5):
        got, ovf = tc.g2p_fused_chunked(pos_s, flat, vc, spec.bound,
                                        spec.wall, n_chunks=n_chunks)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-5)


def test_chunked_overflow_reported():
    # cram all particles into one slab with a tiny capacity factor
    spec, solid, pos, vel = _setup()
    pos = pos.at[:, 0].set(0.0)        # everyone in the middle slab
    pos_s, vel_s, flat = tf.sort_by_cell(pos, vel, spec.bound)
    _, _, _, ovf = tc.p2g_fused_chunked(pos_s, vel_s, flat, solid, spec.bound,
                                        n_chunks=7, chunk_factor=0.2)
    assert int(ovf) > 0


import pytest


@pytest.mark.parametrize("mode", ["flip", "pic"])
def test_full_step_chunked_matches_fused(mode):
    from fluidsim_tpu.models.flip import FlipSim, FlipParams
    from fluidsim_tpu.scenes import get_scene
    scene = get_scene("water_cube_drop", bound=12, density=3.0)
    a = FlipSim(scene, params=FlipParams(bound=12, wall=10, mode=mode,
                                         transfer_chunks=3))
    b = FlipSim(scene, params=FlipParams(bound=12, wall=10, mode=mode))
    for _ in range(4):
        ma = a.step()
        mb = b.step()
        assert int(ma["transfer_overflow"]) == 0
        np.testing.assert_allclose(float(ma["kinetic_energy"]),
                                   float(mb["kinetic_energy"]), rtol=2e-3)
        assert int(ma["num_fluid_cells"]) == int(mb["num_fluid_cells"])


def test_apic_chunks_rejected():
    import pytest as _pytest
    from fluidsim_tpu.models.flip import FlipSim, FlipParams
    from fluidsim_tpu.scenes import get_scene
    scene = get_scene("water_cube_drop", bound=10, density=2.0)
    with _pytest.raises(NotImplementedError):
        FlipSim(scene, params=FlipParams(bound=10, wall=8, mode="apic",
                                         transfer_chunks=2))
