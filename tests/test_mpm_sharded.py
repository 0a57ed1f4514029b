"""Sharded MPM vs single-chip equivalence on the virtual CPU mesh."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from fluidsim_tpu.models.mpm import MpmSim
from fluidsim_tpu.parallel.mpm_sharded import ShardedMpmSim
from fluidsim_tpu.scenes import get_scene


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("x",))


def test_sharded_mpm_matches_single_chip():
    scene = get_scene("mpm_cone")
    single = MpmSim(scene)
    sharded = ShardedMpmSim(scene, mesh=_mesh(4))
    assert sharded.num_particles == single.num_particles

    for i in range(5):
        ms = single.step()
        mp = sharded.step()
        np.testing.assert_allclose(float(mp["kinetic_energy"]),
                                   float(ms["kinetic_energy"]), rtol=3e-3)
        np.testing.assert_allclose(float(mp["dt"]), float(ms["dt"]), rtol=1e-3)
        assert int(mp["num_active_cells"]) == int(ms["num_active_cells"])
        assert int(mp["lost"]) == 0

    # deformation state stays sane across shards
    alive = np.asarray(sharded.state.alive)
    fe = np.asarray(sharded.state.FE)[alive]
    assert np.isfinite(fe).all()
    det = np.linalg.det(fe)
    assert (det > 0.5).all() and (det < 2.0).all()


def test_sharded_mpm_conserves_particles():
    scene = get_scene("mpm_cone")
    sim = ShardedMpmSim(scene, mesh=_mesh(8))
    n0 = sim.num_particles
    for _ in range(8):
        m = sim.step()
        assert int(m["lost"]) == 0
        assert int(m["num_alive"]) == n0
    assert np.isfinite(float(m["kinetic_energy"]))


def test_sharded_mpm_pallas_matches_single_chip():
    """The Pallas slab-kernel MPM path (interpret mode on the CPU mesh)
    must reproduce the single-chip step like the XLA slab path does."""
    from fluidsim_tpu.models.mpm import MpmParams

    scene = get_scene("mpm_cone", density=100.0)
    single = MpmSim(scene)
    params = MpmParams(pallas_transfer=True, pallas_interpret=True)
    sharded = ShardedMpmSim(scene, params=params, mesh=_mesh(4))
    assert sharded.params.pallas_transfer
    assert sharded.num_particles == single.num_particles

    for i in range(3):
        ms = single.step()
        mp_ = sharded.step()
        np.testing.assert_allclose(float(mp_["kinetic_energy"]),
                                   float(ms["kinetic_energy"]), rtol=3e-3)
        np.testing.assert_allclose(float(mp_["dt"]), float(ms["dt"]),
                                   rtol=1e-3)
        assert int(mp_["num_active_cells"]) == int(ms["num_active_cells"])
        assert int(mp_["lost"]) == 0

    alive = np.asarray(sharded.state.alive)
    fe = np.asarray(sharded.state.FE)[alive]
    assert np.isfinite(fe).all()
    pos_s = np.asarray(single.state.pos)
    pos_p = np.asarray(sharded.state.pos)[alive]
    assert pos_p.shape == pos_s.shape
    np.testing.assert_allclose(pos_p[np.lexsort(pos_p.T)],
                               pos_s[np.lexsort(pos_s.T)], atol=5e-3)
