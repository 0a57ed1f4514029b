"""Fused MPM transfers vs the naive path: step-level equivalence."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.models.mpm import MpmSim, MpmParams
from fluidsim_tpu.scenes import get_scene


def test_mpm_fast_matches_naive():
    scene = get_scene("mpm_cone")
    fast = MpmSim(scene, params=MpmParams(fast_transfer=True))
    naive = MpmSim(scene, params=MpmParams(fast_transfer=False))
    assert fast.num_particles == naive.num_particles
    for i in range(5):
        mf = fast.step()
        mn = naive.step()
        np.testing.assert_allclose(float(mf["kinetic_energy"]),
                                   float(mn["kinetic_energy"]), rtol=3e-3)
        np.testing.assert_allclose(float(mf["dt"]), float(mn["dt"]), rtol=1e-3)
        assert int(mf["num_active_cells"]) == int(mn["num_active_cells"])
    # particle sets coincide (fast path re-sorts each frame)
    pf = np.asarray(fast.state.pos)
    pn = np.asarray(naive.state.pos)
    np.testing.assert_allclose(pf[np.lexsort(pf.T)], pn[np.lexsort(pn.T)],
                               atol=5e-3)
    # deformation state statistics match
    np.testing.assert_allclose(float(jnp.mean(fast.state.FE)),
                               float(jnp.mean(naive.state.FE)), rtol=1e-3)
    vol_f = np.sort(np.asarray(fast.state.volume))
    vol_n = np.sort(np.asarray(naive.state.volume))
    np.testing.assert_allclose(vol_f, vol_n, rtol=1e-3)


def test_mpm_fast_runs_longer():
    sim = MpmSim("mpm_sphere", density=60.0,
                 params=MpmParams(fast_transfer=True))
    for _ in range(30):
        m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))
    assert float(m["min_det_fp"]) > 0.3
