"""P2G/G2P transfer tests: conservation, consistency, reference masks."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.core.gridspec import GridSpec, cell_center_velocity
from fluidsim_tpu.ops import transfer


def _setup(bound=8, n_particles=200, seed=0):
    spec = GridSpec(bound=bound, wall=bound - 2)
    solid = jnp.asarray(spec.wall_mask())
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-bound + 3, bound - 3, size=(n_particles, 3)),
                      jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n_particles, 3)), jnp.float32)
    return spec, solid, pos, vel


def test_p2g_momentum_conservation():
    # Total scattered momentum equals sum of w_total(p) * v_p; with interior
    # particles, each particle's weight total is the full kernel sum.
    spec, solid, pos, vel = _setup()
    weights, mom = transfer.p2g_velocity(pos, vel, solid, spec.bound)
    cells, inb = transfer.particle_stencil(pos, spec.bound)
    w = transfer.stencil_weights(pos, cells, "flip")
    wsum = jnp.sum(w, axis=1)
    np.testing.assert_allclose(float(jnp.sum(weights)), float(jnp.sum(wsum)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(mom, axis=(0, 1, 2))),
                               np.asarray(jnp.sum(wsum[:, None] * vel, axis=0)),
                               rtol=1e-4)


def test_p2g_respects_solid_and_inner_bound():
    spec, solid, _, _ = _setup()
    # particle near the wall: nothing lands on solid or beyond bound-2.
    pos = jnp.asarray([[spec.wall - 1.4, 0.0, 0.0]], jnp.float32)
    vel = jnp.ones((1, 3), jnp.float32)
    weights, _ = transfer.p2g_velocity(pos, vel, solid, spec.bound)
    wn = np.asarray(weights)
    solid_np = np.asarray(solid)
    assert (wn[solid_np] == 0).all()
    c = np.abs(spec.coords())
    outer = (c[:, None, None] > spec.bound - 2) | (c[None, :, None] > spec.bound - 2) \
        | (c[None, None, :] > spec.bound - 2)
    assert (wn[outer] == 0).all()
    assert wn.sum() > 0


def test_g2p_constant_field_recovery():
    # If the grid velocity is constant, the normalised gather returns it
    # exactly (weights cancel).
    spec, solid, pos, _ = _setup()
    n = spec.n
    vconst = jnp.broadcast_to(jnp.asarray([1.0, -2.0, 3.0], jnp.float32),
                              (n, n, n, 3))
    got = transfer.g2p_gather(pos, vconst, spec.bound, spec.wall)
    np.testing.assert_allclose(np.asarray(got),
                               np.broadcast_to([1.0, -2.0, 3.0], got.shape),
                               rtol=1e-5)


def test_flip_delta_zero_when_grids_equal():
    spec, solid, pos, vel = _setup()
    weights, mom = transfer.p2g_velocity(pos, vel, solid, spec.bound)
    velg = transfer.normalize_velocity(weights, mom)
    vc = cell_center_velocity(velg)
    delta = transfer.g2p_flip_delta(pos, vc, vc, spec.bound, spec.wall)
    np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-6)


def test_flip_delta_constant_shift():
    # vc_new = vc_old + u everywhere -> delta == u for every particle.
    spec, solid, pos, vel = _setup()
    weights, mom = transfer.p2g_velocity(pos, vel, solid, spec.bound)
    velg = transfer.normalize_velocity(weights, mom)
    vc = cell_center_velocity(velg)
    u = jnp.asarray([0.5, -1.0, 2.0], jnp.float32)
    delta = transfer.g2p_flip_delta(pos, vc + u, vc, spec.bound, spec.wall)
    np.testing.assert_allclose(np.asarray(delta),
                               np.broadcast_to(np.asarray(u), delta.shape),
                               atol=1e-4)


def test_normalize_velocity_leaves_empty_cells():
    w = jnp.asarray([[[0.0, 2.0]]])
    mom = jnp.asarray([[[[1.0, 1.0, 1.0], [4.0, 2.0, 0.0]]]])
    out = transfer.normalize_velocity(w, mom)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(out[0, 0, 1]), [2, 1, 0])


def test_mass_p2g_positive_total():
    spec, solid, pos, _ = _setup()
    mass = transfer.p2g_mass(pos, solid, spec.bound)
    assert float(jnp.sum(mass)) > 0
    assert (np.asarray(mass)[np.asarray(solid)] == 0).all()
