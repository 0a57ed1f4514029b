"""Level-set tools and semi-Lagrangian advection tests (analytic oracles,
mirroring the intent of the reference's TestLevelSet*/TestVolumeAdvect
suites)."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.levelset import (
    sphere_sdf, box_sdf, csg_union, csg_intersection, csg_difference, offset,
    particles_to_levelset, sdf_to_fog, levelset_volume)
from fluidsim_tpu.ops.advect_volume import (sample_trilinear, advect_points,
                                            advect_volume)


def test_sphere_sdf_values():
    s = sphere_sdf(None, 16, (0.0, 0.0, 0.0), 5.0)
    assert np.isclose(float(s[16, 16, 16]), -5.0)        # centre
    assert np.isclose(float(s[16 + 5, 16, 16]), 0.0)     # on the surface
    assert np.isclose(float(s[16, 16 + 8, 16]), 3.0)     # outside


def test_box_sdf_and_csg():
    b = box_sdf(None, 16, (-3, -3, -3), (3, 3, 3))
    assert float(b[16, 16, 16]) < 0
    assert np.isclose(float(b[16 + 3, 16, 16]), 0.0, atol=1e-5)
    s = sphere_sdf(None, 16, (0.0, 0.0, 0.0), 2.0)
    u = csg_union(b, s)
    assert float(u[16, 16, 16]) == min(float(b[16, 16, 16]), float(s[16, 16, 16]))
    i = csg_intersection(b, s)
    assert (np.asarray(i) >= np.asarray(s) - 1e-6).all()
    d = csg_difference(b, s)
    assert float(d[16, 16, 16]) > 0                       # centre carved out
    off = offset(s, 1.0)
    assert np.isclose(float(off[16 + 3, 16, 16]), 0.0)    # radius grew to 3


def test_particles_to_levelset_sphere_cloud():
    # particles on a radius-4 sphere surface -> SDF zero near radius 4(+r)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(3000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = jnp.asarray(4.0 * d, jnp.float32)
    sdf = particles_to_levelset(pos, bound=12, radius=1.0)
    s = np.asarray(sdf)
    assert s[12, 12, 12] > 0                 # hollow centre (no particles)
    # near-surface cells are inside the union of spheres
    assert s[12 + 4, 12, 12] < 0.4
    fog = np.asarray(sdf_to_fog(sdf))
    assert fog.max() <= 1.0 and fog.min() >= 0.0
    assert fog[12 + 4, 12, 12] > 0


def test_levelset_volume_sphere():
    s = sphere_sdf(None, 20, (0.0, 0.0, 0.0), 8.0)
    v = float(levelset_volume(s))
    exact = 4 / 3 * np.pi * 8 ** 3
    assert abs(v - exact) / exact < 0.05


def test_sample_trilinear_linear_field_exact():
    bound = 8
    c = np.arange(-bound, bound + 1, dtype=np.float32)
    f = (2 * c[:, None, None] + 3 * c[None, :, None] - c[None, None, :])
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-6, 6, size=(50, 3)), jnp.float32)
    got = sample_trilinear(jnp.asarray(f, jnp.float32), pos, bound)
    want = 2 * pos[:, 0] + 3 * pos[:, 1] - pos[:, 2]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_advect_points_uniform_flow():
    bound = 8
    n = 2 * bound + 1
    vc = jnp.broadcast_to(jnp.asarray([1.0, 0.0, -0.5], jnp.float32),
                          (n, n, n, 3))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.0, -1.0, 3.0]], jnp.float32)
    out = advect_points(pos, vc, 2.0, bound, order=3)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(pos) + [2.0, 0.0, -1.0], atol=1e-5)


def test_advect_volume_translates_blob():
    bound = 10
    n = 2 * bound + 1
    f = np.zeros((n, n, n), np.float32)
    f[10, 10, 10] = 1.0   # blob at coord (0,0,0)
    vc = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                          (n, n, n, 3))
    out = np.asarray(advect_volume(jnp.asarray(f), vc, 2.0, bound))
    # mass moved +2 cells in x
    assert out[12, 10, 10] > 0.9
    assert out[10, 10, 10] < 0.1


def test_sample_quadratic_reproduces_quadratic_field():
    # triquadratic interpolation (tools::QuadraticSampler,
    # Interpolation.h:802-846) is exact on per-axis quadratic polynomials
    from fluidsim_tpu.ops.advect_volume import sample_quadratic
    bound = 8
    c = np.arange(-bound, bound + 1, dtype=np.float32)
    f = (0.5 * c[:, None, None] ** 2 - c[None, :, None] ** 2
         + 2.0 * c[None, None, :] ** 2 + 3.0 * c[:, None, None]
         - c[None, None, :] + 1.0)
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(-6, 6, size=(64, 3)), jnp.float32)
    got = sample_quadratic(jnp.asarray(f, jnp.float32), pos, bound)
    p = np.asarray(pos, np.float64)
    want = (0.5 * p[:, 0] ** 2 - p[:, 1] ** 2 + 2.0 * p[:, 2] ** 2
            + 3.0 * p[:, 0] - p[:, 2] + 1.0)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-4, atol=2e-3)


def test_sample_nearest_rounds():
    from fluidsim_tpu.ops.advect_volume import sample_nearest
    bound = 4
    n = 2 * bound + 1
    c = np.arange(-bound, bound + 1, dtype=np.float32)
    f = (c[:, None, None] * 100 + c[None, :, None] * 10 + c[None, None, :])
    pos = jnp.asarray([[0.4, -1.6, 2.2], [-0.5, 0.49, -0.51]], jnp.float32)
    got = np.asarray(sample_nearest(jnp.asarray(f), pos, bound))
    # rounds each coordinate to the nearest voxel; ties round
    # half-away-from-zero in index space, matching the reference's
    # roundVec3 (::round): 0.5 -> 1 but -1.5 -> -2
    assert got[0] == 0 * 100 + (-2) * 10 + 2
    assert got[1] == (-1) * 100 + 0 * 10 + (-1)   # -0.5 -> -1 (not 0)
    # explicit tie cases where jnp.round's half-to-even would differ
    ties = jnp.asarray([[0.5, -1.5, 2.5]], jnp.float32)
    got_t = np.asarray(sample_nearest(jnp.asarray(f), ties, bound))
    assert got_t[0] == 1 * 100 + (-2) * 10 + 3


def test_sample_staggered_offsets_each_component():
    # component d of a staggered vector grid lives at +0.5*e_d: sampling
    # a linear per-component field at pos must return field(pos + 0.5 e_d)
    from fluidsim_tpu.ops.advect_volume import sample_staggered
    bound = 8
    c = np.arange(-bound, bound + 1, dtype=np.float32)
    X = np.broadcast_to(c[:, None, None], (17, 17, 17))
    Y = np.broadcast_to(c[None, :, None], (17, 17, 17))
    Z = np.broadcast_to(c[None, None, :], (17, 17, 17))
    field = jnp.asarray(np.stack([2 * X, 3 * Y, -Z], axis=-1), jnp.float32)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(-6, 6, size=(32, 3)), jnp.float32)
    for order in (1, 2):
        got = np.asarray(sample_staggered(field, pos, bound, order=order))
        p = np.asarray(pos)
        np.testing.assert_allclose(got[:, 0], 2 * (p[:, 0] + 0.5),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[:, 1], 3 * (p[:, 1] + 0.5),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[:, 2], -(p[:, 2] + 0.5),
                                   rtol=1e-4, atol=1e-3)
