"""Grid operator oracles — analytic fields checked against exact
derivatives, mirroring the intent of the reference's TestGradient /
TestDivergence / TestCurl / TestLaplacian / TestCpt CppUnit suites
(openvdb/unittest/)."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.gridops import (
    gradient, divergence, curl, laplacian, mean_curvature, magnitude,
    normalize, closest_point_transform)
from fluidsim_tpu.ops.levelset import sphere_sdf

B = 10
N = 2 * B + 1


def _coords():
    c = np.arange(-B, B + 1, dtype=np.float64)
    return np.meshgrid(c, c, c, indexing="ij")


def _interior(a, m=2):
    return np.asarray(a)[m:-m, m:-m, m:-m]


def test_gradient_quadratic():
    x, y, z = _coords()
    f = jnp.asarray(x * x + 2 * y * y + 3 * z * z, jnp.float32)
    g = np.asarray(gradient(f))
    assert np.allclose(_interior(g[..., 0]), _interior(2 * x), atol=1e-3)
    assert np.allclose(_interior(g[..., 1]), _interior(4 * y), atol=1e-3)
    assert np.allclose(_interior(g[..., 2]), _interior(6 * z), atol=1e-3)


def test_gradient_dx_scaling():
    x, _, _ = _coords()
    f = jnp.asarray(x, jnp.float32)
    g = np.asarray(gradient(f, dx=0.5))
    assert np.allclose(_interior(g[..., 0]), 2.0, atol=1e-4)


def test_divergence_linear_field():
    x, y, z = _coords()
    v = jnp.asarray(np.stack([x, y, z], axis=-1), jnp.float32)
    d = np.asarray(divergence(v))
    assert np.allclose(_interior(d), 3.0, atol=1e-3)


def test_divergence_solenoidal():
    x, y, _ = _coords()
    v = jnp.asarray(np.stack([-y, x, np.zeros_like(x)], -1), jnp.float32)
    d = np.asarray(divergence(v))
    assert np.allclose(_interior(d), 0.0, atol=1e-3)


def test_curl_rotation_field():
    x, y, _ = _coords()
    v = jnp.asarray(np.stack([-y, x, np.zeros_like(x)], -1), jnp.float32)
    c = np.asarray(curl(v))
    assert np.allclose(_interior(c[..., 0]), 0.0, atol=1e-3)
    assert np.allclose(_interior(c[..., 1]), 0.0, atol=1e-3)
    assert np.allclose(_interior(c[..., 2]), 2.0, atol=1e-3)


def test_curl_of_gradient_vanishes():
    x, y, z = _coords()
    f = jnp.asarray(x * x * y + z * y * y, jnp.float32)
    c = np.asarray(curl(gradient(f)))
    assert np.allclose(_interior(c), 0.0, atol=1e-2)


def test_laplacian_quadratic():
    x, y, z = _coords()
    f = jnp.asarray(x * x + y * y + z * z, jnp.float32)
    l = np.asarray(laplacian(f))
    assert np.allclose(_interior(l), 6.0, atol=1e-3)
    l2 = np.asarray(laplacian(f, dx=2.0))
    assert np.allclose(_interior(l2), 1.5, atol=1e-3)


def test_magnitude_and_normalize():
    v = jnp.zeros((N, N, N, 3), jnp.float32).at[..., 0].set(3.0).at[..., 1].set(4.0)
    m = np.asarray(magnitude(v))
    assert np.allclose(m, 5.0)
    n = np.asarray(normalize(v))
    assert np.allclose(n[..., 0], 0.6, atol=1e-6)
    z = np.asarray(normalize(jnp.zeros((4, 4, 4, 3))))
    assert np.allclose(z, 0.0)


def test_mean_curvature_sphere():
    # OpenVDB convention: meanCurvature of a radius-r sphere SDF = 1/r
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    k = np.asarray(mean_curvature(s))
    # check on a shell near the surface, away from the center singularity
    x, y, z = _coords()
    r = np.sqrt(x * x + y * y + z * z)
    shell = (r > 4.5) & (r < 7.5)
    assert np.allclose(k[shell], 1.0 / r[shell], rtol=0.15)


def test_closest_point_transform_sphere():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    cpt = np.asarray(closest_point_transform(s, B))
    x, y, z = _coords()
    r = np.sqrt(x * x + y * y + z * z)
    shell = (r > 2.5) & (r < 8.0)
    # closest points of an origin-centred sphere lie at radius 5
    d = np.linalg.norm(cpt, axis=-1)
    assert np.allclose(d[shell], 5.0, atol=0.15)
    # and in the direction of the query point
    dirs = cpt / np.maximum(d, 1e-9)[..., None]
    qdir = np.stack([x, y, z], -1) / np.maximum(r, 1e-9)[..., None]
    dot = np.sum(dirs * qdir, axis=-1)
    assert np.all(dot[shell] > 0.99)
