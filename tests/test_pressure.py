"""Pressure projection tests, mirroring the intent of the reference suite's
``TestPoissonSolver.cc:53-66`` (solve, boundary conditions) plus the
workload-level oracles the reference lacks (post-projection divergence)."""

import numpy as np
import jax
import jax.numpy as jnp

from fluidsim_tpu.core.gridspec import GridSpec
from fluidsim_tpu.ops import pressure as pr
from fluidsim_tpu.ops.pcg import pcg, jacobi_preconditioner
from fluidsim_tpu.models.flip import FlipParams, project


def _masks(bound=8):
    spec = GridSpec(bound=bound, wall=bound - 2)
    solid = jnp.asarray(spec.wall_mask())
    c = spec.coords()
    inner = spec.within_mask(bound - 3)
    fluid = jnp.asarray(inner) & ~solid
    return spec, solid, fluid


def test_laplacian_diag_counts_nonsolid_neighbours():
    spec, solid, fluid = _masks()
    dt, rho, dx = 0.1, 1.0, 1.0
    adiag = pr.laplacian_diag(fluid, solid, dt, rho, dx)
    a = np.asarray(adiag)
    scale = dt / (rho * dx * dx)
    # deep interior cell: 6 non-solid neighbours
    i = spec.bound
    assert np.isclose(a[i, i, i], 6 * scale)
    # fluid cell adjacent to the wall (|c| = bound-3 next to ... still interior
    # here); check a cell whose neighbour is solid:
    j = 2 * spec.bound - 2  # coord bound-2 = wall -> its +x neighbour solid
    # that cell is outside the fluid mask here, so check non-fluid is 0:
    assert (a[np.asarray(~fluid)] == 0).all()


def test_apply_laplacian_symmetric():
    spec, solid, fluid = _masks()
    dt, rho, dx = 0.1, 1.0, 1.0
    adiag = pr.laplacian_diag(fluid, solid, dt, rho, dx)
    rng = np.random.default_rng(0)
    x = jnp.where(fluid, jnp.asarray(rng.normal(size=spec.shape), jnp.float32), 0)
    y = jnp.where(fluid, jnp.asarray(rng.normal(size=spec.shape), jnp.float32), 0)
    ax = pr.apply_laplacian(x, adiag, fluid, dt, rho, dx)
    ay = pr.apply_laplacian(y, adiag, fluid, dt, rho, dx)
    np.testing.assert_allclose(float(jnp.sum(ax * y)), float(jnp.sum(ay * x)),
                               rtol=1e-4)


def test_apply_laplacian_positive_semidefinite_samples():
    spec, solid, fluid = _masks()
    dt, rho, dx = 0.1, 1.0, 1.0
    adiag = pr.laplacian_diag(fluid, solid, dt, rho, dx)
    rng = np.random.default_rng(1)
    for _ in range(5):
        x = jnp.where(fluid, jnp.asarray(rng.normal(size=spec.shape), jnp.float32), 0)
        ax = pr.apply_laplacian(x, adiag, fluid, dt, rho, dx)
        assert float(jnp.sum(x * ax)) >= -1e-3


def test_pcg_solves_stencil_system():
    spec, solid, fluid = _masks()
    dt, rho, dx = 0.1, 1.0, 1.0
    adiag = pr.laplacian_diag(fluid, solid, dt, rho, dx)
    apply_a = lambda p: pr.apply_laplacian(p, adiag, fluid, dt, rho, dx)
    rng = np.random.default_rng(2)
    x_true = jnp.where(fluid, jnp.asarray(rng.normal(size=spec.shape), jnp.float32), 0)
    b = apply_a(x_true)
    res = pcg(apply_a, b, precond=jacobi_preconditioner(adiag, mask=fluid),
              rtol=1e-6, maxiter=500)
    r = b - apply_a(res.x)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-5
    assert int(res.iters) < 500


def test_pcg_zero_rhs():
    spec, solid, fluid = _masks()
    adiag = pr.laplacian_diag(fluid, solid, 0.1, 1.0, 1.0)
    apply_a = lambda p: pr.apply_laplacian(p, adiag, fluid, 0.1, 1.0, 1.0)
    res = pcg(apply_a, jnp.zeros(spec.shape, jnp.float32))
    assert int(res.iters) == 0
    assert float(jnp.max(jnp.abs(res.x))) == 0.0


def test_projection_reduces_divergence():
    # Build a divergent velocity field on a fluid blob and check the outer
    # loop drives the relative error below the reference tolerance (0.1).
    spec, solid, fluid = _masks(bound=8)
    rng = np.random.default_rng(3)
    vel = jnp.asarray(rng.normal(scale=1.0, size=spec.shape + (3,)), jnp.float32)
    params = FlipParams(bound=spec.bound, wall=spec.wall)
    dt = jnp.asarray(0.1, jnp.float32)
    velg, err, n_outer, cg_iters, div_rms, _p = jax.jit(
        lambda v: project(params, v, fluid, solid, dt))(vel)
    assert float(err) <= params.outer_tol + 1e-6
    assert int(n_outer) >= 1
    assert not np.any(np.isnan(np.asarray(velg)))


def test_velupdate_solid_faces_zeroed():
    spec, solid, fluid = _masks()
    rng = np.random.default_rng(4)
    vel = jnp.asarray(rng.normal(size=spec.shape + (3,)), jnp.float32)
    p = jnp.asarray(rng.normal(size=spec.shape), jnp.float32)
    g = jnp.asarray([0.0, -10.0, 0.0], jnp.float32)
    out = pr.vel_update(vel, p, fluid, solid, g, 0.1, 1.0, 1.0)
    o = np.asarray(out)
    s = np.asarray(solid)
    for d in range(3):
        sm = np.zeros_like(s)
        idx = [slice(None)] * 3
        idx[d] = slice(1, None)
        src = [slice(None)] * 3
        src[d] = slice(0, -1)
        sm[tuple(idx)] = s[tuple(src)]
        blocked = s | sm
        assert (o[..., d][blocked] == 0).all()
