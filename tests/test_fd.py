"""Tests for ops/fd.py — the ``math/FiniteDifference.h`` scheme family.

Oracles are analytic: observed convergence order on a smooth field for
every scheme, WENO non-oscillation across a kink, upwind bias selection,
Godunov norm sign conventions, and HJ advection against the exact
translated SDF (none of which the reference tests — its
FiniteDifference.h has no dedicated unit test)."""

import numpy as np
import pytest
import jax.numpy as jnp

from fluidsim_tpu.ops.fd import (
    DSCHEMES, d1, biased_gradient, godunov_norm_sqrd, advect_hj, tvd_rk,
    weno5)

# (scheme, formal order of accuracy). WENO5 is 5th-order in smooth
# regions but its observed order on coarse grids is conservative; we
# check >= 3.
ORDERS = [
    ("cd_2nd", 2), ("cd_4th", 4), ("cd_6th", 5),
    ("fd_1st", 1), ("fd_2nd", 2), ("fd_3rd", 3),
    ("bd_1st", 1), ("bd_2nd", 2), ("bd_3rd", 3),
    ("fd_weno5", 3), ("bd_weno5", 3), ("fd_hjweno5", 3), ("bd_hjweno5", 3),
]


def _smooth_field(n, lo=-1.0, hi=1.0):
    # frequency 4 keeps truncation error of even the 6th-order scheme
    # well above f32 roundoff at these coarse grids (tests run in f32,
    # the framework's working dtype)
    x = np.linspace(lo, hi, n, dtype=np.float64)
    dx = x[1] - x[0]
    f = np.sin(4.0 * x + 0.4)
    df = 4.0 * np.cos(4.0 * x + 0.4)
    # embed the 1-D profile along axis 0 of a thin 3-D grid
    grid = np.broadcast_to(f[:, None, None], (n, 4, 4)).copy()
    return jnp.asarray(grid, jnp.float32), df, dx


def _interior_err(scheme, n):
    grid, df, dx = _smooth_field(n)
    got = np.asarray(d1(grid, 0, dx, scheme), np.float64)[:, 2, 2]
    m = 4  # stay clear of the edge-clamped boundary stencils
    return np.abs(got[m:-m] - df[m:-m]).max()


@pytest.mark.parametrize("scheme,order", ORDERS)
def test_convergence_order(scheme, order):
    # halving dx must shrink the max interior error by ~2^order
    e1 = _interior_err(scheme, 17)
    e2 = _interior_err(scheme, 33)
    assert e2 < e1, (scheme, e1, e2)
    observed = np.log2(e1 / e2)
    assert observed > order - 0.5, (scheme, observed)


def test_cd_2ndt_is_twice_cd_2nd():
    # the reference's documented quirk (FiniteDifference.h:61)
    grid, _, dx = _smooth_field(17)
    a = np.asarray(d1(grid, 0, dx, "cd_2ndt"))
    b = np.asarray(d1(grid, 0, dx, "cd_2nd"))
    assert np.allclose(a, 2.0 * b, rtol=1e-6)


def test_weno5_reconstructs_smooth_flux():
    # WENO5(f(x-2dx..x+2dx)) ~ f(x+dx/2) to high order on smooth data
    x = np.linspace(0.0, 1.0, 5) * 0.1
    f = np.sin(2.0 * x + 0.3)
    got = float(weno5(*[jnp.asarray(v, jnp.float32) for v in f]))
    want = np.sin(2.0 * (x[2] + 0.5 * (x[1] - x[0])) + 0.3)
    # in f32 the smoothness regularizer (eps=1e-8) perturbs the optimal
    # weights; any convex reweighting is still a 3rd-order-accurate
    # interpolation, so bound by ~dx^3 |f'''|
    assert abs(got - want) < 1e-3


def test_weno_nonoscillatory_at_kink():
    # derivative of |x| must stay within [-1, 1] (+tiny) — a linear
    # high-order scheme overshoots at the kink, WENO must not
    n = 65
    x = np.linspace(-1, 1, n)
    dx = x[1] - x[0]
    grid = jnp.asarray(np.broadcast_to(np.abs(x)[:, None, None], (n, 4, 4)).copy())
    for scheme in ("fd_hjweno5", "bd_hjweno5"):
        g = np.asarray(d1(grid, 0, dx, scheme))[:, 2, 2]
        assert np.abs(g[3:-3]).max() <= 1.0 + 1e-3, scheme
    # and a linear 6th-order central stencil on the same data does NOT
    # stay sharp: it smears the jump (|g| well below 1 next to the kink),
    # which is exactly the artifact WENO's adaptive stencil avoids
    gc = np.asarray(d1(grid, 0, dx, "cd_6th"))[:, 2, 2]
    k = n // 2
    assert abs(gc[k]) < 0.2  # central difference flattens the kink


def test_biased_gradient_picks_upwind_side():
    # on f = |x| the backward/forward derivatives differ in sign at the
    # kink; positive velocity must select the backward (upwind) one
    n = 33
    x = np.linspace(-1, 1, n)
    dx = x[1] - x[0]
    grid = jnp.asarray(np.broadcast_to(np.abs(x)[:, None, None], (n, 4, 4)).copy())
    vpos = jnp.ones((n, 4, 4, 3))
    vneg = -vpos
    gp = np.asarray(biased_gradient(grid, vpos, "first", dx))[:, 2, 2, 0]
    gn = np.asarray(biased_gradient(grid, vneg, "first", dx))[:, 2, 2, 0]
    k = n // 2
    assert gp[k] == pytest.approx(-1.0, abs=1e-6)  # backward diff at kink
    assert gn[k] == pytest.approx(+1.0, abs=1e-6)  # forward diff at kink


def test_godunov_norm_matches_reference_selection():
    # scalar check of the outside/inside max-of-squares selection
    gm = jnp.asarray([[[[0.5, -0.2, 0.0]]]])
    gp = jnp.asarray([[[[-0.3, 0.4, 0.0]]]])
    out = float(godunov_norm_sqrd(jnp.asarray([[[True]]]), gm, gp)[0, 0, 0])
    # outside: max(max(gm,0)^2, min(gp,0)^2) per axis
    assert out == pytest.approx(max(0.5**2, 0.3**2) + max(0.0, 0.0), abs=1e-7)
    inn = float(godunov_norm_sqrd(jnp.asarray([[[False]]]), gm, gp)[0, 0, 0])
    assert inn == pytest.approx(0.0 + max(0.2**2, 0.4**2), abs=1e-7)


def _sphere(n, c, r):
    ax = np.arange(n, dtype=np.float64)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt((X - c[0]) ** 2 + (Y - c[1]) ** 2 + (Z - c[2]) ** 2) - r


def test_advect_hj_translates_sphere():
    n = 33
    phi = jnp.asarray(_sphere(n, (12.0, 16.0, 16.0), 6.0))
    v = jnp.zeros((n, n, n, 3)).at[..., 0].set(1.0)
    dt, steps = 0.5, 8  # move 4 voxels in +x
    p = phi
    for _ in range(steps):
        p = advect_hj(p, v, dt, spatial="hjweno5", temporal=3)
    want = _sphere(n, (16.0, 16.0, 16.0), 6.0)
    band = np.abs(want) < 3.0
    err5 = np.abs(np.asarray(p) - want)[band].max()
    assert err5 < 0.05
    # first-order upwind on the same problem is much more diffusive
    p1 = phi
    for _ in range(steps):
        p1 = advect_hj(p1, v, dt, spatial="first", temporal=1)
    err1 = np.abs(np.asarray(p1) - want)[band].max()
    assert err5 < 0.5 * err1


def test_tvd_rk_orders_on_linear_ode():
    # rhs_fn(phi) = phi  =>  solves phi' = -phi; exact decay e^{-dt}
    phi0 = jnp.asarray(1.0)
    dt = 0.1
    exact = np.exp(-dt)
    errs = [abs(float(tvd_rk(phi0, lambda p: p, dt, order=k)) - exact)
            for k in (1, 2, 3)]
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-5


def test_track_levelset_hj_path():
    from fluidsim_tpu.ops.levelset_tools import track_levelset
    n = 33
    phi = jnp.asarray(_sphere(n, (14.0, 16.0, 16.0), 6.0), jnp.float32)
    v = jnp.zeros((n, n, n, 3), jnp.float32).at[..., 0].set(1.0)
    p = track_levelset(phi, v, 1.0, bound=n // 2, order=2,
                       spatial="hjweno5", redist_iterations=3)
    want = _sphere(n, (15.0, 16.0, 16.0), 6.0)
    band = np.abs(want) < 2.0
    assert np.abs(np.asarray(p, np.float64) - want)[band].max() < 0.25


def test_track_levelset_schemes_agree_on_units_dx2():
    # regression: vc is index-space velocity in BOTH transport paths, so
    # semi-Lagrangian and HJ-upwind must move the interface the same
    # distance regardless of dx (the HJ gradient is per-voxel, dx only
    # scales the renormalization)
    from fluidsim_tpu.ops.levelset_tools import track_levelset
    n = 33
    phi0 = jnp.asarray(_sphere(n, (12.0, 16.0, 16.0), 6.0), jnp.float32)
    v = jnp.zeros((n, n, n, 3), jnp.float32).at[..., 0].set(1.0)
    outs = {}
    for spatial in ("semi", "hjweno5"):
        p = track_levelset(phi0, v, 2.0, bound=n // 2, order=2,
                           spatial=spatial, redist_iterations=2, dx=2.0)
        line = np.asarray(p)[:, 16, 16]
        outs[spatial] = int(np.where(np.diff(np.sign(line)) != 0)[0][0])
    # both move the -x zero crossing 2 voxels (from ~6 to ~8)
    assert outs["semi"] == outs["hjweno5"], outs
