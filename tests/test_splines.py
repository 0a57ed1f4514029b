"""Unit tests for the transfer kernels against hand-computed reference values
(``fluid.cc:22-37``, ``mpm.cc:25-41``, ``deformHeader.h:38-105``)."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.core.splines import (
    spline_flip, spline_mpm, spline2, dspline2, grad_w_mpm, cround, cround_out)


def test_spline_flip_values():
    # Hand-evaluated from fluid.cc:22-37.
    assert np.isclose(spline_flip(0.0), 1.0)                    # 1.5 * 2/3
    assert np.isclose(spline_flip(0.25), 1.5 * (4 * 0.25**3 - 4 * 0.25**2 + 2 / 3))
    assert np.isclose(spline_flip(0.5), 0.25)                   # 1.5*(4/3)(1-1/2)^3
    assert np.isclose(spline_flip(0.75), 1.5 * (4 / 3) * 0.25**3)
    assert np.isclose(spline_flip(1.0), 0.0)
    assert np.isclose(spline_flip(1.5), 0.0)
    # symmetry
    x = np.linspace(-1.2, 1.2, 41)
    np.testing.assert_allclose(spline_flip(x), spline_flip(-x), rtol=1e-6)


def test_spline_flip_is_scaled_cubic_bspline():
    # w(x) = 1.5 * B3(2|x|) where B3 is the standard cubic B-spline.
    def b3(t):
        t = abs(t)
        if t < 1:
            return 0.5 * t**3 - t**2 + 2 / 3
        if t < 2:
            return (2 - t)**3 / 6
        return 0.0
    for x in np.linspace(-1.5, 1.5, 61):
        assert np.isclose(float(spline_flip(x)), 1.5 * b3(2 * x), atol=1e-6), x


def test_spline_mpm_shift():
    # mpm.cc:25-41: same base evaluated at |x - 0.5|, no 1.5 prefactor.
    x = np.linspace(-1.0, 2.0, 61)
    np.testing.assert_allclose(np.asarray(spline_mpm(x)),
                               np.asarray(spline_flip(x - 0.5)) / 1.5,
                               rtol=1e-6, atol=1e-7)
    # support is (-0.5, 1.5)
    assert spline_mpm(-0.5) == 0.0
    assert spline_mpm(1.5) == 0.0
    assert float(spline_mpm(0.5)) > 0.6


def test_dspline2_matches_numerical_derivative():
    x = np.linspace(-0.95, 0.95, 77)
    h = 1e-3  # large enough to beat f32 rounding; central diff is O(h^2)
    num = (np.asarray(spline2(x + h), np.float64)
           - np.asarray(spline2(x - h), np.float64)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dspline2(x)), num, atol=5e-3)


def test_grad_w_matches_reference_form():
    # deformHeader.h:90-105: grad component d = -dspline2(p_d - c_d - 0.5)
    # times the other axes' spline2(0.5 + c - p) weights.
    rng = np.random.default_rng(0)
    p = rng.uniform(-2, 2, size=(16, 3))
    c = rng.integers(-2, 3, size=(16, 3)).astype(np.float64)
    w, g = grad_w_mpm(jnp.asarray(p - c))
    for i in range(16):
        wx = float(spline2(0.5 + c[i, 0] - p[i, 0]))
        wy = float(spline2(0.5 + c[i, 1] - p[i, 1]))
        wz = float(spline2(0.5 + c[i, 2] - p[i, 2]))
        gx = -float(dspline2(p[i, 0] - c[i, 0] - 0.5))
        assert np.isclose(float(w[i]), wx * wy * wz, atol=1e-5)
        assert np.isclose(float(g[i, 0]), gx * wy * wz, atol=1e-5)


def test_grad_w_numerical():
    # grad wrt node c == -grad wrt particle p; check against finite differences.
    rng = np.random.default_rng(1)
    delta = rng.uniform(-0.4, 1.4, size=(32, 3))
    _, g = grad_w_mpm(jnp.asarray(delta))
    h = 1e-3  # f32-safe step; central diff error O(h^2)
    for d in range(3):
        dp = delta.copy(); dp[:, d] += h
        dm = delta.copy(); dm[:, d] -= h
        wp, _ = grad_w_mpm(jnp.asarray(dp))
        wm, _ = grad_w_mpm(jnp.asarray(dm))
        num = -(np.asarray(wp, np.float64) - np.asarray(wm, np.float64)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[:, d]), num, atol=5e-3)


def test_stencil_weight_sums():
    # The reference's compressed kernel is NOT a partition of unity at unit
    # spacing (hence the explicit sum(w) normalisation in every gather,
    # fluid.cc:187-196).  Pin the stencil sums instead: a particle exactly at
    # a cell centre sees w(0) + 2*w(1) = 1.0 for FLIP.
    total = float(spline_flip(0.0) + 2 * spline_flip(1.0))
    assert np.isclose(total, 1.0)
    # and the sum is strictly positive over the whole stencil range
    rng = np.random.default_rng(2)
    p = rng.uniform(-0.5, 0.5, size=64)
    tot_flip = sum(np.asarray(spline_flip(p - c)) for c in (-1, 0, 1))
    assert (tot_flip > 0.2).all()
    tot_mpm = sum(np.asarray(spline_mpm(p - c)) for c in (-1, 0, 1))
    assert (tot_mpm > 0.2).all()


def test_cround_matches_c_semantics():
    x = jnp.asarray([-1.5, -0.5, -0.49, 0.0, 0.49, 0.5, 1.5, 2.49])
    np.testing.assert_array_equal(np.asarray(cround(x)),
                                  [-2., -1., 0., 0., 0., 1., 2., 2.])
    np.testing.assert_array_equal(np.asarray(cround_out(x)),
                                  [-2., -1., -1., 0., 1., 1., 2., 3.])
