"""Morphology and statistics oracles (tools::dilateVoxels/erodeVoxels,
math::Stats/Histogram, tools::statistics equivalents)."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.morphology import (
    dilate, erode, opening, closing, NN_FACE, NN_FACE_EDGE,
    NN_FACE_EDGE_VERTEX)
from fluidsim_tpu.ops.statistics import stats, histogram, extrema, op_stats
from fluidsim_tpu.ops.gridops import magnitude, gradient

N = 17
C = N // 2


def _single():
    m = jnp.zeros((N, N, N), bool).at[C, C, C].set(True)
    return m


def test_dilate_neighborhood_counts():
    # one step from a single voxel activates exactly the neighborhood
    assert int(dilate(_single(), 1, NN_FACE).sum()) == 1 + 6
    assert int(dilate(_single(), 1, NN_FACE_EDGE).sum()) == 1 + 18
    assert int(dilate(_single(), 1, NN_FACE_EDGE_VERTEX).sum()) == 1 + 26


def test_dilate_face_two_steps_is_l1_ball():
    m = dilate(_single(), 2, NN_FACE)
    x = np.abs(np.arange(N) - C)
    l1 = x[:, None, None] + x[None, :, None] + x[None, None, :]
    assert np.array_equal(np.asarray(m), l1 <= 2)


def test_erode_inverts_dilate_on_ball():
    m = dilate(_single(), 3, NN_FACE)
    e = erode(m, 1, NN_FACE)
    assert np.array_equal(np.asarray(e), np.asarray(dilate(_single(), 2, NN_FACE)))
    # eroding the single voxel kills it
    assert int(erode(_single(), 1, NN_FACE).sum()) == 0


def test_erode_at_box_edge():
    # a full mask erodes from the boundary inward (out-of-box = inactive)
    m = jnp.ones((N, N, N), bool)
    e = np.asarray(erode(m, 1, NN_FACE))
    assert e[1:-1, 1:-1, 1:-1].all()
    assert not e[0].any() and not e[-1].any()
    assert not e[:, 0].any() and not e[:, :, -1].any()


def test_opening_removes_speckle_closing_fills_hole():
    blob = dilate(_single(), 3, NN_FACE_EDGE_VERTEX)  # 7^3 cube
    speckled = blob.at[1, 1, 1].set(True)
    o = opening(speckled, 1, NN_FACE)
    assert not bool(o[1, 1, 1])
    assert bool(o[C, C, C])
    holed = blob.at[C, C, C].set(False)
    c = closing(holed, 1, NN_FACE)
    assert bool(c[C, C, C])


def test_stats_against_numpy():
    rng = np.random.default_rng(3)
    v = rng.normal(2.0, 1.5, size=(N, N, N)).astype(np.float32)
    s = stats(jnp.asarray(v))
    assert np.isclose(float(s.min), v.min())
    assert np.isclose(float(s.max), v.max())
    assert np.isclose(float(s.mean), v.mean(), rtol=1e-5)
    assert np.isclose(float(s.variance), v.var(), rtol=1e-3)
    assert int(s.count) == v.size


def test_stats_masked_and_empty():
    v = jnp.arange(8.0).reshape(2, 2, 2)
    m = v >= 4
    s = stats(v, mask=m)
    assert float(s.min) == 4 and float(s.max) == 7
    assert np.isclose(float(s.mean), 5.5)
    assert int(s.count) == 4
    s0 = stats(v, mask=jnp.zeros_like(m))
    assert int(s0.count) == 0 and float(s0.mean) == 0.0


def test_extrema_and_histogram():
    v = jnp.asarray(np.arange(100, dtype=np.float32))
    lo, hi = extrema(v)
    assert float(lo) == 0 and float(hi) == 99
    h = np.asarray(histogram(v, bins=10, vmin=0.0, vmax=100.0))
    assert h.sum() == 100
    assert (h == 10).all()
    # out-of-range values dropped
    h2 = np.asarray(histogram(v, bins=5, vmin=0.0, vmax=50.0))
    assert h2.sum() == 51  # 0..50 inclusive


def test_op_stats_gradient_magnitude():
    # f = x -> |grad f| = 1 in the interior
    c = np.arange(-C, C + 1, dtype=np.float32)
    f = jnp.asarray(np.broadcast_to(c[:, None, None], (N, N, N)).copy())
    interior = jnp.zeros((N, N, N), bool).at[2:-2, 2:-2, 2:-2].set(True)
    s = op_stats(f, lambda g: magnitude(gradient(g)), mask=interior)
    assert np.isclose(float(s.mean), 1.0, atol=1e-5)
    assert np.isclose(float(s.std), 0.0, atol=1e-5)
