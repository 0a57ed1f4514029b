"""Window-grouped bucket sort (``ops/bucket_sort.py``): the sort
replacement for the Pallas transfer pipeline.  Invariants tested:

* output windows (``flat // 512``) are non-decreasing — all the kernels
  need (``build_chunks`` window-edge binary search stays exact);
* the output is a permutation of the input rows (payload rides
  bit-exactly, including a bitcast int column);
* a coherence-cap violation (random keys) flips ``ok`` and
  ``bucket_or_sort`` falls back to the bit-exact full sort;
* feeding the bucket order into ``p2g_pallas`` (interpret) reproduces
  the full-sort result exactly (order inside a window is free).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fluidsim_tpu.ops.bucket_sort import bucket_by_window, bucket_or_sort


def _coherent_keys(rng, p, ncells=4000):
    # ~1+ particle/cell: the production regime (10-25/voxel); a sparser
    # distribution makes chunks span many windows and (correctly) trips
    # the coherence caps into the fallback
    base = np.sort(rng.integers(0, ncells, p))
    jitter = rng.integers(-40, 40, p)
    return np.clip(base + jitter, 0, ncells + 63).astype(np.int32)


@pytest.mark.parametrize("p", [5000, 8192])
def test_window_grouping_and_permutation(p):
    rng = np.random.default_rng(p)
    keys = _coherent_keys(rng, p)
    cols = rng.standard_normal((6, p)).astype(np.float32)
    fo, co, ok = bucket_by_window(jnp.asarray(keys), jnp.asarray(cols),
                                  interpret=True)
    fo, co = np.asarray(fo), np.asarray(co)
    assert bool(ok)
    assert (np.diff(fo // 512) >= 0).all()
    a = np.concatenate([keys[None].astype(np.float64),
                        cols.astype(np.float64)], 0).T
    b = np.concatenate([fo[None].astype(np.float64),
                        co.astype(np.float64)], 0).T
    np.testing.assert_array_equal(a[np.lexsort(a.T)], b[np.lexsort(b.T)])


def test_int_payload_bitexact():
    rng = np.random.default_rng(0)
    p = 3000
    keys = _coherent_keys(rng, p)
    ints = rng.integers(-(2**31), 2**31 - 1, p, dtype=np.int64).astype(
        np.int32)
    cols = jax.lax.bitcast_convert_type(jnp.asarray(ints),
                                        jnp.float32)[None]
    fo, co, ok = bucket_by_window(jnp.asarray(keys), cols, interpret=True)
    assert bool(ok)
    back = np.asarray(jax.lax.bitcast_convert_type(co[0], jnp.int32))
    assert sorted(back.tolist()) == sorted(ints.tolist())


def test_violation_falls_back_to_full_sort():
    rng = np.random.default_rng(1)
    p = 5000
    keys = rng.integers(0, 1 << 22, p).astype(np.int32)
    cols = rng.standard_normal((6, p)).astype(np.float32)
    _, _, ok = bucket_by_window(jnp.asarray(keys), jnp.asarray(cols),
                                interpret=True)
    assert not bool(ok)
    fo, co = bucket_or_sort(jnp.asarray(keys), jnp.asarray(cols),
                            interpret=True)
    fo = np.asarray(fo)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(fo, keys[order])
    np.testing.assert_array_equal(np.asarray(co[0]), cols[0][order])


def test_apic_width_payload():
    """15 payload columns (pos+vel+affine) travel correctly."""
    rng = np.random.default_rng(2)
    p = 4096
    keys = _coherent_keys(rng, p)
    cols = rng.standard_normal((15, p)).astype(np.float32)
    fo, co, ok = bucket_by_window(jnp.asarray(keys), jnp.asarray(cols),
                                  interpret=True)
    assert bool(ok)
    a = np.concatenate([keys[None].astype(np.float64),
                        cols.astype(np.float64)], 0).T
    b = np.concatenate([np.asarray(fo)[None].astype(np.float64),
                        np.asarray(co).astype(np.float64)], 0).T
    np.testing.assert_array_equal(a[np.lexsort(a.T)], b[np.lexsort(b.T)])


def test_bucket_feeds_p2g_identically():
    from fluidsim_tpu.ops import transfer_pallas as tp

    B = 12
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    rng = np.random.default_rng(3)
    p = 4000
    pos = jnp.asarray(np.sort(rng.uniform(-11, 11, (p, 3)), axis=0)
                      .astype(np.float32))
    vel = jnp.asarray(rng.standard_normal((p, 3)).astype(np.float32))
    solid = jnp.zeros((n, n, n), bool)

    pf, vf, ff = tp.sort_by_cell_h(pos, vel, B, lay, method="full")
    pb, vb, fb = tp.sort_by_cell_h(pos, vel, B, lay, method="bucket",
                                   interpret=True)
    assert bool(jnp.all(jnp.diff(fb // 512) >= 0))
    wf, mf, of, _ = tp.p2g_pallas(pf, vf, ff, solid, B, lay, "flip",
                                  channel_major=True, interpret=True)
    wb, mb, ob, _ = tp.p2g_pallas(pb, vb, fb, solid, B, lay, "flip",
                                  channel_major=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(wf), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(mb))
    np.testing.assert_array_equal(np.asarray(of), np.asarray(ob))
