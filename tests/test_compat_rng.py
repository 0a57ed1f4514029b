"""Bit-compat seeding tests.

RNG oracles were generated with g++/libstdc++ (std::mt19937 +
uniform_int_distribution + uniform_real_distribution — the exact types the
reference instantiates via openvdb::math::RandInt/Rand01).
"""

import numpy as np

from fluidsim_tpu.compat.mt19937 import Mt19937
from fluidsim_tpu.compat.scatter import (
    _fill_items, _voxel_items, scatter_reference, seed_particles_compat,
    _detect_fill_box)
from fluidsim_tpu.scenes import get_scene


# --- oracles from a libstdc++ program (see commit message / docstring) ---
RAW0 = [2357136044, 2546248239, 3071714933, 3626093760, 2588848963,
        3684848379, 2340255427, 3638918503, 1819583497, 2678185683]
INT0_68921 = [37824, 40859, 49291, 58187, 41543, 59130, 37553, 58393, 29198, 42976]
REAL0 = [0.59284461651668263, 0.84426574425659828, 0.85794561998982988,
         0.84725173738433124, 0.62356369649610832, 0.38438170837375663,
         0.29753460535723419, 0.056712975933163663]
MIXED42 = [(5, 0.95071431174793819), (2, 0.77969099761266125),
           (9, 0.15601863865667259), (7, 0.099974920543840745),
           (0, 0.86617614875064441)]


def test_raw_stream_matches_std_mt19937():
    np.testing.assert_array_equal(Mt19937(0).raw(10).astype(np.uint64), RAW0)


def test_uniform_int_matches_libstdcxx():
    got = Mt19937(0).uniform_int(10, 68920)
    np.testing.assert_array_equal(got, INT0_68921)


def test_uniform_real_matches_libstdcxx():
    got = Mt19937(0).uniform_real(8)
    np.testing.assert_allclose(got, REAL0, rtol=0, atol=0)


def test_interleaved_draws_match():
    rng = Mt19937(42)
    for exp_i, exp_r in MIXED42:
        i = int(rng.uniform_int(1, 15)[0])
        r = float(rng.uniform_real(1)[0])
        assert i == exp_i, (i, exp_i)
        assert r == exp_r, (r, exp_r)


def test_uniform_int_batch_vs_scalar_consistent():
    a = Mt19937(7).uniform_int(1000, 68920)
    rng = Mt19937(7)
    b = np.asarray([rng.uniform_int(1, 68920)[0] for _ in range(1000)])
    np.testing.assert_array_equal(a, b)


def test_fill_items_water_cube():
    # fill(-20..20): per axis 4 fully covered 8-blocks (-16,-8,0,8) and two
    # partial; total active voxels must be 41^3 = 68921 (fluid.cc:1176).
    items = _fill_items((-20, -20, -20), (20, 20, 20))
    total = sum(s ** 3 for (_, _, s) in items)
    assert total == 41 ** 3
    tiles = [it for it in items if it[2] == 8]
    assert len(tiles) == 4 ** 3
    # no 128-tiles (box too small), coverage disjoint
    assert not any(s == 128 for (_, _, s) in items)
    seen = set()
    for (_, o, s) in items:
        for key in [(int(o[0]), int(o[1]), int(o[2]))] if s == 1 else []:
            assert key not in seen
            seen.add(key)


def test_voxel_items_cone_count_and_order():
    sc = get_scene("mpm_cone")
    items = _voxel_items(sc.seed_mask, sc.spec.bound)
    assert len(items) == int(sc.seed_mask.sum()) == 16
    # ordered by tree path key
    keys = [k for (k, _, _) in items]
    assert keys == sorted(keys)


def test_scatter_reference_water_cube_counts():
    items = _fill_items((-20, -20, -20), (20, 20, 20))
    pos = scatter_reference(items, 10.0, 0, 60)
    # target = 10 * 68921; the cube sits far inside |p| < 58 so none filtered
    assert pos.shape == (689210, 3)
    assert (np.abs(pos) < 58).all()
    assert (np.abs(pos) <= 21.0).all()          # inside the seeded cube
    # deterministic
    pos2 = scatter_reference(items, 10.0, 0, 60)
    np.testing.assert_array_equal(pos, pos2)
    # roughly uniform across the cube
    h, _ = np.histogram(pos[:, 0], bins=10, range=(-20.5, 20.5))
    assert h.min() > 0.8 * h.mean()


def test_scatter_reference_mpm_cone():
    sc = get_scene("mpm_cone")
    pos, vel = seed_particles_compat(sc)
    # target = 400 * 16 (mpm.cc:1280); the bottom voxel layer sits at y=-13,
    # so jittered points with y <= -13 fail the |p| < 13 add() filter
    # (mpm.cc:473) — a fraction survives, exactly as in the reference.
    assert 5000 < pos.shape[0] < 6400
    assert (np.abs(pos) < 13).all()
    assert (vel[:, 1] == -50.0).all()           # mpm.cc:484


def test_detect_fill_box():
    sc = get_scene("water_cube_drop")
    box = _detect_fill_box(sc.seed_mask, sc.spec.bound)
    assert box is not None
    np.testing.assert_array_equal(box[0], (-20, -20, -20))
    np.testing.assert_array_equal(box[1], (20, 20, 20))
    cone = get_scene("mpm_cone")
    assert _detect_fill_box(cone.seed_mask, cone.spec.bound) is None


def test_compat_seeder_in_sim():
    from fluidsim_tpu.models.flip import FlipSim
    sim = FlipSim(get_scene("water_cube_drop", bound=12, density=4.0),
                  seeder=seed_particles_compat)
    m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))
