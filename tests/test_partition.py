"""Particle partition oracles (PointIndexGrid / PointPartitioner
equivalents) — checked against a numpy bucket sort."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.partition import (
    partition_by_cell, cells_of, points_in_cell, neighbor_counts)

B = 6
N = 2 * B + 1


def _random_particles(p=500, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-B + 0.51, B - 0.51, size=(p, 3))
                       .astype(np.float32))


def test_counts_match_numpy():
    pos = _random_particles()
    part = partition_by_cell(pos, B)
    cells = np.round(np.asarray(pos)).astype(int) + B
    flat = (cells[:, 0] * N + cells[:, 1]) * N + cells[:, 2]
    counts_np = np.bincount(flat, minlength=N**3)
    assert np.array_equal(np.asarray(part.counts), counts_np)
    assert int(part.offsets[-1]) == pos.shape[0]
    assert np.array_equal(np.asarray(part.offsets[1:]),
                          np.cumsum(counts_np))


def test_order_groups_particles_by_cell():
    pos = _random_particles(300, seed=1)
    part = partition_by_cell(pos, B)
    flat = np.asarray(cells_of(pos, B))
    sorted_cells = flat[np.asarray(part.order)]
    assert (np.diff(sorted_cells) >= 0).all()
    assert np.array_equal(np.asarray(part.cell_of), sorted_cells)
    # permutation property
    assert np.array_equal(np.sort(np.asarray(part.order)),
                          np.arange(pos.shape[0]))


def test_points_in_cell_query():
    pos = _random_particles(400, seed=2)
    part = partition_by_cell(pos, B)
    flat = np.asarray(cells_of(pos, B))
    # pick the fullest cell
    target = int(np.argmax(np.asarray(part.counts)))
    expect = set(np.where(flat == target)[0])
    cap = max(len(expect) + 3, 8)
    ids, count = points_in_cell(part, target, capacity=cap)
    ids = np.asarray(ids)
    assert int(count) == len(expect)
    assert set(ids[ids >= 0]) == expect
    assert (ids[int(count):] == -1).all()
    # empty cell
    empty = int(np.argmin(np.asarray(part.counts)))
    ids0, c0 = points_in_cell(part, empty, capacity=4)
    if int(c0) == 0:
        assert (np.asarray(ids0) == -1).all()


def test_neighbor_counts_against_numpy():
    pos = _random_particles(250, seed=3)
    part = partition_by_cell(pos, B)
    nc = np.asarray(neighbor_counts(part, B, radius=1))
    c = np.asarray(part.counts).reshape(N, N, N)
    pad = np.pad(c, 1)
    expect = np.zeros_like(c)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                expect += pad[dx:dx + N, dy:dy + N, dz:dz + N]
    assert np.array_equal(nc, expect)
