"""Grid statistics and histograms (``openvdb/math/Stats.h`` +
``openvdb/tools/Statistics.h`` analogs).

The reference computes population statistics (``math::Stats``: min, max,
mean, variance via one-pass moment accumulation, ``Stats.h:208``) and
histograms (``math::Histogram``, ``Stats.h:305``) over grid values or over
operator results (``tools::statistics``, ``tools::opStatistics``) using
TBB reductions.  Here each is a handful of masked ``jnp`` reductions —
jit-safe, so they can run inside a compiled step (the simulator's
per-frame metrics use the same idiom).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Stats", "stats", "histogram", "extrema", "op_stats"]


class Stats(NamedTuple):
    """Population statistics of the sampled values (``math::Stats``)."""
    min: jnp.ndarray
    max: jnp.ndarray
    mean: jnp.ndarray
    variance: jnp.ndarray  # population variance, like Stats::variance()
    std: jnp.ndarray
    count: jnp.ndarray


def stats(values, mask=None) -> Stats:
    """One-pass moment statistics over (optionally masked) grid values.

    ``mask=None`` reduces over every cell — the analog of iterating all
    active voxels of a dense grid.  Empty selections return zeros (min/max
    of an empty OpenVDB iterator are undefined; we pin them to 0).
    """
    v = jnp.asarray(values)
    if mask is None:
        n = jnp.asarray(v.size, jnp.float32)
        s = jnp.sum(v, dtype=jnp.float32)
        s2 = jnp.sum((v * v).astype(jnp.float32))
        vmin, vmax = jnp.min(v), jnp.max(v)
    else:
        m = mask.astype(bool)
        n = jnp.sum(m, dtype=jnp.float32)
        s = jnp.sum(jnp.where(m, v, 0), dtype=jnp.float32)
        s2 = jnp.sum(jnp.where(m, (v * v), 0).astype(jnp.float32))
        big = jnp.asarray(jnp.finfo(jnp.float32).max, v.dtype)
        vmin = jnp.min(jnp.where(m, v, big))
        vmax = jnp.max(jnp.where(m, v, -big))
    safe_n = jnp.maximum(n, 1.0)
    mean = s / safe_n
    var = jnp.maximum(s2 / safe_n - mean * mean, 0.0)
    empty = n == 0
    z = jnp.zeros((), jnp.float32)
    return Stats(
        min=jnp.where(empty, z, vmin.astype(jnp.float32)),
        max=jnp.where(empty, z, vmax.astype(jnp.float32)),
        mean=jnp.where(empty, z, mean),
        variance=jnp.where(empty, z, var),
        std=jnp.where(empty, z, jnp.sqrt(var)),
        count=n.astype(jnp.int32),
    )


def extrema(values, mask=None):
    """(min, max) only — the analog of ``math::Extrema`` /
    ``tools::extrema``."""
    s = stats(values, mask)
    return s.min, s.max


def histogram(values, bins: int, vmin: float, vmax: float, mask=None):
    """Fixed-range histogram (``math::Histogram``, ``Stats.h:305``).

    Values outside ``[vmin, vmax]`` are dropped, like Histogram::add.
    Returns integer counts of shape ``(bins,)``.
    """
    v = jnp.asarray(values).reshape(-1).astype(jnp.float32)
    keep = (v >= vmin) & (v <= vmax)
    if mask is not None:
        keep = keep & mask.astype(bool).reshape(-1)
    width = (vmax - vmin) / bins
    idx = jnp.clip(((v - vmin) / width).astype(jnp.int32), 0, bins - 1)
    return jnp.zeros((bins,), jnp.int32).at[idx].add(keep.astype(jnp.int32))


def op_stats(values, op, mask=None, **op_kwargs) -> Stats:
    """Statistics of an operator applied to a grid — the analog of
    ``tools::opStatistics`` (e.g. gradient-magnitude stats).  ``op`` is any
    cell-wise or stencil function from :mod:`fluidsim_tpu.ops.gridops`."""
    return stats(op(values, **op_kwargs), mask)
