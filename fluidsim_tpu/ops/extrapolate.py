"""Velocity extrapolation and MAC conversion utilities.

``extrapolate`` reproduces the reference's BFS layer-by-layer velocity
extension (``fluid.cc:705-802`` / ``mpm.cc:255-352`` — present but its call
site is commented out, ``fluid.cc:1147``): each sweep, every undefined cell
with at least one defined 27-neighbour receives the average of those
neighbours' values and becomes defined.  Here a sweep is 27 dense shifts
inside a ``lax.while_loop`` — no frontier queues, no mutation.

``to_staggered`` / ``to_collocated`` are the *working* versions of the
reference's dead-and-broken ``getStaggered``/``getUnstaggered``
(``fluid.cc:72-123`` assign to a by-value pointer, so they have no effect).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fluidsim_tpu.ops.transfer import _OFFSETS
from fluidsim_tpu.ops.transfer_fast import _shift3
from fluidsim_tpu.core.gridspec import shift_to_plus, shift_to_minus


def extrapolate(vel, defined, max_layers: int | None = None):
    """BFS-extend ``vel`` from ``defined`` cells into undefined ones.

    Args:
      vel: (N,N,N,3).
      defined: (N,N,N) bool.
      max_layers: sweep cap (default: enough to flood the whole box).
    Returns:
      (vel, defined) with every reachable cell defined.
    """
    n = vel.shape[0]
    if max_layers is None:
        max_layers = 3 * n

    def sweep(carry):
        v, d, _ = carry
        dm = d.astype(v.dtype)
        vsum = jnp.zeros_like(v)
        count = jnp.zeros_like(dm)
        for o in _OFFSETS:
            if (o == 0).all():
                continue
            vsum = vsum + _shift3(v * dm[..., None], o)
            count = count + _shift3(dm, o)
        newly = (~d) & (count > 0)
        avg = vsum / jnp.where(count > 0, count, 1.0)[..., None]
        v = jnp.where(newly[..., None], avg, v)
        return v, d | newly, jnp.sum(newly)

    def cond(carry):
        _, _, changed = carry
        return changed > 0

    v, d, _ = jax.lax.while_loop(
        cond, lambda c: sweep(c), sweep((vel, defined, jnp.asarray(0))))
    return v, d


def to_collocated(vel):
    """MAC face velocities -> cell centres (working ``getUnstaggered``)."""
    out = []
    for d in range(3):
        vd = vel[..., d]
        out.append(0.5 * (vd + shift_to_plus(vd, d)))
    return jnp.stack(out, axis=-1)


def to_staggered(vc):
    """Cell-centred velocities -> MAC faces by averaging the two adjacent
    centres (working ``getStaggered``; zero beyond the box)."""
    out = []
    for d in range(3):
        cd = vc[..., d]
        out.append(0.5 * (cd + shift_to_minus(cd, d)))
    return jnp.stack(out, axis=-1)


def resample_mask(pos, bound: int, max_per_cell: int):
    """Particle-count cap per cell (``PointList::resample``,
    ``fluid.cc:1053-1080`` — unused in the reference main loops).

    Returns a keep-mask: at most ``max_per_cell`` particles survive per cell
    (first-come in current order, mirroring the reference's locked counter).
    """
    from fluidsim_tpu.core.splines import cround
    n = 2 * bound + 1
    base = jnp.clip(cround(pos).astype(jnp.int32) + bound, 0, n - 1)
    flat = (base[:, 0] * n + base[:, 1]) * n + base[:, 2]
    order = jnp.argsort(flat, stable=True)
    flat_s = flat[order]
    # rank within run of equal ids
    idx = jnp.arange(flat.shape[0])
    starts = jnp.searchsorted(flat_s, flat_s, side="left")
    rank = idx - starts
    keep_sorted = rank < max_per_cell
    keep = jnp.zeros(flat.shape[0], bool).at[order].set(keep_sorted)
    return keep
