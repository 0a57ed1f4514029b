"""Semi-Lagrangian volume and point advection — the capability answers to
``openvdb/tools/VolumeAdvect.h`` and ``openvdb/tools/PointAdvect.h`` (the
reference vendors and includes both but hand-rolls its own particle
advection instead).

Dense formulation: trilinear sampling at back-traced positions, RK1/RK2/RK3
integrators, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_trilinear(field, pos, bound: int):
    """Trilinear sample of a cell-centred dense field at index-space
    positions (clamped at the box edge).

    field: (N,N,N) or (N,N,N,C); pos: (P,3) grid coordinates.
    """
    n = 2 * bound + 1
    p = jnp.clip(pos + bound, 0.0, n - 1.000001)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    i1 = jnp.minimum(i0 + 1, n - 1)

    def gather(ix, iy, iz):
        flat = (ix * n + iy) * n + iz
        vals = field.reshape(n * n * n, -1)[flat]
        return vals

    c00 = (gather(i0[:, 0], i0[:, 1], i0[:, 2]) * (1 - f[:, 2:3])
           + gather(i0[:, 0], i0[:, 1], i1[:, 2]) * f[:, 2:3])
    c01 = (gather(i0[:, 0], i1[:, 1], i0[:, 2]) * (1 - f[:, 2:3])
           + gather(i0[:, 0], i1[:, 1], i1[:, 2]) * f[:, 2:3])
    c10 = (gather(i1[:, 0], i0[:, 1], i0[:, 2]) * (1 - f[:, 2:3])
           + gather(i1[:, 0], i0[:, 1], i1[:, 2]) * f[:, 2:3])
    c11 = (gather(i1[:, 0], i1[:, 1], i0[:, 2]) * (1 - f[:, 2:3])
           + gather(i1[:, 0], i1[:, 1], i1[:, 2]) * f[:, 2:3])
    c0 = c00 * (1 - f[:, 1:2]) + c01 * f[:, 1:2]
    c1 = c10 * (1 - f[:, 1:2]) + c11 * f[:, 1:2]
    out = c0 * (1 - f[:, 0:1]) + c1 * f[:, 0:1]
    return out if field.ndim == 4 else out[:, 0]


def _velocity_at(vc, pos, bound):
    return sample_trilinear(vc, pos, bound)


def advect_points(pos, vc, dt, bound: int, order: int = 2):
    """Advect positions through a cell-centred velocity field
    (``tools::PointAdvect``): RK1/2/3."""
    k1 = _velocity_at(vc, pos, bound)
    if order == 1:
        return pos + dt * k1
    k2 = _velocity_at(vc, pos + 0.5 * dt * k1, bound)
    if order == 2:
        return pos + dt * k2
    k3 = _velocity_at(vc, pos + dt * (2.0 * k2 - k1), bound)
    return pos + dt * (k1 + 4.0 * k2 + k3) / 6.0


def advect_volume(field, vc, dt, bound: int, order: int = 2):
    """Semi-Lagrangian advection of a dense scalar field
    (``tools::VolumeAdvect``): sample the field at back-traced cell
    centres."""
    n = 2 * bound + 1
    c = jnp.arange(-bound, bound + 1, dtype=vc.dtype)
    grid_pos = jnp.stack(jnp.meshgrid(c, c, c, indexing="ij"),
                         axis=-1).reshape(-1, 3)
    back = advect_points(grid_pos, vc, -dt, bound, order=order)
    return sample_trilinear(field, back, bound).reshape(n, n, n)
