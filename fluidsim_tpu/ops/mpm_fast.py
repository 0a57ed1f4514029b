"""Sorted channel-fused transfers for the MPM pipeline.

Same design as ``ops.transfer_fast`` (sort by cell; one wide sorted scatter
at the base cell + dense shifts; neighbourhood tables + one sorted row-gather
for the gather side), applied to MPM's additional structures:

* mass + momentum P2G with the half-cell-shifted kernel (``mpm.cc:25-41``),
* the grid elastic-force scatter ``f_i -= V sigma gradW_i`` as an 81-channel
  base scatter (27 offsets x 3 force components),
* per-particle velocity-gradient and FLIP-delta gathers from one shared
  neighbourhood table.

All reference masks are target-cell-level here too (scatter to ~solid cells,
Hessian columns restricted to active cells), so masking stays dense.  The
force function remains a plain jittable function of the grid displacement,
so ``jax.jvp`` still provides the implicit solve's Hessian-vector products.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fluidsim_tpu.core.splines import cround, grad_w_mpm
from fluidsim_tpu.ops.transfer import _OFFSETS
from fluidsim_tpu.ops.transfer_fast import _shift3
from fluidsim_tpu.ops.svd3 import (piola_corotated, piola_linearized,
                                   mm3)
from fluidsim_tpu.ops.smallmat import apply_mat27, outer_sum27


def sort_mpm(pos, vel, FE, FP, volume, bound: int):
    """Sort the full MPM particle state by base-cell flat id."""
    n = 2 * bound + 1
    base = cround(pos).astype(jnp.int32)
    bc = jnp.clip(base + bound, 0, n - 1)
    flat = (bc[:, 0] * n + bc[:, 1]) * n + bc[:, 2]
    ops = ([flat] + [pos[:, i] for i in range(3)] + [vel[:, i] for i in range(3)]
           + [FE.reshape(-1, 9)[:, i] for i in range(9)]
           + [FP.reshape(-1, 9)[:, i] for i in range(9)] + [volume])
    out = jax.lax.sort(ops, num_keys=1)
    return (jnp.stack(out[1:4], -1), jnp.stack(out[4:7], -1),
            jnp.stack(out[7:16], -1).reshape(-1, 3, 3),
            jnp.stack(out[16:25], -1).reshape(-1, 3, 3), out[25], out[0])


def stencil_mpm(pos_s):
    """(w27, gradw) with the MPM half-cell-shifted kernel for the 27-cell
    stencil around round(pos) (``deformHeader.h:90-105`` convention)."""
    base = cround(pos_s)
    offs = jnp.asarray(_OFFSETS, pos_s.dtype)
    delta = pos_s[:, None, :] - (base[:, None, :] + offs[None])
    return grad_w_mpm(delta)


def _valid(pos_s, bound):
    return jnp.all(jnp.abs(cround(pos_s)) <= bound, axis=-1)


def scatter_channels(flat_s, u, bound: int):
    """(P, 27, C) -> dense (N,N,N,C) via one sorted scatter + 27 shifts."""
    n = 2 * bound + 1
    c = u.shape[-1]
    d = jnp.zeros((n * n * n, 27 * c), u.dtype).at[flat_s].add(
        u.reshape(-1, 27 * c), indices_are_sorted=True)
    d = d.reshape(n, n, n, 27, c)
    acc = jnp.zeros((n, n, n, c), u.dtype)
    for o in range(27):
        acc = acc + _shift3(d[..., o, :], _OFFSETS[o])
    return acc


def gather_table(fields, mask, flat_s):
    """Pack each cell's 27-neighbourhood (C channels + validity) and gather
    one row per particle: returns (P, 27, C+1)."""
    n = fields.shape[0]
    c = fields.shape[-1]
    fm = jnp.concatenate([jnp.where(mask[..., None], fields, 0.0),
                          mask[..., None].astype(fields.dtype)], axis=-1)
    cols = [_shift3(fm, -_OFFSETS[o]) for o in range(27)]
    table = jnp.stack(cols, axis=-2).reshape(n ** 3, 27 * (c + 1))
    return table[flat_s].reshape(-1, 27, c + 1)


def p2g_mpm(pos_s, vel_s, flat_s, solid, bound: int):
    """Mass (``interpolate``) + momentum P2G in one fused scatter.

    With the standard wall geometry both reference masks reduce to ~solid
    (see transfer_fast notes), so mass and momentum share one pass.
    """
    w27, _ = stencil_mpm(pos_s)
    w27 = jnp.where(_valid(pos_s, bound)[:, None], w27, 0.0)
    u = jnp.concatenate([w27[..., None], w27[..., None] * vel_s[:, None, :]],
                        axis=-1)
    acc = scatter_channels(flat_s, u, bound)
    ns = ~solid
    mass = jnp.where(ns, acc[..., 0], 0.0)
    mom = jnp.where(ns[..., None], acc[..., 1:4], 0.0)
    return mass, mom


def make_force_fn_fused(pos_s, flat_s, gradw, w27_valid, FE, volume, mu, lam,
                        active, solid, bound: int, hessian: str = "full"):
    """Fused grid-force function of a dense displacement field u (N,N,N,3).

    ``forces(0)`` equals the naive ``models.mpm.make_force_fn`` zero point;
    ``jax.jvp`` at 0 gives the same Hessian-vector product (gather columns
    masked to active cells, scatter rows masked to ~solid, matching
    ``mpm.cc:596-701``).

    ``hessian="hybrid"`` returns ``(forces_full, forces_spd)`` — identical
    at u=0, differing only in the jvp linearization.
    """
    fe_t = jnp.swapaxes(FE, -1, -2)
    not_solid = ~solid
    hybrid = hessian == "hybrid"
    p0, dp = piola_linearized(FE, mu, lam,
                              "full" if hybrid else hessian)  # one SVD/frame

    def _forces_with(dp_):
        def forces(u):
            rows = gather_table(u, active, flat_s)          # (P, 27, 4)
            u_nodes = rows[..., :3] * rows[..., 3:4]
            g = outer_sum27(u_nodes, gradw)
            p_stress = p0 + dp_(mm3(g, FE))
            sigma = mm3(p_stress, fe_t)
            f_pk = -volume[:, None, None] * apply_mat27(sigma, gradw)
            f_pk = f_pk * w27_valid[..., None]          # zero dead particles
            f = scatter_channels(flat_s, f_pk, bound)   # (N,N,N,3)
            return jnp.where(not_solid[..., None], f, 0.0)
        return forces

    if hybrid:
        _, dp_spd = piola_linearized(FE, mu, lam, "spd")
        return _forces_with(dp), _forces_with(dp_spd)
    return _forces_with(dp)


def g2p_gradv(velg, flat_s, gradw, solid, bound: int):
    """Velocity-gradient gather: gradV_p = sum v(c) gradW(c)^T over ~solid
    stencil cells (``updateDeformationGradient``, ``mpm.cc:499-537``)."""
    rows = gather_table(velg, ~solid, flat_s)
    v_nodes = rows[..., :3] * rows[..., 3:4]
    return outer_sum27(v_nodes, gradw)


def g2p_flip_mpm(pos_s, flat_s, dvc, bound: int, wall: int):
    """FLIP delta with the MPM kernel over within-wall cells."""
    n = 2 * bound + 1
    coords = np.abs(np.arange(-bound, bound + 1))
    ok = coords <= wall
    within = jnp.asarray(ok[:, None, None] & ok[None, :, None]
                         & ok[None, None, :])
    rows = gather_table(dvc, within, flat_s)
    w27, _ = stencil_mpm(pos_s)
    wm = jnp.where(_valid(pos_s, bound)[:, None], w27, 0.0) * rows[..., 3]
    num = jnp.sum(wm[..., None] * rows[..., :3], axis=1)
    den = jnp.sum(wm, axis=1)
    safe = jnp.where(den != 0, den, 1.0)
    return jnp.where(den[:, None] != 0, num / safe[:, None], 0.0)
