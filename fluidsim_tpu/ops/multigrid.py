"""Geometric multigrid V-cycle preconditioner for the pressure projection.

The reference leans on IncompleteCholesky to keep Eigen CG iteration counts
down (``fluid.cc:1352``); our TPU Jacobi-PCG needs ~110 iterations at 129^3.
A V-cycle over rediscretised masked Laplacians is the TPU-native way to cut
that: every ingredient (damped Jacobi sweeps, masked 2x block restriction,
piecewise-constant prolongation) is dense stencil arithmetic XLA fuses well,
and the hierarchy shrinks by 8x per level so coarse work is negligible.

Symmetry (required for PCG): the cycle uses equal pre/post damped-Jacobi
smoothing and prolongation = 8 x restriction^T (piecewise-constant blocks),
making M symmetric positive definite on the fluid subspace.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from fluidsim_tpu.ops import pressure as pr


class MgLevel(NamedTuple):
    fluid: jax.Array     # (n,n,n) bool
    solid: jax.Array     # (n,n,n) bool
    adiag: jax.Array     # (n,n,n) diagonal of the level operator
    dt: float | jax.Array
    rho: float
    dx: float


def _pad_even(a, fill=False):
    n = a.shape[0]
    if n % 2 == 0:
        return a
    pad = [(0, 1)] * 3 + [(0, 0)] * (a.ndim - 3)
    return jnp.pad(a, pad, constant_values=fill)


def _blocks(a):
    """(2m,2m,2m) -> (m,m,m,8) gathering each 2^3 block's cells."""
    m = a.shape[0] // 2
    v = a.reshape(m, 2, m, 2, m, 2)
    return jnp.moveaxis(v, (1, 3), (3, 4)).reshape(m, m, m, 8)


def coarsen_masks(fluid, solid):
    """Coarse cell is solid iff all 8 fine cells are solid; fluid iff any
    fine cell is fluid and the coarse cell is not solid."""
    fb = _blocks(_pad_even(fluid, False))
    sb = _blocks(_pad_even(solid, True))
    solid_c = jnp.all(sb, axis=-1)
    fluid_c = jnp.any(fb, axis=-1) & (~solid_c)
    return fluid_c, solid_c


def restrict(r):
    """Masked full-block average: r_c = (1/8) sum of the 2^3 fine cells."""
    return jnp.mean(_blocks(_pad_even(r, 0.0)), axis=-1)


def prolong(e_c, n_fine):
    """Piecewise-constant prolongation (8 x restrict^T)."""
    m = e_c.shape[0]
    e = jnp.broadcast_to(e_c[:, None, :, None, :, None],
                         (m, 2, m, 2, m, 2)).reshape(2 * m, 2 * m, 2 * m)
    return e[:n_fine, :n_fine, :n_fine]


def build_hierarchy(fluid, solid, dt, rho, dx, min_size: int = 9) -> List[MgLevel]:
    levels = [MgLevel(fluid, solid,
                      pr.laplacian_diag(fluid, solid, dt, rho, dx), dt, rho, dx)]
    f, s, d = fluid, solid, dx
    while (f.shape[0] + 1) // 2 >= min_size:
        f, s = coarsen_masks(f, s)
        d = d * 2.0
        levels.append(MgLevel(f, s, pr.laplacian_diag(f, s, dt, rho, d),
                              dt, rho, d))
    return levels


def _smooth(level: MgLevel, x, b, sweeps: int, omega: float = 0.8):
    safe = jnp.where(level.adiag > 0, level.adiag, 1.0)

    def body(_, x):
        r = b - pr.apply_laplacian(x, level.adiag, level.fluid, level.dt,
                                   level.rho, level.dx)
        return jnp.where(level.fluid, x + omega * r / safe, 0.0)

    return jax.lax.fori_loop(0, sweeps, body, x)


def v_cycle(levels: List[MgLevel], b, pre: int = 2, post: int = 2,
            coarse_sweeps: int = 24, start: int = 0):
    """One symmetric V-cycle approximating A^{-1} b, descending from level
    ``start`` (0 = finest; >0 lets a caller own the finer levels, e.g. the
    packed-smoother preconditioner below)."""

    def cycle(li, b):
        lev = levels[li]
        if li == len(levels) - 1:
            return _smooth(lev, jnp.zeros_like(b), b, coarse_sweeps)
        x = _smooth(lev, jnp.zeros_like(b), b, pre)
        r = b - pr.apply_laplacian(x, lev.adiag, lev.fluid, lev.dt, lev.rho,
                                   lev.dx)
        rc = restrict(jnp.where(lev.fluid, r, 0.0))
        rc = jnp.where(levels[li + 1].fluid, rc, 0.0)
        ec = cycle(li + 1, rc)
        # piecewise-constant prolongation is 8 x restrict^T, the standard
        # scaling partner of the 1/8 block average (keeps M symmetric)
        x = x + jnp.where(lev.fluid, prolong(ec, b.shape[0]), 0.0)
        return _smooth(lev, x, b, post)

    return cycle(start, b)


def mg_preconditioner(fluid, solid, dt, rho, dx, pre: int = 2, post: int = 2):
    """Build an SPD V-cycle preconditioner callable for ``ops.pcg.pcg``."""
    levels = build_hierarchy(fluid, solid, dt, rho, dx)

    def precond(r):
        return v_cycle(levels, jnp.where(fluid, r, 0.0), pre=pre, post=post)

    return precond


def mg_preconditioner_packed(fluid, solid, dt, rho, dx, pad, unpad,
                             apply_packed, ad_p, pre: int = 2, post: int = 2,
                             omega: float = 0.8):
    """Packed-smoother V-cycle: the SPD V-cycle with the FINE level's
    damped-Jacobi sweeps and residual computed in the packed (Npx, L)
    layout via the fused Pallas stencil (``pallas_stencil.apply_laplacian_
    padded[_lh]``) instead of dense masked shifts.

    Rationale (round-5 measurement, ``docs/architecture.md``): at 255^3 the
    dense V-cycle costs ~38 ms/cycle because its fine-level sweeps run at
    ~100 GB/s in the (N,N,N) layout inside the step program, while the
    packed Pallas apply sustains ~304 GB/s — and the fine level is ~7/8 of
    the cycle's bytes.  Moving exactly those sweeps into the packed layout
    keeps the operator bit-identical (the kernel masks with adiag > 0, the
    same fluid predicate) and leaves the geometrically-shrinking coarse
    levels (1/8 the cells per level) on the dense path, reached through one
    unpad/pad round trip per cycle.

    Symmetry: equal pre/post packed smooths around a symmetric coarse
    correction (the dense ``v_cycle`` from level 1, itself symmetric), and
    pad/unpad are mutually-transposed layout bijections on the fluid
    support — so M stays symmetric PSD and PCG theory holds.
    """
    levels = build_hierarchy(fluid, solid, dt, rho, dx)
    maskp = ad_p > 0
    safe = jnp.where(maskp, ad_p, 1.0)
    n_fine = fluid.shape[0]

    def smooth_p(x, b, sweeps):
        def body(_, x):
            r = b - apply_packed(x)
            return jnp.where(maskp, x + omega * r / safe, 0.0)
        return jax.lax.fori_loop(0, sweeps, body, x)

    if len(levels) == 1:
        # grid too small to coarsen: pure packed smoothing
        def precond(r_p):
            b = jnp.where(maskp, r_p, 0.0)
            return smooth_p(jnp.zeros_like(b), b, pre + post)
        return precond

    def precond(r_p):
        b = jnp.where(maskp, r_p, 0.0)
        x = smooth_p(jnp.zeros_like(b), b, pre)
        r = b - apply_packed(x)
        rd = unpad(r)
        rc = restrict(jnp.where(levels[0].fluid, rd, 0.0))
        rc = jnp.where(levels[1].fluid, rc, 0.0)
        ec = v_cycle(levels, rc, pre=pre, post=post, start=1)
        xd = jnp.where(levels[0].fluid, prolong(ec, n_fine), 0.0)
        x = x + pad(xd)
        return smooth_p(x, b, post)

    return precond
