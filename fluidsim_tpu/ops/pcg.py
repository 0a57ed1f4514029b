"""Jitted preconditioned conjugate gradient over dense grid fields.

Replaces ``Eigen::ConjugateGradient<..., IncompleteCholesky>``
(``fluid.cc:1352,1473-1474``; ``mpm.cc:1283,1404-1405``) with a matrix-free
PCG in a ``lax.while_loop``: the operator is any jittable linear map (the
7-point stencil apply, or an MPM JVP Hessian-vector product), dot products
are masked full-grid reductions, and the preconditioner defaults to Jacobi
(diagonal).  Everything runs on-device; no sparse assembly ever exists.

The quality bar set by the reference is loose (its outer divergence loop only
requires a 0.1 relative error, ``fluid.cc:1484``), but the inner solve runs
to ``rtol`` so the physics doesn't drift from solver noise.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual: jax.Array  # final ||r|| (unpreconditioned)


def _local_sum(x):
    # f32 pairwise tree reduction in XLA is accurate enough at 128^3; promote
    # the accumulator explicitly so bf16 inputs don't lose the sum.
    return jnp.sum(x.astype(jnp.float32))


def pcg(apply_a: Callable, b, x0=None, precond: Callable | None = None,
        rtol: float = 1e-5, atol: float = 0.0, maxiter: int = 200,
        reduce_fn: Callable | None = None) -> PCGResult:
    """Solve ``A x = b`` with (Jacobi-)preconditioned CG.

    Args:
      apply_a: linear operator; any pytree-shaped operand (typically (N,N,N)).
      b: right-hand side (must be in the operator's range-mask already).
      precond: approximate inverse of A (e.g. ``lambda r: r / adiag``).
      reduce_fn: reduction over the local sum — pass
        ``lambda s: jax.lax.psum(s, axis)`` inside ``shard_map`` to make the
        solve distributed; dot products are the only cross-shard coupling
        besides the operator itself.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda r: r
    if reduce_fn is None:
        reduce_fn = lambda s: s

    def _dot(a, c):
        return reduce_fn(_local_sum(a * c))

    def _dot2(a1, c1, a2, c2):
        # Two dot products in ONE reduction round: under shard_map the
        # reduce_fn is a psum — stacking the local sums halves the number
        # of collective latency rounds per CG iteration (3 -> 2 total).
        s = reduce_fn(jnp.stack([_local_sum(a1 * c1), _local_sum(a2 * c2)]))
        return s[0], s[1]

    bnorm2 = _dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)

    r0 = b - apply_a(x0)
    z0 = precond(r0)
    p0 = z0
    rz0, rr0 = _dot2(r0, z0, r0, r0)

    def cond(state):
        _, _, _, _, rr, k = state
        return (rr > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rz, _, k = state
        ap = apply_a(p)
        denom = _dot(p, ap)
        alpha = jnp.where(denom != 0, rz / jnp.where(denom != 0, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new, rr_new = _dot2(r, z, r, r)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, p, rz_new, rr_new, k + 1

    x, _, _, _, rr, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, rr0, jnp.zeros((), jnp.int32)))
    return PCGResult(x=x, iters=k, residual=jnp.sqrt(rr))


def chebyshev_preconditioner(apply_a, precond_d, degree: int = 3,
                             lam_max: float = 2.0, ratio: float = 30.0):
    """SPD fixed-polynomial preconditioner: z ~= A^{-1} r via ``degree``
    Chebyshev semi-iteration steps with Jacobi splitting (``precond_d`` =
    D^{-1}) on the interval [lam_max/ratio, lam_max] of D^{-1}A.

    Replaces the reference's IncompleteCholesky role (``fluid.cc:1352``)
    with something that stays in the packed stencil layout: the induced
    operator is q(D^{-1/2} A D^{-1/2}) conjugated by D^{-1/2} — symmetric,
    and positive definite when q > 0 on the spectrum (guaranteed by the
    Chebyshev construction on a positive interval).  For the masked 7-point
    pressure Laplacian, Gershgorin gives lam(D^{-1}A) <= 2 exactly
    (adiag >= sum of off-diagonal magnitudes, free surface included), so
    ``lam_max=2`` is safe for any fluid configuration.

    Why this wins over plain Jacobi-PCG even though CG is already optimal:
    each CG iteration costs ~2x the stencil apply in dots/axpys/while-step
    overhead; a degree-d preconditioner runs d+1 applies per iteration and
    cuts the iteration count by ~(d+1), amortizing that fixed overhead.
    """
    a, b = lam_max / ratio, lam_max
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    sigma1 = theta / delta

    def precond(r):
        rho = 1.0 / sigma1
        d = precond_d(r) * (1.0 / theta)
        z = d
        for _ in range(degree - 1):
            resid = r - apply_a(z)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * precond_d(resid)
            z = z + d
            rho = rho_new
        return z

    return precond


def jacobi_preconditioner(diag, mask=None):
    """z = r / diag where diag > 0 (identity elsewhere)."""
    safe = jnp.where(diag > 0, diag, 1.0)

    def apply(r):
        z = r / safe
        if mask is not None:
            z = jnp.where(mask, z, 0.0)
        return z

    return apply
