"""Batched 3x3 SVD, polar decomposition, and corotated stress.

Replaces the reference's per-particle ``Eigen::JacobiSVD`` calls
(``deformHeader.h:22-36``, ``mpm.cc:545-555``) with batched ``jnp`` ops, and
the hand-derived rotation differential (``getDelR``,
``deformHeader.h:133-147``) with a ``custom_jvp`` on the polar rotation —
which is exactly what makes ``jax.jvp`` of the grid-force function reproduce
the reference's analytic force Hessian (``dPsydFdF``/``getdPsydx2``,
``deformHeader.h:241-272``) without assembling anything.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def svd3(F):
    """Batched SVD of (..., 3, 3).  Thin wrapper for now; a closed-form
    Cardano/Givens Pallas kernel can swap in here without API change."""
    return jnp.linalg.svd(F, full_matrices=False)


@jax.custom_jvp
def polar_rotation(F):
    """R = U V^T (``getR``, ``deformHeader.h:22-28``), batched (..., 3, 3)."""
    U, _, Vt = svd3(F)
    return U @ Vt


def polar_rs(F):
    """(R, S) of the polar decomposition F = R S (one SVD)."""
    U, s, Vt = svd3(F)
    R = U @ Vt
    V = jnp.swapaxes(Vt, -1, -2)
    S = V @ (s[..., :, None] * Vt)
    return R, S


def polar_delta(R, S, dF):
    """Rotation differential dR for a perturbation dF of F = R S — the 3x3
    skew system of ``getDelR`` (``deformHeader.h:133-147``): ``R^T dF -
    dF^T R`` is skew; solve ``M x = [rhs01, rhs02, rhs12]`` with ``M`` built
    from S, then ``dR = R @ skew(x)``.  Linear in ``dF``.

    The 3x3 solve uses the closed-form adjugate inverse (M is symmetric and
    well-conditioned away from degenerate S).
    """
    rhs = jnp.swapaxes(R, -1, -2) @ dF - jnp.swapaxes(dF, -1, -2) @ R
    v = jnp.stack([rhs[..., 0, 1], rhs[..., 0, 2], rhs[..., 1, 2]], axis=-1)
    m = jnp.stack([
        jnp.stack([S[..., 0, 0] + S[..., 1, 1], S[..., 1, 2], -S[..., 0, 2]], axis=-1),
        jnp.stack([S[..., 1, 2], S[..., 0, 0] + S[..., 2, 2], S[..., 0, 1]], axis=-1),
        jnp.stack([-S[..., 0, 2], S[..., 0, 1], S[..., 1, 1] + S[..., 2, 2]], axis=-1),
    ], axis=-2)
    det = det3(m)
    minv = jnp.swapaxes(cofactor3(m), -1, -2) / jnp.where(
        det != 0, det, 1.0)[..., None, None]
    x = (minv @ v[..., None])[..., 0]
    zeros = jnp.zeros_like(x[..., 0])
    k = jnp.stack([
        jnp.stack([zeros, x[..., 0], x[..., 1]], axis=-1),
        jnp.stack([-x[..., 0], zeros, x[..., 2]], axis=-1),
        jnp.stack([-x[..., 1], -x[..., 2], zeros], axis=-1),
    ], axis=-2)
    return R @ k


@polar_rotation.defjvp
def _polar_rotation_jvp(primals, tangents):
    """dR via ``polar_delta`` (linear in dF, so JAX can transpose it)."""
    (F,), (dF,) = primals, tangents
    R, S = polar_rs(F)
    return R, polar_delta(R, S, dF)


def det3(F):
    """Batched determinant of (..., 3, 3)."""
    return (F[..., 0, 0] * (F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1])
            - F[..., 0, 1] * (F[..., 1, 0] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 0])
            + F[..., 0, 2] * (F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0]))


def cofactor3(F):
    """J F^{-T} as the cofactor matrix (``getJFmt``, ``deformHeader.h:227-239``)."""
    c = jnp.stack([
        jnp.stack([F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1],
                   F[..., 1, 2] * F[..., 2, 0] - F[..., 1, 0] * F[..., 2, 2],
                   F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0]], axis=-1),
        jnp.stack([F[..., 0, 2] * F[..., 2, 1] - F[..., 0, 1] * F[..., 2, 2],
                   F[..., 0, 0] * F[..., 2, 2] - F[..., 0, 2] * F[..., 2, 0],
                   F[..., 0, 1] * F[..., 2, 0] - F[..., 0, 0] * F[..., 2, 1]], axis=-1),
        jnp.stack([F[..., 0, 1] * F[..., 1, 2] - F[..., 0, 2] * F[..., 1, 1],
                   F[..., 0, 2] * F[..., 1, 0] - F[..., 0, 0] * F[..., 1, 2],
                   F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]], axis=-1),
    ], axis=-2)
    return c


def piola_corotated(F, mu, lam):
    """First Piola-Kirchhoff stress of the fixed-corotated energy:
    ``P = 2 mu (F - R) + lambda (J - 1) J F^{-T}``.

    With ``sigma = P @ F0^T`` this reproduces ``getSigma``
    (``deformHeader.h:273-313``): ``2mu(FE-R)FE^T + lambda(Je-1)Je I``.
    Differentiating through it (polar_rotation has a custom JVP) reproduces
    ``dPsydFdF`` (``deformHeader.h:241-249``).
    """
    R = polar_rotation(F)
    J = det3(F)
    cof = cofactor3(F)
    return (2.0 * mu[..., None, None] * (F - R)
            + (lam * (J - 1.0))[..., None, None] * cof)


def piola_linearized(FE, mu, lam):
    """Precompute the corotated Piola stress P0 at FE plus a *linear*
    differential closure dP(dF) — one SVD total, hoisted out of the implicit
    solve (the naive route re-ran the SVD + its JVP inside every CG matvec).

    dP matches ``dPsydFdF`` (``deformHeader.h:241-249``):
    ``2 mu dF - 2 mu dR + lam (cof:dF) cof + lam (J-1) dcof``.
    """
    R, S = polar_rs(FE)
    J = det3(FE)
    cof = cofactor3(FE)
    P0 = (2.0 * mu[..., None, None] * (FE - R)
          + (lam * (J - 1.0))[..., None, None] * cof)

    def dP(dF):
        dR = polar_delta(R, S, dF)
        _, dcof = jax.jvp(cofactor3, (FE,), (dF,))   # polynomial jvp: cheap
        cof_dF = jnp.einsum("...ij,...ij->...", cof, dF)
        return (2.0 * mu[..., None, None] * (dF - dR)
                + lam[..., None, None] * (cof_dF[..., None, None] * cof
                                          + (J - 1.0)[..., None, None] * dcof))

    return P0, dP


def hardening(mu0, lam0, eps, Jp, exponent_cap: float | None = None):
    """Exponential hardening (``getSigma``, ``deformHeader.h:275-277``):
    ``mu = mu0 exp(eps (1 - Jp))`` and likewise for lambda.

    ``exponent_cap`` clamps the exponent (a stabiliser beyond the reference:
    runaway plasticity with Jp far from 1 otherwise produces e^40-scale
    stiffness and NaNs; healthy trajectories keep the exponent in [-2, 2]).
    """
    e = eps * (1.0 - Jp)
    if exponent_cap is not None:
        e = jnp.clip(e, -exponent_cap, exponent_cap)
    h = jnp.exp(e)
    return mu0 * h, lam0 * h


def clamp_singular(F, minv, maxv):
    """SVD singular-value clamp (``mpm.cc:545-555``): returns (FE, Vsinv_Ut)
    where ``FE = U clamp(S) V^T`` and ``Vsinv_Ut = V clamp(S)^{-1} U^T``
    (used for ``FP = Vsinv_Ut @ F``)."""
    U, s, Vt = svd3(F)
    sc = jnp.clip(s, minv, maxv)
    fe = U @ (sc[..., :, None] * Vt)
    v_sinv_ut = jnp.swapaxes(Vt, -1, -2) @ (jnp.swapaxes(U, -1, -2) / sc[..., :, None])
    return fe, v_sinv_ut
