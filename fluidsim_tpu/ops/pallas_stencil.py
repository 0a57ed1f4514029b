"""Pallas TPU kernel: fused 7-point variable-coefficient Laplacian apply.

The XLA formulation of ``ops.pressure.apply_laplacian`` materialises six
shifted copies per application (~0.34 ms/iter at 129^3, ~100 MB of traffic
for 34 MB of live data).  This kernel reads each input row ~once: operand
and diagonal stay in HBM, each grid step DMAs its (bx + 4)-row window into
VMEM, computes all six neighbour terms in registers, and writes its bx-row
output block.

Layout: the CG state lives as ``(Npx, L)`` — x rows by *flattened* y/z
lanes, with ``L = N^2`` padded up to a multiple of 128 so sliced DMAs are
tile-aligned.  y/z neighbours become in-row rolls by ``N`` and ``1``; the
roll wrap-around and the row-tail padding both read zeros exactly where the
true neighbour is a solid wall cell (domain boundaries are always walls), so
no masking of the shifts is needed.  x neighbours come from the window's
halo rows.  The leading ``bx`` rows and a ``>= bx+3``-row tail are zero
padding so the clamped windows of the first/last grid blocks only misalign
rows whose output is masked anyway.

The fluid mask is implied by ``adiag > 0`` (the diagonal is
``scale x #non-solid-neighbours``, positive exactly on fluid cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W = 16  # window slack rows (8-aligned halo on each side)
_LEAD = 8  # leading zero rows


def _kernel(scale_ref, p_hbm, a_hbm, out_hbm, p_buf, a_buf, out_buf, sems,
            *, bx, n, npx, l):
    i = pl.program_id(0)
    scale = scale_ref[0]
    start = i * bx                               # out rows [start, start+bx)
    # 8-aligned window [start-8, start+bx+8), clipped at the array ends; the
    # clip only misaligns blocks that are entirely padding (masked outputs).
    wstart = pl.multiple_of(jnp.clip(start - 8, 0, npx - (bx + _W)), 8)
    d0 = pl.multiple_of(start - wstart, 8)       # in {0, 8, 16}: 8-aligned

    cp_p = pltpu.make_async_copy(p_hbm.at[pl.ds(wstart, bx + _W)], p_buf,
                                 sems.at[0])
    cp_a = pltpu.make_async_copy(a_hbm.at[pl.ds(wstart, bx + _W)], a_buf,
                                 sems.at[1])
    cp_p.start()
    cp_a.start()
    cp_p.wait()
    cp_a.wait()

    def q_at(off, rows):
        off = pl.multiple_of(off, 8)
        return jnp.where(a_buf[pl.ds(off, rows)] > 0,
                         p_buf[pl.ds(off, rows)], 0.0)

    mid = q_at(d0, bx)                                  # (bx, L)
    # x neighbours: shift mid by one row and patch the edge row from the
    # adjacent 8-aligned sub-block.  Patched rows are only ever wrong for
    # blocks that are entirely padding (masked by adiag == 0).
    prev8 = q_at(pl.multiple_of(jnp.maximum(d0 - 8, 0), 8), 8)
    next8 = q_at(pl.multiple_of(jnp.minimum(d0 + bx, bx + _W - 8), 8), 8)
    x_minus = jnp.concatenate([prev8[7:8], mid[:-1]], axis=0)
    x_plus = jnp.concatenate([mid[1:], next8[0:1]], axis=0)
    y_minus = pltpu.roll(mid, n, 1)
    y_plus = pltpu.roll(mid, l - n, 1)
    z_minus = pltpu.roll(mid, 1, 1)
    z_plus = pltpu.roll(mid, l - 1, 1)

    a_mid = a_buf[pl.ds(pl.multiple_of(d0, 8), bx)]
    acc = (a_mid * mid
           - scale * (x_minus + x_plus + y_minus + y_plus + z_minus + z_plus))
    # ANY-space output + manual DMA: with a VMEM-space out block, XLA may
    # stack-allocate the whole (Npx, L) result in scoped VMEM inside large
    # step programs (observed OOM in the APIC step at 129^3); an ANY output
    # gets a plain HBM buffer like the transfer kernels' tables.
    out_buf[...] = jnp.where(a_mid > 0, acc, 0.0)
    cp = pltpu.make_async_copy(out_buf, out_hbm.at[pl.ds(start, bx)],
                               sems.at[2])
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("n", "bx", "interpret"))
def apply_laplacian_padded(p_pad, adiag_pad, scale, n: int, bx: int = 32,
                           interpret: bool = False):
    """``A @ p`` on (Npx, L) padded state arrays (layout from ``pad_x``)."""
    npx, l = p_pad.shape
    assert npx % bx == 0 and l % 128 == 0

    return pl.pallas_call(
        functools.partial(_kernel, bx=bx, n=n, npx=npx, l=l),
        grid=(npx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npx, l), p_pad.dtype),
        scratch_shapes=[pltpu.VMEM((bx + _W, l), p_pad.dtype),
                        pltpu.VMEM((bx + _W, l), p_pad.dtype),
                        pltpu.VMEM((bx, l), p_pad.dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(jnp.asarray([scale], p_pad.dtype), p_pad, adiag_pad)


def pick_bx(n: int, cap: int = 32, budget_bytes: int = 9_000_000,
            scratch_rows=None):
    """Largest block size whose scoped-VMEM scratch fits on the chip.

    The plain apply's scratch is two (bx+16, L)-row windows plus a (bx, L)
    out buffer (3bx+32 rows), L = roundup(N^2, 128) — it scales with the
    grid's y/z plane.  ``scratch_rows``: override the rows-per-bx model —
    the fused Chebyshev-step kernel carries 4 extra (bx, L) blocks
    (6bx+32 rows; at 193^3/bx=8 that is 11.96 MB and the compiler's stack
    extras push the scoped footprint to 16.6 MB > the 16 MB limit, so the
    solve must fall to the lane-blocked layout there).
    The 9 MB budget is empirical, not the nominal 16 MB: Mosaic/XLA add
    stack allocations of their own (193^3 at bx=16 reported a 22.7 MB
    scoped footprint for an 11.96 MB scratch), and the largest validated
    configurations are 129^3 @ bx=32 (8.58 MB) and 193^3 @ bx=8 (8.37 MB).
    """
    l = -(-(n * n) // 128) * 128
    rows = scratch_rows or (lambda bx: 3 * bx + 32)
    for bx in (32, 16, 8):
        if bx <= cap and rows(bx) * l * 4 <= budget_bytes:
            return bx
    raise ValueError(
        f"no stencil block size fits scoped VMEM at N={n} "
        f"(L={l}; use the lane-blocked layout — pick_layout)")


# ---- lane-blocked variant (grids whose full y/z plane exceeds VMEM) --------
#
# Past ~200^3 a full (bx+16, L)-row window no longer fits scoped VMEM, so
# the grid gains a second (lane) dimension: rows carry a zero lane halo of
# ``lane_halo(n)`` on each side (>= the widest in-row neighbour shift,
# y = +-n; 256 lanes up to 255^3, 512 for 257^3-class grids, ...) and every
# neighbour becomes a STATIC lane slice of the block's
# (bx+16, lblk+2*lh) window instead of a full-row roll.  Halo lanes read
# zeros exactly where the true neighbour is a solid wall (same argument as
# the roll wrap-around); interior block edges read the real neighbour
# values from the adjacent block's lanes via the window overlap.  Edge lane
# blocks re-zero their halo lanes on output so every CG vector keeps
# exactly-zero halos without a separate init pass.

_LHS = 256  # minimum lane halo (>= max in-row shift n; 128-aligned)


def lane_halo_s(n: int) -> int:
    """Stencil lane halo: smallest multiple of 256 covering the widest
    in-row shift (y = +-n) — matches ``pallas_shift.lane_halo``."""
    return max(_LHS, -(-(n + 1) // 256) * 256)


def _kernel_lh(scale_ref, p_hbm, a_hbm, out_hbm, p_buf, a_buf, out_buf, sems,
               *, bx, n, npx, lblk, nlb, lh):
    i = pl.program_id(0)
    jj = pl.program_id(1)
    scale = scale_ref[0]
    start = i * bx
    wstart = pl.multiple_of(jnp.clip(start - 8, 0, npx - (bx + _W)), 8)
    d0 = pl.multiple_of(start - wstart, 8)
    lw = lblk + 2 * lh

    cp_p = pltpu.make_async_copy(
        p_hbm.at[pl.ds(wstart, bx + _W), pl.ds(jj * lblk, lw)], p_buf,
        sems.at[0])
    cp_a = pltpu.make_async_copy(
        a_hbm.at[pl.ds(wstart, bx + _W), pl.ds(jj * lblk, lw)], a_buf,
        sems.at[1])
    cp_p.start()
    cp_a.start()
    cp_p.wait()
    cp_a.wait()

    def q_at(off, rows):
        off = pl.multiple_of(off, 8)
        return jnp.where(a_buf[pl.ds(off, rows)] > 0,
                         p_buf[pl.ds(off, rows)], 0.0)       # (rows, LW)

    q = q_at(d0, bx)
    mid = q[:, lh:lh + lblk]
    prev8 = q_at(pl.multiple_of(jnp.maximum(d0 - 8, 0), 8), 8)
    next8 = q_at(pl.multiple_of(jnp.minimum(d0 + bx, bx + _W - 8), 8), 8)
    x_minus = jnp.concatenate([prev8[7:8, lh:lh + lblk], mid[:-1]], 0)
    x_plus = jnp.concatenate([mid[1:], next8[0:1, lh:lh + lblk]], 0)
    y_minus = q[:, lh - n:lh - n + lblk]     # out[l] = q[l - n]
    y_plus = q[:, lh + n:lh + n + lblk]
    z_minus = q[:, lh - 1:lh - 1 + lblk]
    z_plus = q[:, lh + 1:lh + 1 + lblk]

    a_mid = a_buf[pl.ds(pl.multiple_of(d0, 8), bx), lh:lh + lblk]
    acc = (a_mid * mid
           - scale * (x_minus + x_plus + y_minus + y_plus + z_minus + z_plus))
    out_buf[:, lh:lh + lblk] = jnp.where(a_mid > 0, acc, 0.0)
    cp = pltpu.make_async_copy(
        out_buf.at[:, pl.ds(lh, lblk)],
        out_hbm.at[pl.ds(start, bx), pl.ds(lh + jj * lblk, lblk)],
        sems.at[2])
    cp.start()

    # edge lane blocks also (re-)zero their row range's halo lanes so CG
    # vectors produced by this apply keep exactly-zero halos
    out_buf[:, :lh] = jnp.zeros_like(out_buf[:, :lh])

    @pl.when(jj == 0)
    def _():
        cp_l = pltpu.make_async_copy(
            out_buf.at[:, pl.ds(0, lh)],
            out_hbm.at[pl.ds(start, bx), pl.ds(0, lh)], sems.at[1])
        cp_l.start()
        cp_l.wait()

    @pl.when(jj == nlb - 1)
    def _():
        cp_r = pltpu.make_async_copy(
            out_buf.at[:, pl.ds(0, lh)],
            out_hbm.at[pl.ds(start, bx), pl.ds(lh + nlb * lblk, lh)],
            sems.at[1])
        cp_r.start()
        cp_r.wait()

    cp.wait()


@functools.partial(jax.jit, static_argnames=("n", "bx", "lblk",
                                             "interpret"))
def apply_laplacian_padded_lh(p_pad, adiag_pad, scale, n: int, bx: int = 32,
                              lblk: int = 8192, interpret: bool = False):
    """``A @ p`` on (Npx, 256 + Lp + 256) lane-haloed state arrays
    (layout from ``pad_x_lh``)."""
    lh = lane_halo_s(n)
    npx, lwr = p_pad.shape
    lp = lwr - 2 * lh
    assert npx % bx == 0 and lp % lblk == 0 and n < lh

    return pl.pallas_call(
        functools.partial(_kernel_lh, bx=bx, n=n, npx=npx, lblk=lblk,
                          nlb=lp // lblk, lh=lh),
        grid=(npx // bx, lp // lblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npx, lwr), p_pad.dtype),
        scratch_shapes=[pltpu.VMEM((bx + _W, lblk + 2 * lh), p_pad.dtype),
                        pltpu.VMEM((bx + _W, lblk + 2 * lh), p_pad.dtype),
                        pltpu.VMEM((bx, lblk + 2 * lh), p_pad.dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(jnp.asarray([scale], p_pad.dtype), p_pad, adiag_pad)


def pad_x_lh(a, bx: int = 32, lblk: int = 8192):
    """(N,N,N) -> (Npx, lh + Lp + lh), Lp = roundup(N^2, lblk),
    lh = lane_halo_s(N); zero lane halos, 8 leading zero rows, >= bx+8-row
    zero tail."""
    n = a.shape[0]
    lh = lane_halo_s(n)
    lp = -(-(n * n) // lblk) * lblk
    npx = -(-(8 + n + bx + 8) // bx) * bx
    flat = a.reshape(n, n * n)
    flat = jnp.pad(flat, ((0, 0), (lh, lp - n * n + lh)))
    return jnp.pad(flat, ((8, npx - n - 8), (0, 0)))


def unpad_x_lh(a_pad, n: int, bx: int = 32, lblk: int = 8192):
    lh = lane_halo_s(n)
    return a_pad[8:8 + n, lh:lh + n * n].reshape(n, n, n)


def pick_layout(n: int, cap: int = 32, cheb_fused: bool = False):
    """(mode, bx, lblk) for the packed solve: the full-row kernel where its
    scratch fits scoped VMEM, the lane-blocked kernel beyond (lane halo
    grows with n — ``lane_halo_s`` — so any n the HBM fits is legal).
    ``cheb_fused``: size for the fused Chebyshev-step kernel's larger
    scratch (6bx+32 rows — see ``pick_bx``): 129^3 stays row @ bx=16,
    193^3 falls to the lane-blocked layout."""
    rows = (lambda bx: 6 * bx + 32) if cheb_fused else None
    try:
        return ("row", pick_bx(n, cap=cap, scratch_rows=rows), 0)
    except ValueError:
        return ("lane", min(cap, 32), 8192)


def pad_x(a, bx: int = 32):
    """(N,N,N) -> (Npx, L): rows [8, 8+N) hold the flattened y/z planes,
    zero-padded to L = roundup(N^2, 128) lanes; 8 leading zero rows and a
    >= bx+8-row zero tail (so the first/last blocks are padding-dominated
    wherever the clipped windows misalign)."""
    n = a.shape[0]
    l = -(-(n * n) // 128) * 128
    npx = -(-(8 + n + bx + 8) // bx) * bx
    flat = a.reshape(n, n * n)
    flat = jnp.pad(flat, ((0, 0), (0, l - n * n)))
    return jnp.pad(flat, ((8, npx - n - 8), (0, 0)))


def unpad_x(a_pad, n: int, bx: int = 32):
    return a_pad[8:8 + n, :n * n].reshape(n, n, n)


# ---- fused Chebyshev semi-iteration step -----------------------------------
#
# One inner step of the Chebyshev preconditioner
# (``ops.pcg.chebyshev_preconditioner``) is
#
#     resid = r - A z;  d' = c1*d + c2*(resid / adiag);  z' = z + d'
#
# — an apply plus ~4 full-vector elementwise passes when composed from XLA
# ops (~12 HBM sweeps of the packed state per step).  This kernel does the
# whole step in ONE pass: z and adiag stream through the same windows the
# plain apply uses, r and d ride along as halo-free block reads, and both
# outputs write back per block (~7 sweeps).  The c1/c2 scalars come from
# the rho recurrence, which is pure trace-time Python float arithmetic.
# Numerics are identical to the composed form: same f32 ops in the same
# order (masked neighbour sum, then the subtract/divide/axpy chain).

def _kernel_cheb(cs_ref, p_hbm, a_hbm, r_hbm, d_hbm, dn_hbm, zn_hbm,
                 p_buf, a_buf, r_buf, d_buf, dn_buf, zn_buf, sems,
                 *, bx, n, npx, l):
    i = pl.program_id(0)
    scale, c1, c2 = cs_ref[0], cs_ref[1], cs_ref[2]
    start = i * bx
    wstart = pl.multiple_of(jnp.clip(start - 8, 0, npx - (bx + _W)), 8)
    d0 = pl.multiple_of(start - wstart, 8)

    cps = [pltpu.make_async_copy(p_hbm.at[pl.ds(wstart, bx + _W)], p_buf,
                                 sems.at[0]),
           pltpu.make_async_copy(a_hbm.at[pl.ds(wstart, bx + _W)], a_buf,
                                 sems.at[1]),
           pltpu.make_async_copy(r_hbm.at[pl.ds(start, bx)], r_buf,
                                 sems.at[2]),
           pltpu.make_async_copy(d_hbm.at[pl.ds(start, bx)], d_buf,
                                 sems.at[3])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    def q_at(off, rows):
        off = pl.multiple_of(off, 8)
        return jnp.where(a_buf[pl.ds(off, rows)] > 0,
                         p_buf[pl.ds(off, rows)], 0.0)

    mid = q_at(d0, bx)
    prev8 = q_at(pl.multiple_of(jnp.maximum(d0 - 8, 0), 8), 8)
    next8 = q_at(pl.multiple_of(jnp.minimum(d0 + bx, bx + _W - 8), 8), 8)
    x_minus = jnp.concatenate([prev8[7:8], mid[:-1]], axis=0)
    x_plus = jnp.concatenate([mid[1:], next8[0:1]], axis=0)
    y_minus = pltpu.roll(mid, n, 1)
    y_plus = pltpu.roll(mid, l - n, 1)
    z_minus = pltpu.roll(mid, 1, 1)
    z_plus = pltpu.roll(mid, l - 1, 1)

    a_mid = a_buf[pl.ds(pl.multiple_of(d0, 8), bx)]
    az = (a_mid * mid
          - scale * (x_minus + x_plus + y_minus + y_plus + z_minus + z_plus))
    az = jnp.where(a_mid > 0, az, 0.0)
    resid = r_buf[...] - az
    safe = jnp.where(a_mid > 0, a_mid, 1.0)
    pd = jnp.where(a_mid > 0, resid / safe, 0.0)
    dn = c1 * d_buf[...] + c2 * pd
    dn_buf[...] = dn
    zn_buf[...] = mid + dn
    cpo = [pltpu.make_async_copy(dn_buf, dn_hbm.at[pl.ds(start, bx)],
                                 sems.at[0]),
           pltpu.make_async_copy(zn_buf, zn_hbm.at[pl.ds(start, bx)],
                                 sems.at[1])]
    for cp in cpo:
        cp.start()
    for cp in cpo:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("n", "bx", "interpret"))
def cheb_step_padded(z_pad, adiag_pad, r_pad, d_pad, scale, c1, c2, n: int,
                     bx: int = 32, interpret: bool = False):
    """One fused Chebyshev inner step on (Npx, L) padded state; returns
    (d_new, z_new).  ``z`` must already be masked to fluid cells with zero
    padding (every producer in the solve maintains this invariant — the
    kernel re-masks via ``adiag > 0`` anyway, matching the plain apply)."""
    npx, l = z_pad.shape
    assert npx % bx == 0 and l % 128 == 0

    return pl.pallas_call(
        functools.partial(_kernel_cheb, bx=bx, n=n, npx=npx, l=l),
        grid=(npx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((npx, l), z_pad.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((bx + _W, l), z_pad.dtype),
                        pltpu.VMEM((bx + _W, l), z_pad.dtype),
                        pltpu.VMEM((bx, l), z_pad.dtype),
                        pltpu.VMEM((bx, l), z_pad.dtype),
                        pltpu.VMEM((bx, l), z_pad.dtype),
                        pltpu.VMEM((bx, l), z_pad.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(jnp.asarray([scale, c1, c2], z_pad.dtype), z_pad, adiag_pad, r_pad,
      d_pad)


def _kernel_cheb_lh(cs_ref, p_hbm, a_hbm, r_hbm, d_hbm, dn_hbm, zn_hbm,
                    p_buf, a_buf, r_buf, d_buf, dn_buf, zn_buf, sems,
                    *, bx, n, npx, lblk, nlb, lh):
    i = pl.program_id(0)
    jj = pl.program_id(1)
    scale, c1, c2 = cs_ref[0], cs_ref[1], cs_ref[2]
    start = i * bx
    wstart = pl.multiple_of(jnp.clip(start - 8, 0, npx - (bx + _W)), 8)
    d0 = pl.multiple_of(start - wstart, 8)
    lw = lblk + 2 * lh

    cps = [pltpu.make_async_copy(
               p_hbm.at[pl.ds(wstart, bx + _W), pl.ds(jj * lblk, lw)], p_buf,
               sems.at[0]),
           pltpu.make_async_copy(
               a_hbm.at[pl.ds(wstart, bx + _W), pl.ds(jj * lblk, lw)], a_buf,
               sems.at[1]),
           pltpu.make_async_copy(
               r_hbm.at[pl.ds(start, bx), pl.ds(lh + jj * lblk, lblk)],
               r_buf, sems.at[2]),
           pltpu.make_async_copy(
               d_hbm.at[pl.ds(start, bx), pl.ds(lh + jj * lblk, lblk)],
               d_buf, sems.at[3])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    def q_at(off, rows):
        off = pl.multiple_of(off, 8)
        return jnp.where(a_buf[pl.ds(off, rows)] > 0,
                         p_buf[pl.ds(off, rows)], 0.0)

    q = q_at(d0, bx)
    mid = q[:, lh:lh + lblk]
    prev8 = q_at(pl.multiple_of(jnp.maximum(d0 - 8, 0), 8), 8)
    next8 = q_at(pl.multiple_of(jnp.minimum(d0 + bx, bx + _W - 8), 8), 8)
    x_minus = jnp.concatenate([prev8[7:8, lh:lh + lblk], mid[:-1]], 0)
    x_plus = jnp.concatenate([mid[1:], next8[0:1, lh:lh + lblk]], 0)
    y_minus = q[:, lh - n:lh - n + lblk]
    y_plus = q[:, lh + n:lh + n + lblk]
    z_minus = q[:, lh - 1:lh - 1 + lblk]
    z_plus = q[:, lh + 1:lh + 1 + lblk]

    a_mid = a_buf[pl.ds(pl.multiple_of(d0, 8), bx), lh:lh + lblk]
    az = (a_mid * mid
          - scale * (x_minus + x_plus + y_minus + y_plus + z_minus + z_plus))
    az = jnp.where(a_mid > 0, az, 0.0)
    resid = r_buf[...] - az
    safe = jnp.where(a_mid > 0, a_mid, 1.0)
    pd = jnp.where(a_mid > 0, resid / safe, 0.0)
    dn = c1 * d_buf[...] + c2 * pd
    dn_buf[:, lh:lh + lblk] = dn
    zn_buf[:, lh:lh + lblk] = mid + dn
    cpo = [pltpu.make_async_copy(
               dn_buf.at[:, pl.ds(lh, lblk)],
               dn_hbm.at[pl.ds(start, bx), pl.ds(lh + jj * lblk, lblk)],
               sems.at[0]),
           pltpu.make_async_copy(
               zn_buf.at[:, pl.ds(lh, lblk)],
               zn_hbm.at[pl.ds(start, bx), pl.ds(lh + jj * lblk, lblk)],
               sems.at[1])]
    for cp in cpo:
        cp.start()

    # edge lane blocks re-zero the halo lanes of BOTH outputs (the d/z
    # carries must keep exactly-zero halos for the next step's window reads)
    dn_buf[:, :lh] = jnp.zeros_like(dn_buf[:, :lh])

    @pl.when(jj == 0)
    def _():
        for h in (dn_hbm, zn_hbm):
            cp_l = pltpu.make_async_copy(
                dn_buf.at[:, pl.ds(0, lh)],
                h.at[pl.ds(start, bx), pl.ds(0, lh)], sems.at[2])
            cp_l.start()
            cp_l.wait()

    @pl.when(jj == nlb - 1)
    def _():
        for h in (dn_hbm, zn_hbm):
            cp_r = pltpu.make_async_copy(
                dn_buf.at[:, pl.ds(0, lh)],
                h.at[pl.ds(start, bx), pl.ds(lh + nlb * lblk, lh)],
                sems.at[2])
            cp_r.start()
            cp_r.wait()

    for cp in cpo:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("n", "bx", "lblk", "interpret"))
def cheb_step_padded_lh(z_pad, adiag_pad, r_pad, d_pad, scale, c1, c2,
                        n: int, bx: int = 32, lblk: int = 8192,
                        interpret: bool = False):
    """Lane-blocked twin of ``cheb_step_padded`` (layout from ``pad_x_lh``)."""
    lh = lane_halo_s(n)
    npx, lwr = z_pad.shape
    lp = lwr - 2 * lh
    assert npx % bx == 0 and lp % lblk == 0 and n < lh

    return pl.pallas_call(
        functools.partial(_kernel_cheb_lh, bx=bx, n=n, npx=npx, lblk=lblk,
                          nlb=lp // lblk, lh=lh),
        grid=(npx // bx, lp // lblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((npx, lwr), z_pad.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((bx + _W, lblk + 2 * lh), z_pad.dtype),
                        pltpu.VMEM((bx + _W, lblk + 2 * lh), z_pad.dtype),
                        pltpu.VMEM((bx, lblk), z_pad.dtype),
                        pltpu.VMEM((bx, lblk), z_pad.dtype),
                        pltpu.VMEM((bx, lblk + 2 * lh), z_pad.dtype),
                        pltpu.VMEM((bx, lblk + 2 * lh), z_pad.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(jnp.asarray([scale, c1, c2], z_pad.dtype), z_pad, adiag_pad, r_pad,
      d_pad)


def chebyshev_precond_fused(ad_p, scale, n: int, mode: str, bx: int,
                            lblk: int, degree: int = 3, lam_max: float = 2.0,
                            ratio: float = 30.0, interpret: bool = False):
    """Packed-layout Chebyshev preconditioner with FUSED inner steps.

    Same polynomial as ``ops.pcg.chebyshev_preconditioner`` (identical f32
    op order per step — see ``_kernel_cheb``), but each inner step is one
    Pallas pass instead of an apply plus four elementwise sweeps.  The rho
    recurrence is trace-time Python float arithmetic, so every step's
    (c1, c2) pair is a compile-time constant."""
    a, b = lam_max / ratio, lam_max
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    sigma1 = theta / delta
    safe_ad = jnp.where(ad_p > 0, ad_p, 1.0)
    step = cheb_step_padded if mode == "row" else cheb_step_padded_lh
    kw = dict(bx=bx, interpret=interpret) if mode == "row" else dict(
        bx=bx, lblk=lblk, interpret=interpret)

    def precond(r):
        rho = 1.0 / sigma1
        d = jnp.where(ad_p > 0, r / safe_ad, 0.0) * (1.0 / theta)
        z = d
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d, z = step(z, ad_p, r, d, scale, rho_new * rho,
                        2.0 * rho_new / delta, n, **kw)
            rho = rho_new
        return z

    return precond
