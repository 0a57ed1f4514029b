"""Fully-Pallas fused transfer path: sorted one-hot MXU scatter/gather +
single-pass stencil kernels, glued by a shared *haloed channel-major*
layout so no transpose or pad ever touches the 927 MB intermediate.

Layout: cells live in a (XH + X + XH) x (LH + L + LH) haloed plane-major
grid (x rows, flattened y*z lanes; ``pallas_shift`` conventions), and a
cell's *haloed flat id* is its linear index in that layout:

    id(x, y, z) = (x + XH) * LWR  +  LH + y * n + z        (0-based coords)

Sorting particles by this id (same order as the plain flat id) lets the
one-hot scatter (``pallas_transfer``) write the 108-channel base-cell sums
*directly* into the haloed array the shift-reduce kernel reads, and lets
the one-hot gather index the haloed table the expand kernel writes.  The
measured XLA path spends ~100 ms/frame at 129^3 on the dense shifts plus
~46 ms on scatter+gather; this pipeline replaces all of it with four Pallas
kernels totalling ~55 ms.

The packed rows carry *window-local* ids (``flat % W``, always f32-exact),
and the lane halo grows with the grid (``pallas_shift.lane_halo``: 256
lanes for n <= 255, 512 for 257^3-class grids, ...), so grid size is
bounded only by HBM; past that the chunked/sharded paths take over
(``FlipSim`` auto-dispatches).

Semantics are identical to ``transfer_fast`` (tested against it).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fluidsim_tpu.core.splines import cround
from fluidsim_tpu.ops.transfer_fast import _stencil_w
from fluidsim_tpu.ops import pallas_shift as ps
from fluidsim_tpu.ops import pallas_transfer as pt


@dataclasses.dataclass(frozen=True)
class HaloLayout:
    n: int                       # y/z extent (n*n lanes per x row)
    bx: int = 16
    lblk: int = 512
    nx: int | None = None        # x-row extent; None = n (full cube).
    # A slab value (e.g. a shard's nl + 2*halo rows) gives the sharded
    # paths the same kernel layout over their local x-slab.
    lhmin: int = 256             # floor for the lane halo (tests force 512)
    w: int = 512                 # transfer cell-window width (one-hot MXU
                                 # kernels; lwr is padded to a multiple)
    t: int = 2048                # particle chunk rows per window

    @property
    def lh(self) -> int:         # lane halo: >= n + 1, multiple of 256
        return ps.lane_halo(self.n, self.lhmin)

    @property
    def xrows(self) -> int:
        return self.n if self.nx is None else self.nx

    @property
    def l(self) -> int:          # padded y*z lane extent
        base = -(-(self.n * self.n) // self.lblk) * self.lblk
        # keep lwr = 2*lh + l a multiple of the transfer window width
        # (windows-per-row kernel requirement) without growing the lane
        # halo; l stays a multiple of lblk for the stencil kernels
        for _ in range(self.w // self.lblk + 1):
            if (base + 2 * self.lh) % self.w == 0:
                return base
            base += self.lblk
        raise ValueError(f"no l with lwr % {self.w} == 0 from lblk="
                         f"{self.lblk}, lh={self.lh}")

    @property
    def nxb(self) -> int:
        return -(-self.xrows // self.bx) * self.bx

    @property
    def xr(self) -> int:
        return ps._XH + self.nxb + ps._XH

    @property
    def lwr(self) -> int:
        return self.lh + self.l + self.lh

    @property
    def ncells(self) -> int:
        return self.xr * self.lwr


def sort_by_cell_h(pos, vel, bound: int, layout: HaloLayout, extra=None,
                   method: str = "full", interpret: bool = False):
    """Sort particles by the haloed flat id of their base cell (same order
    as ``transfer_fast.sort_by_cell``; different id arithmetic).  ``extra``:
    optional (P, K) payload sorted along (e.g. flattened APIC C).

    Schedule note (measured at 129^3/2M, tunnel-floor-subtracted): the
    16-operand APIC sort costs ~17 ms vs ~4 ms for the 7-operand FLIP
    sort; a 2-operand key+iota sort + row-gather permutes was tried and
    is ~3x WORSE here (~55 ms — 2M-row gathers of 3/9-wide payloads are
    slower than the extra sort operands; the opposite holds for MPM's
    25-column state at <=0.5M particles, ``mpm_pallas.sort_particles``)."""
    n = 2 * bound + 1
    base = cround(pos).astype(jnp.int32)
    bc = jnp.clip(base + bound, 0, n - 1)
    flat = ((bc[:, 0] + ps._XH) * layout.lwr
            + layout.lh + bc[:, 1] * n + bc[:, 2])
    k = 0 if extra is None else extra.shape[1]
    if method == "bucket":
        # window-grouped bucketing (ops.bucket_sort): the kernels only
        # need W-cell window grouping, and frame coherence makes that far
        # cheaper than the full comparison sort (auto-falls back to it)
        from fluidsim_tpu.ops.bucket_sort import bucket_or_sort
        cols = [pos[:, 0], pos[:, 1], pos[:, 2],
                vel[:, 0], vel[:, 1], vel[:, 2]]
        if extra is not None:
            cols += [extra[:, i] for i in range(k)]
        flat_o, co = bucket_or_sort(flat, jnp.stack(cols, axis=0),
                                    interpret=interpret)
        pos_s = jnp.stack([co[0], co[1], co[2]], axis=-1)
        vel_s = jnp.stack([co[3], co[4], co[5]], axis=-1)
        if extra is None:
            return pos_s, vel_s, flat_o
        return pos_s, vel_s, flat_o, jnp.stack(
            [co[6 + i] for i in range(k)], axis=-1)
    ops = [flat, pos[:, 0], pos[:, 1], pos[:, 2],
           vel[:, 0], vel[:, 1], vel[:, 2]]
    if extra is not None:
        ops += [extra[:, i] for i in range(k)]
    out = jax.lax.sort(ops, num_keys=1)
    pos_s = jnp.stack(out[1:4], axis=-1)
    vel_s = jnp.stack(out[4:7], axis=-1)
    if extra is None:
        return pos_s, vel_s, out[0]
    return pos_s, vel_s, out[0], jnp.stack(out[7:7 + k], axis=-1)


def masked_weights(pos_s, bound: int, kernel: str = "flip"):
    """(P, 27) stencil weights, zeroed for out-of-box base cells — computed
    once per frame and shared by both transfer directions."""
    w27 = _stencil_w(pos_s, kernel)
    valid = jnp.all(jnp.abs(cround(pos_s)) <= bound, axis=-1)
    return jnp.where(valid[:, None], w27, 0.0)


def cols_of(buf) -> int:
    """Static channel count of a packed particle buffer: ``pack_cols`` /
    ``pack_mpm_cols`` columns are (nc, P_padl) with P_padl >= 2304, legacy
    rows are (P_pad, 128) — the lane extent tells them apart."""
    return buf.shape[0] if buf.shape[1] != 128 else 0


def masked_weights_cm(pos_s, bound: int, kernel: str = "flip"):
    """(27, P) TRANSPOSED stencil weights — the channel-major twin of
    ``masked_weights``, built from (P,) per-axis pieces so no lane-padded
    (P, 27) intermediate or relayout transpose ever exists (the rows it
    feeds, ``pallas_transfer.pack_cols``, are channel-major too).

    Same f32 ops in the same order as ``_stencil_w`` (pos - (base + off),
    then the x*y*z product), so values are bitwise identical."""
    from fluidsim_tpu.ops.transfer_fast import _KERNELS
    kfn = _KERNELS[kernel]
    base = cround(pos_s)
    valid = jnp.all(jnp.abs(base) <= bound, axis=-1)[None]       # (1, P)
    wax = [[kfn(pos_s[:, a] - (base[:, a] + (q - 1))) for q in range(3)]
           for a in range(3)]
    rows = [(wax[0][o // 9] * wax[1][(o // 3) % 3] * wax[2][o % 3])[None]
            for o in range(27)]
    return jnp.where(valid, jnp.concatenate(rows, axis=0), 0.0)


def p2g_pallas(pos_s, vel_s, flat_h, solid, bound: int,
               layout: HaloLayout | None = None, kernel: str = "flip",
               w27=None, aff=None, interpret: bool = False,
               channel_major: bool = False, fused_scatter: bool = True):
    """Drop-in ``p2g_fused`` (weights, mom, occ) on the Pallas path.

    Also returns the (P_pad, 128) packed particle rows so the g2p kernels
    can reuse them (weights + ids ride along).

    ``aff``: (P, 3, 3) APIC C matrices — momentum channels then expand to
    ``w * (v + C (x_o - x_p))`` entirely in-kernel, with the offset part
    of ``x_o - x_p`` folded into the constant expansion matrix and the
    ``base - pos`` part folded into an effective velocity here.
    """
    n = 2 * bound + 1
    lay = layout or HaloLayout(n)
    p = pos_s.shape[0]

    if aff is not None:
        e = cround(pos_s) - pos_s                       # (P, 3) base - pos
        from fluidsim_tpu.ops.svd3 import mv3
        vel_s = vel_s + mv3(aff, e)
    if fused_scatter:
        # channel-major particle columns + one kernel (per-window
        # accumulate + in-VMEM shift-reduce): neither the (128, ncells)
        # intermediate nor the row buffer's XLA relayout exists (see
        # pallas_transfer.pack_cols); the columns feed the g2p gathers too.
        w27t = (masked_weights_cm(pos_s, bound, kernel) if w27 is None
                else w27.T)
        wv, _ = pt.pack_cols(flat_h, w27t, vel_s, lay.t, aff=aff, w=lay.w)
        d4 = pt.scatter_wv_fused(wv, flat_h, lay.xr, lay.lwr, n,
                                 w=lay.w, t=lay.t, interpret=interpret,
                                 cols=wv.shape[0],
                                 lh=lay.lh)             # (4, XR, LWR+2lh)
        accn = d4[:, ps._XH:ps._XH + n,
                  2 * lay.lh:2 * lay.lh + n * n].reshape(4, n, n, n)
    else:
        if w27 is None:
            w27 = masked_weights(pos_s, bound, kernel)
        wv, _ = pt.pack_wv_rows(flat_h, w27, vel_s, lay.t, aff=aff, w=lay.w)
        d_cm = pt.scatter_wv_cm(wv, flat_h, lay.ncells, w=lay.w,
                                t=lay.t, interpret=interpret)    # (128, NC)
        acc = ps.reduce_haloed(d_cm.reshape(128, lay.xr, lay.lwr), n,
                               bx=lay.bx, lblk=lay.lblk,
                               interpret=interpret, lh=lay.lh)   # (4,nxb,l)
        accn = acc[:, :n, :n * n].reshape(4, n, n, n)

    coords = np.abs(np.arange(-bound, bound + 1))
    win = coords <= bound - 2
    p2g_mask = jnp.asarray(win[:, None, None] & win[None, :, None]
                           & win[None, None, :]) & (~solid)      # fluid.cc:288
    weights = jnp.where(p2g_mask, accn[0], 0.0)
    if channel_major:
        # (3,N,N,N) momentum: stays in the kernel's channel-major layout,
        # skipping the 3-minor transpose the (N,N,N,3) stack costs XLA
        # (~12 ms/frame at 129^3 — see docs/architecture.md ledger).
        mom = jnp.where(p2g_mask[None], accn[1:4], 0.0)
    else:
        mom = jnp.stack([jnp.where(p2g_mask, accn[1 + d], 0.0)
                         for d in range(3)], axis=-1)
    occ = jnp.where(~solid, accn[0], 0.0)                        # fluid.cc:870
    return weights, mom, occ, wv


def g2p_pallas(pos_s, flat_h, fields, bound: int, wall: int,
               layout: HaloLayout | None = None, kernel: str = "flip",
               wv_rows=None, w27=None, interpret: bool = False,
               channel_major: bool = False, fused_table: bool = True):
    """Drop-in ``g2p_fused``: weighted 27-point gather of cell-level
    ``fields`` (N,N,N,C<=3; channel-major (C,N,N,N) with
    ``channel_major=True`` — contiguous per-component slices into the
    kernel's own channel-major table), weight-normalised over within-wall
    cells.

    ``wv_rows``: the packed particle buffer from ``p2g_pallas`` — reused so
    the gather+contraction kernel skips its own pack.  Channel-major
    ``pack_cols`` columns (nc <= 64 rows) and legacy (P_pad, 128) row
    buffers (e.g. the shared MPM rows) are told apart by shape.
    """
    n = 2 * bound + 1
    lay = layout or HaloLayout(n)
    p = pos_s.shape[0]
    c = fields.shape[0] if channel_major else fields.shape[-1]

    coords = np.abs(np.arange(-bound, bound + 1))
    ok = coords <= wall
    within = jnp.asarray(ok[:, None, None] & ok[None, :, None]
                         & ok[None, None, :])
    wf = within.astype(fields.dtype)
    chans = [jnp.where(within,
                       fields[d] if channel_major else fields[..., d],
                       0.0).reshape(n, n * n)
             for d in range(c)]
    chans += [jnp.zeros((n, n * n), fields.dtype)] * (3 - c)
    chans.append(wf.reshape(n, n * n))                           # mask last
    fm = jnp.stack(chans, axis=0)                                # (4, n, n^2)

    if wv_rows is not None and not fused_table and cols_of(wv_rows):
        wv_rows = None            # cols buffer, but gather_wv_cm wants rows
    if wv_rows is None:
        if fused_table:
            w27t = (masked_weights_cm(pos_s, bound, kernel) if w27 is None
                    else w27.T)
            wv_rows, _ = pt.pack_cols(flat_h, w27t, None, lay.t, w=lay.w)
        else:
            if w27 is None:
                w27 = masked_weights(pos_s, bound, kernel)
            wv_rows, _ = pt.pack_wv_rows(flat_h, w27, None, lay.t, w=lay.w)
    if fused_table:
        fm_hp = jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - n - ps._XH),
                             (2 * lay.lh, lay.lwr - n * n)))
        cols = cols_of(wv_rows)
        out = pt.gather_wv_fused(fm_hp, wv_rows, flat_h, n,
                                 w=lay.w, t=lay.t, interpret=interpret,
                                 cols=cols, lh=lay.lh)
    else:
        fm_h = jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - n - ps._XH),
                            (lay.lh, lay.lwr - n * n - lay.lh)))
        table = ps.expand_haloed(fm_h, n, bx=lay.bx, lblk=lay.lblk,
                                 interpret=interpret,
                                 lh=lay.lh)                      # (128,XR,LWR)
        out = pt.gather_wv_cm(table.reshape(128, lay.ncells), wv_rows,
                              flat_h, w=lay.w, t=lay.t,
                              interpret=interpret)
    # rows 0..2: sum_o w*mask*field; row 3: sum_o w*mask (the masked
    # fields are zero wherever the mask is, so the mask re-multiply of the
    # XLA formulation is idempotent and both sums are linear in the rows)
    num = out[:c, :p].T
    den = out[3, :p]
    safe = jnp.where(den != 0, den, 1.0)
    return jnp.where(den[:, None] != 0, num / safe[:, None], 0.0)


def g2p_apic_pallas(pos_s, flat_h, vc, bound: int, wall: int,
                    layout: HaloLayout | None = None, kernel: str = "flip",
                    wv_rows=None, w27=None, interpret: bool = False,
                    channel_major: bool = False, fused_table: bool = True):
    """Drop-in ``apic.g2p_apic`` on the Pallas path: (velocity, C) per
    particle from cell-centred ``vc``.

    The gather kernel emits the 24 offset moments (``pallas_transfer.
    _contract_mat``); the centred B/D affine fit then needs only (P, k)
    arithmetic here because ``d_o = (base - pos) + off_o`` splits every
    moment into a per-particle part and constant-offset parts.  Matches
    ``ops.apic.g2p_apic`` (same centred fit + ridge + adjugate inverse).
    """
    import numpy as _np

    n = 2 * bound + 1
    lay = layout or HaloLayout(n)
    p = pos_s.shape[0]
    c = vc.shape[0] if channel_major else vc.shape[-1]
    assert c == 3

    coords = _np.abs(_np.arange(-bound, bound + 1))
    ok = coords <= wall
    within = jnp.asarray(ok[:, None, None] & ok[None, :, None]
                         & ok[None, None, :])
    wf = within.astype(vc.dtype)
    chans = [jnp.where(within, vc[d] if channel_major else vc[..., d],
                       0.0).reshape(n, n * n)
             for d in range(3)]
    chans.append(wf.reshape(n, n * n))
    fm = jnp.stack(chans, axis=0)

    if wv_rows is not None and not fused_table and cols_of(wv_rows):
        wv_rows = None            # cols buffer, but gather_wv_cm wants rows
    if wv_rows is None:
        if fused_table:
            w27t = (masked_weights_cm(pos_s, bound, kernel) if w27 is None
                    else w27.T)
            wv_rows, _ = pt.pack_cols(flat_h, w27t, None, lay.t, w=lay.w)
        else:
            if w27 is None:
                w27 = masked_weights(pos_s, bound, kernel)
            wv_rows, _ = pt.pack_wv_rows(flat_h, w27, None, lay.t, w=lay.w)
    if fused_table:
        fm_hp = jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - n - ps._XH),
                             (2 * lay.lh, lay.lwr - n * n)))
        cols = cols_of(wv_rows)
        mo = pt.gather_wv_fused(fm_hp, wv_rows, flat_h, n,
                                w=lay.w, t=lay.t, interpret=interpret,
                                nout=24, cols=cols, lh=lay.lh)
    else:
        fm_h = jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - n - ps._XH),
                            (lay.lh, lay.lwr - n * n - lay.lh)))
        table = ps.expand_haloed(fm_h, n, bx=lay.bx, lblk=lay.lblk,
                                 interpret=interpret, lh=lay.lh)
        mo = pt.gather_wv_cm(table.reshape(128, lay.ncells), wv_rows,
                             flat_h, w=lay.w, t=lay.t, interpret=interpret,
                             nout=24)

    den = mo[0, :p]
    vnum = mo[1:4, :p].T                                 # (P, 3)
    mbar_n = mo[4:7, :p].T                               # sum w*mask*off
    f_n = mo[7:16, :p].T.reshape(p, 3, 3)                # sum w*f*off (c,k)
    msym = mo[16:22, :p].T                               # sym pairs of off
    mmat = jnp.stack(
        [jnp.stack([msym[:, 0], msym[:, 1], msym[:, 2]], -1),
         jnp.stack([msym[:, 1], msym[:, 3], msym[:, 4]], -1),
         jnp.stack([msym[:, 2], msym[:, 4], msym[:, 5]], -1)], -2)

    e = cround(pos_s) - pos_s                            # (P, 3) base - pos
    safe = jnp.where(den != 0, den, 1.0)
    vel = jnp.where(den[:, None] != 0, vnum / safe[:, None], 0.0)

    dbar = e + mbar_n / safe[:, None]
    # sum w f d^T = vnum e^T + F;  sum w*mask d d^T = den e e^T
    #   + e mbar^T + mbar e^T + M
    b = ((vnum[:, :, None] * e[:, None, :] + f_n) / safe[:, None, None]
         - vel[:, :, None] * dbar[:, None, :])
    dmat = ((den[:, None, None] * e[:, :, None] * e[:, None, :]
             + e[:, :, None] * mbar_n[:, None, :]
             + mbar_n[:, :, None] * e[:, None, :] + mmat)
            / safe[:, None, None]
            - dbar[:, :, None] * dbar[:, None, :])

    from fluidsim_tpu.ops.svd3 import cofactor3, det3
    eye = jnp.eye(3, dtype=pos_s.dtype)
    dreg = dmat + 1e-3 * eye
    det = det3(dreg)
    inv = jnp.swapaxes(cofactor3(dreg), -1, -2) / det[..., None, None]
    from fluidsim_tpu.ops.svd3 import mm3
    cm = mm3(b, inv)
    cm = jnp.where(den[:, None, None] != 0, cm, 0.0)
    return vel, cm
