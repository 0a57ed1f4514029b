"""Fully-Pallas transfer pipeline for MPM (the MPM twin of
``ops.transfer_pallas``).

Why it exists: XLA's TPU scatter emitter compiles the 108-channel sorted
scatter-add of ``ops.mpm_fast`` in minutes-to-hours once the grid passes the
reference's 31^3 (measured: ONE p2g scatter-add took 191 s to AOT-compile at
63^3; the full step did not finish in 90 min), so scaled MPM scenes were
TPU-blocked.  Every MPM transfer here rides the ``pallas_transfer`` one-hot
MXU kernels instead, which compile in seconds and run at FLIP-pipeline
speed.

Reference semantics covered (cited against /root/reference):

* mass + momentum P2G with the half-cell-shifted MPM kernel
  (``mpm.cc:25-41``; ``interpolate``/``P2Gtransfer``, ``mpm.cc:773-811,
  970-1017``) — one fused 108-channel scatter + in-VMEM shift-reduce.
* per-particle density for the frame-0 volumes (``findVolume``,
  ``mpm.cc:739-772``) — w27-weighted mass gather.
* velocity-gradient gather gradV = sum_i v_i gradW_i^T
  (``updateDeformationGradient``, ``mpm.cc:499-537``) — the ``contract='gw'``
  gather contracts the gathered cells with the three per-particle gradW
  components packed in the row lanes.
* grid elastic force f_i -= V sigma gradW_i (``populateGridForces``,
  ``mpm.cc:596-644``) — the ``expand='fg'`` scatter builds the per-offset
  force M gradW(o) in-kernel from 9 packed matrix lanes + 81 gradW lanes.
* the implicit solve's Hessian-vector product as an explicit LINEAR chain
  gather -> dP -> scatter (``make_force_fns``): ``piola_linearized`` already
  exposes the stress differential as a linear closure, so no ``jax.jvp``
  ever crosses a ``pallas_call`` (Pallas kernels carry no JVP rules).  This
  replaces the reference's hand-assembled Hessian blocks
  (``deformHeader.h:107-272``, ``mpm.cc:647-701``).
* FLIP delta gather (``FLIPadvect``, ``mpm.cc:906-968``) — reuses
  ``transfer_pallas.g2p_pallas`` with the ``mpm`` kernel.

Numerics: identical contractions to ``ops.mpm_fast`` up to f32 summation
order (all selections ride the exact split3/bf16 one-hot path); pinned by
interpret-mode equivalence tests in ``tests/test_mpm_pallas.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidsim_tpu.core.splines import cround
from fluidsim_tpu.ops import pallas_shift as ps
from fluidsim_tpu.ops import pallas_transfer as pt
from fluidsim_tpu.ops import transfer_pallas as tp
from fluidsim_tpu.ops.svd3 import mm3, piola_linearized


def sort_mpm_h(pos, vel, FE, FP, volume, bound: int, layout: tp.HaloLayout):
    """Sort the full MPM particle state by haloed base-cell flat id
    (``transfer_pallas.sort_by_cell_h`` order).

    Implementation note: an 8-operand sort carrying the hot channels
    (key, pos, vel, iota) plus ONE fused row-gather of the remaining 19
    payload columns (FE|FP|vol concatenated) — NOT one wide ``lax.sort``.
    XLA's TPU sort emitter scales pathologically with operand count (a
    26-operand sort was still compiling after 16 minutes), while separate
    per-array gathers are per-row-bound (six of them cost ~340 ms at
    255^3/6.3M rows); this form pays one sequential concat copy to run a
    single gather pass.  Stable-sort order is identical.
    """
    n = 2 * bound + 1
    base = cround(pos).astype(jnp.int32)
    bc = jnp.clip(base + bound, 0, n - 1)
    flat = ((bc[:, 0] + ps._XH) * layout.lwr
            + layout.lh + bc[:, 1] * n + bc[:, 2])
    p = pos.shape[0]
    out = jax.lax.sort(
        [flat, pos[:, 0], pos[:, 1], pos[:, 2],
         vel[:, 0], vel[:, 1], vel[:, 2],
         jnp.arange(p, dtype=jnp.int32)], num_keys=1)
    rest = jnp.take(jnp.concatenate(
        [FE.reshape(p, 9), FP.reshape(p, 9), volume[:, None]], axis=-1),
        out[7], axis=0)
    return (jnp.stack(out[1:4], -1), jnp.stack(out[4:7], -1),
            rest[:, 0:9].reshape(p, 3, 3), rest[:, 9:18].reshape(p, 3, 3),
            rest[:, 18], out[0])


def _mpm_vals_cm(pos, vel, bound: int):
    """(121, C) CHANNEL-MAJOR packed values for a particle block: w27
    (masked), 1, velocity, 9 zero rows (APIC block / later the force M),
    gradW 3o+k — ``pack_mpm_rows``' lane map as rows, built from (C,)
    per-axis pieces (same f32 op order as ``grad_w_mpm`` over
    ``delta = pos - (base + off)``, so values are bitwise identical;
    no lane-padded intermediates or relayout transposes)."""
    from fluidsim_tpu.core.splines import spline2, dspline2

    c = pos.shape[0]
    base = cround(pos)
    wd = []
    gd = []
    for a in range(3):
        wq = []
        gq = []
        for q in range(3):
            s = (pos[:, a] - (base[:, a] + (q - 1))) - 0.5
            wq.append(spline2(s))
            gq.append(-dspline2(s))
        wd.append(wq)
        gd.append(gq)
    vmask = jnp.all(jnp.abs(base) <= bound, axis=-1).astype(pos.dtype)
    rows_w = []
    rows_g = []
    for o in range(27):
        ox, oy, oz = o // 9, (o // 3) % 3, o % 3
        rows_w.append((wd[0][ox] * wd[1][oy] * wd[2][oz] * vmask)[None])
        rows_g += [(gd[0][ox] * wd[1][oy] * wd[2][oz])[None],
                   (wd[0][ox] * gd[1][oy] * wd[2][oz])[None],
                   (wd[0][ox] * wd[1][oy] * gd[2][oz])[None]]
    return jnp.concatenate(
        rows_w + [jnp.ones((1, c), pos.dtype), vel.T,
                  jnp.zeros((pt._GW0 - pt._M0, c), pos.dtype)] + rows_g,
        axis=0)


def pack_mpm_rows(flat_h, pos_s, vel_s, bound: int, t: int = 2048,
                  w: int = 512, chunk: int = 1 << 19):
    """CHANNEL-MAJOR (128, P_padl) columns for the whole MPM frame: rows
    0-26 the (validity-masked) w27, row 27 the constant 1, rows 28-30 the
    velocity, rows 31-39 zero at pack time (the wv expansion's APIC block;
    the force scatter later reuses them for M = -V sigma), rows 40-120
    gradW row-major 3o+k (``pallas_transfer._GW0``), row 127 the
    window-local id.  One buffer serves the p2g scatter (wv expansion),
    the w27 gathers (FLIP delta, density) and the gradW gathers (gradV,
    Hessian columns).

    Columns, not (P_pad, 128) rows: XLA keeps (P, small) particle arrays
    P-minor, so the old row assembly — and the PER-CG-ITERATION
    ``rows.at[:, M0:M0+9].set`` of the force scatter — each forced a
    relayout transpose of the whole buffer (the FLIP finding, see
    ``pallas_transfer.pack_cols``); as columns both are natural-layout
    writes.

    Past ``chunk`` particles the stencil evaluation runs as a lax.scan
    over particle blocks written into the buffer in place (bounding the
    block size bounds XLA's temps at the 255^3 / 4M scale)."""
    p = pos_s.shape[0]
    p_padl = pt._ceil_to(p, 128) + t + 128
    ids = jnp.pad((flat_h % w).astype(jnp.float32), (0, p_padl - p),
                  constant_values=-1.0)
    if p <= chunk:
        vals = _mpm_vals_cm(pos_s, vel_s, bound)           # (121, P)
        body = jnp.pad(vals, ((0, 127 - 121), (0, p_padl - p)))
        return jnp.concatenate([body, ids[None]], axis=0)
    nch = -(-p // chunk)
    pp = nch * chunk
    # The scan buffer must hold every FULL chunk-aligned block: the last
    # block's dynamic_update_slice starts at (nch-1)*chunk and spans a
    # whole chunk, which can exceed p_padl — XLA then silently CLAMPS the
    # start index, landing the block misaligned over the previous one and
    # leaving the true tail zero (measured: ~10% of the cone's mass
    # silently dropped at chunk < p; every >524k-particle MPM run hit
    # this).  Build at max(p_padl, pp) and slice back.
    width = max(p_padl, pp)
    cbody = jnp.zeros((127, width), jnp.float32)
    pos_p = jnp.pad(pos_s, ((0, pp - p), (0, 0)))
    vel_p = jnp.pad(vel_s, ((0, pp - p), (0, 0)))

    def bodyfn(r, i):
        pb = jax.lax.dynamic_slice(pos_p, (i * chunk, 0), (chunk, 3))
        vb = jax.lax.dynamic_slice(vel_p, (i * chunk, 0), (chunk, 3))
        live = (i * chunk + jnp.arange(chunk)) < p   # zero the pad block
        vals = _mpm_vals_cm(pb, vb, bound) * live[None].astype(pb.dtype)
        vals = jnp.pad(vals, ((0, 127 - 121), (0, 0)))
        return jax.lax.dynamic_update_slice(r, vals, (0, i * chunk)), None

    cbody, _ = jax.lax.scan(bodyfn, cbody, jnp.arange(nch, dtype=jnp.int32))
    return jnp.concatenate([cbody[:, :p_padl], ids[None]], axis=0)


def _slice_grid(d4, n: int, lay: tp.HaloLayout):
    """(4, XR, LWR+2lh) fused-scatter output -> (4, n, n, n) live cells."""
    return d4[:, ps._XH:ps._XH + n,
              2 * lay.lh:2 * lay.lh + n * n].reshape(4, n, n, n)


def _fm_hp(fields, mask, n: int, lay: tp.HaloLayout):
    """Masked channel-major haloed field grid for the fused gathers:
    ``fields`` (X,n,n,C<=3), ``mask`` (X,n,n) bool -> (4, XR, LWRP) with the
    mask in channel 3 (``transfer_pallas.g2p_pallas`` layout).  X is n for
    the single-chip cube or the extended slab rows in sharded mode."""
    x = fields.shape[0]
    c = fields.shape[-1]
    chans = [jnp.where(mask, fields[..., d], 0.0).reshape(x, n * n)
             for d in range(c)]
    chans += [jnp.zeros((x, n * n), fields.dtype)] * (3 - c)
    chans.append(mask.astype(fields.dtype).reshape(x, n * n))
    fm = jnp.stack(chans, axis=0)
    return jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - x - ps._XH),
                        (2 * lay.lh, lay.lwr - n * n)))


def p2g_mpm(rows, flat_h, solid, bound: int, lay: tp.HaloLayout,
            interpret: bool = False):
    """Mass + momentum P2G, both masked to ~solid target cells (with the
    standard wall geometry the reference's two masks coincide — see
    ``mpm_fast.p2g_mpm``)."""
    n = 2 * bound + 1
    d4 = pt.scatter_wv_fused(rows, flat_h, lay.xr, lay.lwr, n,
                             interpret=interpret, cols=tp.cols_of(rows))
    accn = _slice_grid(d4, n, lay)
    ns = ~solid
    mass = jnp.where(ns, accn[0], 0.0)
    mom = jnp.stack([jnp.where(ns, accn[1 + d], 0.0) for d in range(3)],
                    axis=-1)
    return mass, mom


def density(mass, rows, flat_h, solid, bound: int, lay: tp.HaloLayout,
            interpret: bool = False):
    """Per-particle density sum_i w_i mass_i over ~solid cells
    (``findVolume``, ``mpm.cc:739-772``)."""
    n = 2 * bound + 1
    p = flat_h.shape[0]
    fm = _fm_hp(mass[..., None], ~solid, n, lay)
    out = pt.gather_wv_fused(fm, rows, flat_h, n, interpret=interpret,
                             cols=tp.cols_of(rows))
    return out[0, :p]


def gradv_gather(velg, rows, flat_h, solid, bound: int, lay: tp.HaloLayout,
                 interpret: bool = False):
    """gradV_p[c, k] = sum_i velg_c(i) gradW_k(i) over ~solid stencil cells
    (``mpm.cc:499-537``)."""
    n = 2 * bound + 1
    p = flat_h.shape[0]
    fm = _fm_hp(velg, ~solid, n, lay)
    out = pt.gather_wv_fused(fm, rows, flat_h, n, nout=16, contract="gw",
                             interpret=interpret, cols=tp.cols_of(rows))
    return jnp.stack([out[4 * k:4 * k + 3, :p].T for k in range(3)], axis=-1)


def flip_delta(pos_s, rows, flat_h, dvc, bound: int, wall: int,
               lay: tp.HaloLayout, interpret: bool = False):
    """FLIP delta with the MPM kernel over within-wall cells
    (``FLIPadvect``, ``mpm.cc:906-968``) — the FLIP-path gather verbatim."""
    return tp.g2p_pallas(pos_s, flat_h, dvc, bound, wall, lay, kernel="mpm",
                         wv_rows=rows, interpret=interpret)


def make_force_fns(pos_s, flat_h, rows, FE, volume, mu, lam,
                   active, solid, bound: int, lay: tp.HaloLayout,
                   interpret: bool = False, hessian: str = "full"):
    """(f0, dforce): the explicit grid force and its exact linearization.

    ``f0()`` equals ``mpm_fast.make_force_fn_fused``'s ``forces(0)``
    (``populateGridForces``, ``mpm.cc:596-644``); ``dforce(u)`` equals its
    ``jax.jvp`` at 0 — but built as an explicit linear chain
    (gradW gather of u over active cells -> ``piola_linearized`` dP ->
    force scatter masked to ~solid), so no jvp crosses a pallas_call.
    Both return (n, n, n, 3) grids.

    ``hessian="hybrid"`` returns ``(f0, dforce_full, dforce_spd)`` — the
    exact operator plus its Gauss-Newton part, sharing the stencil buffer
    and the polar/cofactor precompute (XLA CSE dedups the repeated SVD).
    """
    n = 2 * bound + 1
    p = pos_s.shape[0]
    fe_t = jnp.swapaxes(FE, -1, -2)
    not_solid = ~solid
    hybrid = hessian == "hybrid"
    p0, dp = piola_linearized(FE, mu, lam,
                              "full" if hybrid else hessian)  # one SVD/frame
    valid = jnp.all(jnp.abs(cround(pos_s)) <= bound, axis=-1)
    scale = jnp.where(valid, -volume, 0.0)          # zero dead particles

    def scatter_sigma(sigma):
        m9t = scale[None, :] * sigma.reshape(p, 9).T
        # M rides in the shared columns' (inert-by-now) APIC rows: see the
        # _M0 note in pallas_transfer.  A natural-layout row-block write —
        # the old (P, 128) lane write forced a relayout of the whole
        # buffer on EVERY CG iteration.
        rows_f = rows.at[pt._M0:pt._M0 + 9, :p].set(m9t)
        d4 = pt.scatter_wv_fused(rows_f, flat_h, lay.xr, lay.lwr, n,
                                 interpret=interpret, expand="fg",
                                 cols=tp.cols_of(rows))
        f = jnp.moveaxis(_slice_grid(d4, n, lay)[:3], 0, -1)
        return jnp.where(not_solid[..., None], f, 0.0)

    def f0():
        return scatter_sigma(mm3(p0, fe_t))

    def _dforce_with(dp_):
        def dforce(u):
            fm = _fm_hp(u, active, n, lay)
            out = pt.gather_wv_fused(fm, rows, flat_h, n, nout=16,
                                     contract="gw", interpret=interpret,
                                     cols=tp.cols_of(rows))
            g = jnp.stack([out[4 * k:4 * k + 3, :p].T for k in range(3)],
                          axis=-1)                  # (P, 3, 3)
            return scatter_sigma(mm3(dp_(mm3(g, FE)), fe_t))
        return dforce

    if hybrid:
        _, dp_spd = piola_linearized(FE, mu, lam, "spd")
        return f0, _dforce_with(dp), _dforce_with(dp_spd)
    return f0, _dforce_with(dp)
