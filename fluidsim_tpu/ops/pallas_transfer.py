"""Pallas TPU kernels: sorted row scatter/gather as windowed MXU matmuls,
channel-major on the grid side.

XLA's TPU scatter/gather moves one row per index, and every layout change
between (cells, channels) and (channels, cells) costs a ~20 ms relayout at
129^3.  These kernels exploit what XLA cannot know: the row indices are
*sorted* cell ids, so a run of T consecutive particles touches at most T
distinct cells, and after blocking the cell axis into W-cell windows every
(particle-chunk, cell-window) interaction is a dense one-hot contraction
that runs on the MXU:

    gather:   rows[p, :]  = sum_w onehot[p, w] * table[:, bW + w]^T
    scatter:  grid[:, bW + w] = sum_p onehot[p, w] * u[p, :]^T

Grid-side operands are **channel-major** ``(128, n_cells)`` — cells on
lanes — which is exactly the layout the ``pallas_shift`` stencil kernels
want, so the whole fused-transfer pipeline never performs a cell/channel
transpose.  Particle rows stay row-major ``(P_pad, 128)`` with the
particle's flat cell id riding in the last lane as an exact f32 (ids <
2^24).  One-hot operands are exact in bf16, so only the value side needs
``Precision.HIGHEST``; results are exact.

The chunk list (which sorted particle span hits which cell window) is
data-dependent but *shape*-static: at most ceil(P/T) full chunks plus one
partial chunk per window.  The grid runs sequentially (single TensorCore);
read-only windows are double-buffered across grid steps, and accumulation
goes through HBM read-modify-write windows so chunk boundaries that share
an 8-aligned particle-row tile merge correctly: a boundary tile's
already-written rows are re-read and carried through unchanged (their id
lane was zeroed by the first writer, matching no window cell — exactly the
rows the ``valid`` span check masks out).

Semantics match ``table[flat_s]`` / ``zeros.at[flat_s].add(u)`` with sorted
``flat_s`` up to the channel-major layout (tested against both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidsim_tpu.ops.pallas_shift import lane_halo

_ID_LIMIT = 1 << 24  # exact-integer range of f32
_CP = 128            # channel lanes (<= 127 payload channels + id lane)

# One-hot operands are exact in bf16, so the contraction error is set by the
# value side alone: "highest" (6-pass bf16) is bit-exact vs the XLA scatter/
# gather; "split3" splits the value operand into hi+mid+lo bf16 terms
# (24 = 3 x 8 mantissa bits) and runs three native-speed bf16 MXU passes
# against the exact bf16 one-hot — f32-mantissa-exact (<= 1 ulp vs
# "highest", measured 0 on water-cube data) at half the MXU cost.  Mosaic
# rejects Precision.HIGH in-kernel, hence the manual split.
_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "split3": "split3",
               "default": jax.lax.Precision.DEFAULT}


def _split3(x):
    """f32 -> (hi, mid, lo) bf16 with hi+mid+lo == x to f32 mantissa."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_dot(oh, val, dims, prec, oh_is_lhs: bool):
    """dot_general with one 0/1 one-hot operand (exact in bf16) and one f32
    value operand.  ``prec`` "split3" runs three bf16 passes over a
    hi/mid/lo split of the value side; otherwise a single dot_general at
    the given jax precision."""
    lhs, rhs = (oh, val) if oh_is_lhs else (val, oh)
    if prec == "split3":
        ohb = oh.astype(jnp.bfloat16)
        acc = None
        for part in _split3(val):
            l, r = (ohb, part) if oh_is_lhs else (part, ohb)
            d = jax.lax.dot_general(l, r, dims,
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc
    return jax.lax.dot_general(lhs, rhs, dims,
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def build_chunks(flat_s, p: int, ncells: int, w: int, t: int):
    """Static-shape chunk list: sorted particles split at W-cell window
    boundaries, then into <= T-particle chunks.

    Returns (blk, pstart, pend, nlive): (MC,) int32 arrays plus the traced
    number of live chunks; blk == -1 for unused slots.  MC = ceil(P/T) +
    n_blocks (each window adds at most one partial chunk).  Live chunks
    occupy slots [0, nlive), so kernels can run a *dynamic* grid of nlive
    steps and skip the inert tail (unoccupied windows) entirely — at
    129^3 that tail is ~5400 of ~6400 slots.
    """
    nb = _ceil_to(ncells, w) // w
    mc = -(-p // t) + nb
    edges = jnp.arange(nb + 1, dtype=jnp.int32) * w
    bounds = jnp.searchsorted(flat_s, edges).astype(jnp.int32)     # (nb+1,)
    cnt = bounds[1:] - bounds[:-1]
    nch = -(-cnt // t)                                             # ceil
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(nch).astype(jnp.int32)])     # (nb+1,)
    j = jnp.arange(mc, dtype=jnp.int32)
    blk = jnp.searchsorted(cum, j, side="right").astype(jnp.int32) - 1
    blk = jnp.clip(blk, 0, nb - 1)
    pstart = bounds[blk] + (j - cum[blk]) * t
    pend = jnp.minimum(pstart + t, bounds[blk + 1])
    live = (j < cum[nb]) & (pend > pstart)
    blk = jnp.where(live, blk, -1)
    return blk, pstart, pend, cum[nb]


def pad_rows_with_ids(flat_s, values, t: int, idmod: int = 0):
    """(P, C<=127) values -> (P_pad, 128) f32 with the flat id in lane 127
    and enough tail rows that every chunk's 8-aligned (T+8)-row window is in
    range.  Pad-row ids are -1 (match no window cell).  Callers that already
    assemble per-particle channel rows should write into this layout
    directly and only pay for the id lane.

    ``idmod`` > 0 stores the *window-local* id ``flat % idmod`` (use the
    kernels' cell-window size W): local ids are exact in f32 for ANY grid
    size, whereas global ids cap ncells at 2^24.  Rows that bleed into a
    chunk's 8-aligned boundary tile from a *different* window then alias
    local cells, but every wv kernel masks them with the [pstart, pend)
    span check before they contribute.  The span kernels (documentation)
    still require global ids (idmod=0)."""
    p = flat_s.shape[0]
    p_pad = _ceil_to(p, 8) + t + 8
    out = jnp.zeros((p_pad, _CP), jnp.float32)
    if values is not None:
        out = out.at[:p, :values.shape[1]].set(values)
    ids = flat_s % idmod if idmod else flat_s
    ids = jnp.pad(ids, (0, p_pad - p), constant_values=-1)
    return out.at[:, _CP - 1].set(ids.astype(jnp.float32)), p_pad


def attach_ids(values_padded, flat_s):
    """Set the id lane of an existing (P_pad, 128) row buffer."""
    p_pad = values_padded.shape[0]
    ids = jnp.pad(flat_s, (0, p_pad - flat_s.shape[0]), constant_values=-1)
    return values_padded.at[:, _CP - 1].set(ids.astype(jnp.float32))


def _prefetch(j2, mc, blk_ref, start_fn):
    """Start the read-only window DMA for grid step ``j2`` if it is live.
    ``mc`` is ``pl.num_programs(0)`` — the dynamic grid bound — so under a
    live-chunks-only grid the ``blk_ref[j2] >= 0`` check is vacuous but
    keeps the static-grid (interpret) path correct."""
    @pl.when(j2 < mc)
    def _():
        @pl.when(blk_ref[j2] >= 0)
        def _():
            start_fn(j2)


def _gather_kernel(blk_ref, ps_ref, pe_ref, table_hbm, init_ref, out_hbm,
                   tbuf2, rowbuf, sems, *, w, t, wc, prec):
    del init_ref  # aliased with out_hbm (carries the id lane + RMW init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]

    def start_tbuf(j2):
        b2 = blk_ref[j2]
        pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(pl.multiple_of(b2 * w, w), w)],
            tbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        _prefetch(0, mc, blk_ref, start_tbuf)
    _prefetch(j + 1, mc, blk_ref, start_tbuf)

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        a = pl.multiple_of((pstart // 8) * 8, 8)
        tt = t + 8
        slot = j % 2

        cp_o = pltpu.make_async_copy(out_hbm.at[pl.ds(a, tt)], rowbuf,
                                     sems.at[2])
        cp_o.start()
        pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)],
            tbuf2.at[slot], sems.at[slot]).wait()
        cp_o.wait()

        local = (rowbuf[:, _CP - 1:_CP] - jnp.float32(b * w)).astype(jnp.int32)
        gidx = a + jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
        valid = (gidx >= pstart) & (gidx < pend)

        acc = None
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.float32)            # (TT, Wc)
            part = _onehot_dot(
                oh, tbuf2[slot, :, pl.ds(k * wc, wc)],
                (((1,), (1,)), ((), ())), prec,
                oh_is_lhs=True)                                 # (TT, CP)
            acc = part if acc is None else acc + part

        rowbuf[...] = jnp.where(valid, acc, rowbuf[...])
        cp_back = pltpu.make_async_copy(rowbuf, out_hbm.at[pl.ds(a, tt)],
                                        sems.at[2])
        cp_back.start()
        cp_back.wait()


@functools.partial(jax.jit, static_argnames=("w", "t", "wc", "interpret",
                                             "precision", "dynamic_grid"))
def gather_rows_cm(table_cm, init_rows, flat_s, w: int = 512, t: int = 2048,
                   wc: int = 256, interpret: bool = False,
                   precision: str = "highest", dynamic_grid: bool = True):
    """Channel-major gather: ``out[p, c] = table_cm[c, flat_s[p]]`` for
    sorted int32 ``flat_s``.

    table_cm: (128, ncells_pad) float32, cells on lanes (``pallas_shift``
    layout).  init_rows: (P_pad, 128) from ``pad_rows_with_ids`` /
    ``attach_ids`` — donated; the result reuses its buffer.  Returns
    (P_pad, 128); lane 127 is scratch.
    """
    ncells = table_cm.shape[1]
    p = flat_s.shape[0]
    assert ncells < _ID_LIMIT and ncells % w == 0
    p_pad = init_rows.shape[0]
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 8

    return pl.pallas_call(
        functools.partial(_gather_kernel, w=w, t=t, wc=wc,
                          prec=_PRECISIONS[precision]),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((p_pad, _CP), table_cm.dtype),
        scratch_shapes=[pltpu.VMEM((2, _CP, w), jnp.float32),
                        pltpu.VMEM((tt, _CP), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(blk, ps, pe, table_cm, init_rows)


def _scatter_kernel(blk_ref, ps_ref, pe_ref, u_hbm, init_ref, out_hbm,
                    ubuf2, wbuf, sems, *, w, t, wc, prec):
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]

    def start_ubuf(j2):
        a2 = pl.multiple_of((ps_ref[j2] // 8) * 8, 8)
        pltpu.make_async_copy(u_hbm.at[pl.ds(a2, t + 8)],
                              ubuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        _prefetch(0, mc, blk_ref, start_ubuf)
    _prefetch(j + 1, mc, blk_ref, start_ubuf)

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        a = pl.multiple_of((pstart // 8) * 8, 8)
        tt = t + 8
        slot = j % 2

        cp_w = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)], wbuf,
            sems.at[2])
        cp_w.start()
        pltpu.make_async_copy(u_hbm.at[pl.ds(a, tt)], ubuf2.at[slot],
                              sems.at[slot]).wait()
        cp_w.wait()

        local = (ubuf2[slot, :, _CP - 1:_CP]
                 - jnp.float32(b * w)).astype(jnp.int32)        # (TT, 1)
        gidx = a + jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
        valid = (gidx >= pstart) & (gidx < pend)
        um = jnp.where(valid, ubuf2[slot], 0.0)                 # (TT, CP)
        um_split = _split3(um) if prec == "split3" else None

        dims = (((0,), (0,)), ((), ()))
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.float32)            # (TT, Wc)
            if prec == "split3":
                ohb = oh.astype(jnp.bfloat16)
                contrib = None
                for part in um_split:                           # (CP, Wc)
                    d = jax.lax.dot_general(
                        part, ohb, dims,
                        preferred_element_type=jnp.float32)
                    contrib = d if contrib is None else contrib + d
            else:
                contrib = jax.lax.dot_general(
                    um, oh, dims,
                    preferred_element_type=jnp.float32,
                    precision=prec)                             # (CP, Wc)
            wbuf[:, pl.ds(k * wc, wc)] = wbuf[:, pl.ds(k * wc, wc)] + contrib

        cp_back = pltpu.make_async_copy(
            wbuf, out_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)],
            sems.at[2])
        cp_back.start()
        cp_back.wait()


@functools.partial(jax.jit, static_argnames=("ncells", "w", "t", "wc",
                                             "interpret", "precision",
                                             "dynamic_grid"))
def scatter_rows_cm(u_rows, flat_s, ncells: int, w: int = 512, t: int = 2048,
                    wc: int = 256, interpret: bool = False,
                    precision: str = "highest", dynamic_grid: bool = True):
    """Channel-major scatter-add: ``out[c, i] = sum_{flat_s[p]==i} u[p, c]``
    for sorted int32 ``flat_s``.

    u_rows: (P_pad, 128) from ``pad_rows_with_ids`` (id lane 127).  Returns
    (128, ncells) with lane-127's row being garbage (id dot products).
    """
    p = flat_s.shape[0]
    assert ncells < _ID_LIMIT and ncells % w == 0
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 8

    init = jnp.zeros((_CP, ncells), jnp.float32)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, w=w, t=t, wc=wc,
                          prec=_PRECISIONS[precision]),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((_CP, ncells), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tt, _CP), jnp.float32),
                        pltpu.VMEM((_CP, w), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(blk, ps, pe, u_rows, init)


# ---- fused weight/velocity variants ----------------------------------------
#
# The 108 u-channels (w, w*vx, w*vy, w*vz per stencil offset) and the final
# 27-weight G2P contraction are *linear expansions/reductions of 32 packed
# per-particle lanes* (27 weights + [1, vx, vy, vz] + id).  Building the
# (P_pad, 128) u rows in XLA and writing them through HBM cost ~19 ms/frame
# at 2M particles, and the post-gather XLA contraction another HBM round
# trip.  These kernels DMA only the packed 32-lane rows and do the
# expansion/contraction in-kernel with tiny exact 0/1 matmuls:
#
#   u       = (buf @ R) * (buf @ T)      R: repeat w27 4x,  T: tile [1,v] 27x
#   out[,c] = (acc * (buf @ R)) @ S      S: sum lanes j with j % 4 == c
#
# All value selections go through the split3 path, so weights/velocities are
# reproduced exactly; only the final 27-term sums differ from the XLA order
# by f32 rounding.  The G2P mask re-multiply is idempotent (fields are
# pre-masked, mask is exactly 0/1), so num and den are both linear in the
# gathered rows — that is what lets the contraction live in the kernel.

# Packed layout: lanes 0-26 w27, lane 27 the constant 1, lanes 28-30 the
# velocity, lane 127 the flat id.  Rows are 128 lanes wide because Mosaic
# DMA requires lane widths aligned to the (1, 128) tiling — the win over
# the old path is not DMA bytes but skipping the XLA u build, whose
# (P, 27, 4) intermediate lives in a 4-minor-lane layout that relayouts
# catastrophically, and skipping the post-gather XLA contraction round trip.


def pack_wv_rows(flat_s, w27, vel, t: int, aff=None, w: int = 512):
    """(P, 27) weights + (P, 3) velocities [+ (P, 3, 3) affine C] ->
    (P_pad, 128) packed rows.  For APIC pass ``vel`` = veff = v + C e
    (e = base - pos) so channel 4o+c expands to w*(veff + C off_o).

    The id lane holds the WINDOW-LOCAL id ``flat % w`` (w = the wv kernels'
    cell-window size), so grids of any ncells stay f32-exact."""
    p = w27.shape[0]
    vals = [w27, jnp.ones((p, 1), w27.dtype)]
    if vel is not None:
        vals.append(vel)
    if aff is not None:
        vals.append(aff.reshape(p, 9))
    # +128 tail: gather_wv_cm uses 128-aligned windows of t+128 rows
    return pad_rows_with_ids(flat_s, jnp.concatenate(vals, axis=1), t + 128,
                             idmod=w)


def pack_cols(flat_s, w27t, vel, t: int, aff=None, w: int = 512):
    """(27, P) transposed weights + (P, 3) veff [+ (P, 3, 3) affine C] ->
    (nc, P_padl) CHANNEL-MAJOR particle columns (nc = 32 FLIP / 48 APIC),
    window-local id in the last row.

    Row map matches ``pack_wv_rows``' lane map (w 0..26, ones 27, veff
    28..30, C 31..39) so ``_wv_mats_cm`` is just the transposed expansion.

    Why columns: XLA stores (P, small) particle arrays with P minor, so
    assembling the (P_pad, 128) ROW buffer forces GB-scale relayout
    transposes — measured ~12 ms/frame at 129^3/2M, dwarfing the scatter
    kernel itself (~11 ms).  Columns keep every piece in its natural
    layout (the assembly is one fused concat pass) and the kernels DMA
    (nc, T) windows: 4x less traffic than 128-lane rows."""
    p = w27t.shape[1]
    nc = 32 if aff is None else 48
    p_padl = _ceil_to(p, 128) + t + 128
    pieces = [w27t]
    if vel is not None:
        pieces += [jnp.ones((1, p), w27t.dtype), vel.T]
    if aff is not None:
        pieces.append(aff.reshape(p, 9).T)
    body = jnp.concatenate(pieces, axis=0)
    body = jnp.pad(body, ((0, nc - 1 - body.shape[0]), (0, p_padl - p)))
    ids = jnp.pad((flat_s % w).astype(jnp.float32), (0, p_padl - p),
                  constant_values=-1.0)
    return jnp.concatenate([body, ids[None]], axis=0), p_padl


def _off(o, k):
    """k-th component of transfer._OFFSETS[o] from iota arithmetic
    (the offsets enumerate (-1,0,1)^3 in row-major order)."""
    return (o // (3 ** (2 - k))) % 3 - 1


def _wv_mats():
    """In-kernel constant expansion matrices (entries in {-1,0,1}, exact
    in bf16).  ``tm`` includes the APIC affine block (lanes 31-39 hold the
    row-major C matrix): channel 4o+c (c>=1) gets veff_{c-1} plus
    sum_k C[c-1,k]*off_k(o).  FLIP rows carry zeros in those lanes, so the
    same matrix serves both modes."""
    col = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 0)
    live = col < 108
    o, c = col // 4, col % 4
    r = ((row == o) & (col // 4 < 27) & live).astype(jnp.bfloat16)  # w repeat
    tm = jnp.zeros((_CP, _CP), jnp.int32)
    tm = tm + jnp.where(live & (row == 27 + c), 1, 0)      # 1 / veff lanes
    for k in range(3):
        ck = jnp.where(live & (c >= 1) & (row == 31 + 3 * (c - 1) + k),
                       _off(o, k), 0)
        tm = tm + ck
    return r, tm.astype(jnp.bfloat16)


def _wv_mats_cm(nc: int):
    """Transposed ``_wv_mats`` for channel-major column buffers: (CP, nc)
    matrices mapping input ROW (the ``pack_cols`` row map) to output
    channel 4o+c.  The id row (nc - 1) never carries a coefficient."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 0)
    inr = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 1)
    live = (ch < 108) & (inr < nc - 1)
    o, c = ch // 4, ch % 4
    r = ((inr == o) & (o < 27) & live).astype(jnp.bfloat16)
    tm = jnp.where(live & (inr == 27 + c), 1, 0)
    for k in range(3):
        tm = tm + jnp.where(live & (c >= 1) & (inr == 31 + 3 * (c - 1) + k),
                            _off(o, k), 0)
    return r, tm.astype(jnp.bfloat16)


def _wv_expand_cm(buf, r, tm):
    """(nc, TT) columns -> exact channel-major (wrep, u): (CP, TT)."""
    parts = _split3(buf)
    wrep = None
    vtile = None
    dims = (((1,), (0,)), ((), ()))
    for part in parts:
        dw = jax.lax.dot_general(r, part, dims,
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(tm, part, dims,
                                 preferred_element_type=jnp.float32)
        wrep = dw if wrep is None else wrep + dw
        vtile = dv if vtile is None else vtile + dv
    return wrep, wrep * vtile


def _wv_expand(buf, r, tm):
    """(TT, 32) packed rows -> exact (wrep, u): each output column selects a
    single input lane, so the 3-pass split reconstruction is exact."""
    parts = _split3(buf)
    wrep = None
    vtile = None
    for part in parts:
        dw = jax.lax.dot_general(part, r, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(part, tm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        wrep = dw if wrep is None else wrep + dw
        vtile = dv if vtile is None else vtile + dv
    return wrep, wrep * vtile


_SYM_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))

# MPM packed-row lane map (``mpm_pallas.pack_mpm_rows``): the per-particle
# kernel gradient gradW (27 offsets x 3 components, row-major 3o+k) rides in
# lanes [GW0, GW0+81); lanes 31-39 (the APIC block of ``_wv_mats``) are
# zero at pack time so the wv expansion is unaffected, and the force
# scatter reuses them for the per-particle matrix M = -V sigma (written
# fresh before each ``expand='fg'`` call — the wv scatter has already
# consumed the rows by then).  Sharing one (P_pad, 128) buffer instead of
# packing a second force-row buffer saves 2 GB residency at the 255^3 /
# 4M-particle scale.
_GW0 = 40
_M0 = 31


def _gw_mats(gw0: int = _GW0):
    """Per-component gradW expansion matrices: ``(buf @ rk)[:, 4o+c]`` =
    packed lane ``gw0 + 3o + k`` = gradW_k(offset o), for every channel c.
    Exact one-hot selections (entries in {0,1}, exact in bf16)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 0)
    live = col < 108
    o = col // 4
    return [((row == gw0 + 3 * o + k) & live).astype(jnp.bfloat16)
            for k in range(3)]


def _fg_mats(gw0: int = _GW0, m0: int = _M0):
    """Expansion matrices for the force scatter (``expand='fg'``): channel
    4o+c (c < 3) is the product of packed lane m0+3c+k (the per-particle
    3x3 matrix M, row-major) and packed lane gw0+3o+k (gradW_k at offset
    o), summed over k.  Channel 4o+3 stays zero."""
    col = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_CP, _CP), 0)
    live = (col < 108) & (col % 4 < 3)
    o, c = col // 4, col % 4
    rm = [((row == m0 + 3 * c + k) & live).astype(jnp.bfloat16)
          for k in range(3)]
    rg = [((row == gw0 + 3 * o + k) & live).astype(jnp.bfloat16)
          for k in range(3)]
    return rm, rg


def _fg_expand(buf):
    """(TT, 128) packed rows [M 3x3 row-major in lanes _M0.._M0+8; gradW
    row-major 3o+k in lanes _GW0.._GW0+80] -> u with ``u[:, 4o+c] = sum_k
    M[c,k] * gradW_k(o)`` — the MPM force stencil ``f(o) = M gradW(o)``
    (``populateGridForces``, ``mpm.cc:596-644`` with M = -V sigma).  Both
    factors are exact one-hot lane selections; the k-sum is 3 ordered f32
    adds (vs XLA's identical 3-term dot order in ``apply_mat27``)."""
    rm, rg = _fg_mats()
    parts = _split3(buf)
    u = None
    for k in range(3):
        a = None
        b = None
        for part in parts:
            da = jax.lax.dot_general(part, rm[k], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            db = jax.lax.dot_general(part, rg[k], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            a = da if a is None else a + da
            b = db if b is None else b + db
        t = a * b
        u = t if u is None else u + t
    return u


def _gw_mats_cm(nc: int, gw0: int = _GW0):
    """Transposed ``_gw_mats`` for channel-major columns: (CP, nc)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 0)
    inr = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 1)
    live = (ch < 108) & (inr < nc - 1)
    o = ch // 4
    return [((inr == gw0 + 3 * o + k) & live).astype(jnp.bfloat16)
            for k in range(3)]


def _fg_mats_cm(nc: int, gw0: int = _GW0, m0: int = _M0):
    """Transposed ``_fg_mats`` for channel-major columns: (CP, nc) pairs."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 0)
    inr = jax.lax.broadcasted_iota(jnp.int32, (_CP, nc), 1)
    live = (ch < 108) & (ch % 4 < 3) & (inr < nc - 1)
    o, c = ch // 4, ch % 4
    rm = [((inr == m0 + 3 * c + k) & live).astype(jnp.bfloat16)
          for k in range(3)]
    rg = [((inr == gw0 + 3 * o + k) & live).astype(jnp.bfloat16)
          for k in range(3)]
    return rm, rg


def _fg_expand_cm(buf):
    """(nc, TT) columns -> channel-major force stencil u (CP, TT):
    ``u[4o+c] = sum_k M[c,k] gradW_k(o)`` (``_fg_expand`` transposed)."""
    rm, rg = _fg_mats_cm(buf.shape[0])
    parts = _split3(buf)
    dims = (((1,), (0,)), ((), ()))
    u = None
    for k in range(3):
        a = None
        b = None
        for part in parts:
            da = jax.lax.dot_general(rm[k], part, dims,
                                     preferred_element_type=jnp.float32)
            db = jax.lax.dot_general(rg[k], part, dims,
                                     preferred_element_type=jnp.float32)
            a = da if a is None else a + da
            b = db if b is None else b + db
        t = a * b
        u = t if u is None else u + t
    return u


def _contract_mat(nout: int):
    """Transposed contraction matrix (nout, 128), entries in {-1,0,1}.

    nout=8 (FLIP/PIC): rows [num_x, num_y, num_z, den, 0...] — row c sums
    gathered channel c over the 27 offsets.

    nout=24 (APIC): the offset moments of the gathered rows —
      row 0         den   = sum_o w*mask
      rows 1-3      vnum_c = sum_o w*f_c
      rows 4-6      mbar_k = sum_o w*mask*off_k
      rows 7-15     F_{c,k} = sum_o w*f_c*off_k       (row 7+3c+k)
      rows 16-21    M_{kl}  = sum_o w*mask*off_k*off_l (sym pairs)
    combined host-side with e = base - pos into the centred B/D fit
    (d_o = e + off_o splits every moment into constant-offset terms).
    """
    colj = jax.lax.broadcasted_iota(jnp.int32, (nout, _CP), 1)
    outr = jax.lax.broadcasted_iota(jnp.int32, (nout, _CP), 0)
    live = colj < 108
    o, c = colj // 4, colj % 4
    if nout == 8:
        return ((c == outr) & live).astype(jnp.bfloat16)
    st = jnp.zeros((nout, _CP), jnp.int32)
    st = st + jnp.where(live & (outr == 0) & (c == 3), 1, 0)
    st = st + jnp.where(live & (outr >= 1) & (outr <= 3)
                        & (c == outr - 1), 1, 0)
    for k in range(3):
        st = st + jnp.where(live & (outr == 4 + k) & (c == 3),
                            _off(o, k), 0)
        for cv in range(3):
            st = st + jnp.where(live & (outr == 7 + 3 * cv + k) & (c == cv),
                                _off(o, k), 0)
    for idx, (k, l) in enumerate(_SYM_PAIRS):
        st = st + jnp.where(live & (outr == 16 + idx) & (c == 3),
                            _off(o, k) * _off(o, l), 0)
    return st.astype(jnp.bfloat16)


def _scatter_wv_kernel(blk_ref, ps_ref, pe_ref, wv_hbm, init_ref, out_hbm,
                       wvbuf2, wbuf, sems, *, w, t, wc):
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]

    def start_wv(j2):
        a2 = pl.multiple_of((ps_ref[j2] // 8) * 8, 8)
        pltpu.make_async_copy(wv_hbm.at[pl.ds(a2, t + 8)],
                              wvbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        _prefetch(0, mc, blk_ref, start_wv)
    _prefetch(j + 1, mc, blk_ref, start_wv)

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        a = pl.multiple_of((pstart // 8) * 8, 8)
        tt = t + 8
        slot = j % 2

        cp_w = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)], wbuf,
            sems.at[2])
        cp_w.start()
        pltpu.make_async_copy(wv_hbm.at[pl.ds(a, tt)], wvbuf2.at[slot],
                              sems.at[slot]).wait()
        cp_w.wait()

        buf = wvbuf2[slot]
        local = (buf[:, _CP - 1:_CP]).astype(jnp.int32)  # window-local   # (TT, 1)
        gidx = a + jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
        valid = (gidx >= pstart) & (gidx < pend)

        r, tm = _wv_mats()
        _, u = _wv_expand(buf, r, tm)                             # (TT, CP)
        um = jnp.where(valid, u, 0.0)
        um_split = _split3(um)

        dims = (((0,), (0,)), ((), ()))
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.bfloat16)             # (TT, Wc)
            contrib = None
            for part in um_split:                                 # (CP, Wc)
                d = jax.lax.dot_general(part, oh, dims,
                                        preferred_element_type=jnp.float32)
                contrib = d if contrib is None else contrib + d
            wbuf[:, pl.ds(k * wc, wc)] = wbuf[:, pl.ds(k * wc, wc)] + contrib

        cp_back = pltpu.make_async_copy(
            wbuf, out_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)],
            sems.at[2])
        cp_back.start()
        cp_back.wait()


@functools.partial(jax.jit, static_argnames=("ncells", "w", "t", "wc",
                                             "interpret", "dynamic_grid"))
def scatter_wv_cm(wv_rows, flat_s, ncells: int, w: int = 512, t: int = 2048,
                  wc: int = 256, interpret: bool = False,
                  dynamic_grid: bool = True):
    """Channel-major scatter-add of in-kernel-built u rows:
    ``out[4o+c, i] = sum_{flat_s[p]==i} w27[p,o] * [1,v][p,c]``.

    wv_rows: (P_pad, 128) from ``pack_wv_rows``.  Returns (128, ncells);
    lanes 108..127 are exactly zero.
    """
    p = flat_s.shape[0]
    assert ncells % w == 0          # window-local ids: no ncells f32 limit
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 8

    init = jnp.zeros((_CP, ncells), jnp.float32)
    return pl.pallas_call(
        functools.partial(_scatter_wv_kernel, w=w, t=t, wc=wc),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((_CP, ncells), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tt, _CP), jnp.float32),
                        pltpu.VMEM((_CP, w), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(blk, ps, pe, wv_rows, init)


def _gather_wv_kernel(blk_ref, ps_ref, pe_ref, table_hbm, wv_hbm, init_ref,
                      out_hbm, tbuf2, wvbuf2, outbuf, sems, *, w, t, wc,
                      nout):
    """Chunk windows here are 128-aligned (not 8-): the channel-major
    (8, P_padL) output is sliced along LANES, and Mosaic DMA lane slices
    must be aligned to the (1, 128) tiling."""
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]
    tt = t + 128

    def start_tbuf(j2):
        b2 = blk_ref[j2]
        pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(pl.multiple_of(b2 * w, w), w)],
            tbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    def start_wv(j2):
        a2 = pl.multiple_of((ps_ref[j2] // 128) * 128, 128)
        pltpu.make_async_copy(wv_hbm.at[pl.ds(a2, tt)],
                              wvbuf2.at[j2 % 2], sems.at[2 + j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        _prefetch(0, mc, blk_ref, start_tbuf)
        _prefetch(0, mc, blk_ref, start_wv)
    _prefetch(j + 1, mc, blk_ref, start_tbuf)
    _prefetch(j + 1, mc, blk_ref, start_wv)

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        a = pl.multiple_of((pstart // 128) * 128, 128)
        slot = j % 2

        cp_o = pltpu.make_async_copy(out_hbm.at[:, pl.ds(a, tt)], outbuf,
                                     sems.at[4])
        cp_o.start()
        pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(pl.multiple_of(b * w, w), w)],
            tbuf2.at[slot], sems.at[slot]).wait()
        pltpu.make_async_copy(wv_hbm.at[pl.ds(a, tt)], wvbuf2.at[slot],
                              sems.at[2 + slot]).wait()
        cp_o.wait()

        buf = wvbuf2[slot]
        local = (buf[:, _CP - 1:_CP]).astype(jnp.int32)  # window-local
        gidx = a + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
        valid = (gidx >= pstart) & (gidx < pend)                  # (1, TT)

        acc = None
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.bfloat16)             # (TT, Wc)
            part = None
            for tpart in _split3(tbuf2[slot, :, pl.ds(k * wc, wc)]):
                d = jax.lax.dot_general(oh, tpart, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                part = d if part is None else part + d
            acc = part if acc is None else acc + part             # (TT, CP)

        r, tm = _wv_mats()
        wrep, _ = _wv_expand(buf, r, tm)
        m = acc * wrep                                            # (TT, CP)

        st = _contract_mat(nout)
        out4 = None
        for mpart in _split3(m):
            d = jax.lax.dot_general(st, mpart, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out4 = d if out4 is None else out4 + d                # (nout, TT)

        outbuf[...] = jnp.where(valid, out4, outbuf[...])
        cp_back = pltpu.make_async_copy(outbuf, out_hbm.at[:, pl.ds(a, tt)],
                                        sems.at[4])
        cp_back.start()
        cp_back.wait()


@functools.partial(jax.jit, static_argnames=("w", "t", "wc", "interpret",
                                             "nout", "dynamic_grid"))
def gather_wv_cm(table_cm, wv_rows, flat_s, w: int = 512, t: int = 2048,
                 wc: int = 256, interpret: bool = False, nout: int = 8,
                 dynamic_grid: bool = True):
    """One-hot gather + in-kernel contraction against ``_contract_mat``.

    nout=8 (default): channel-major (8, P_padL) with rows 0-2 the weighted
    field sums and row 3 the weighted mask sum (the G2P denominator).
    nout=24: the APIC offset moments (see ``_contract_mat``).
    """
    ncells = table_cm.shape[1]
    p = flat_s.shape[0]
    assert ncells % w == 0          # window-local ids: no ncells f32 limit
    p_pad = wv_rows.shape[0]
    assert p_pad >= _ceil_to(p, 8) + t + 136, (
        "wv_rows too short for 128-aligned gather windows — pack with "
        "pack_wv_rows(..., t)")
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 128
    p_padl = _ceil_to(p_pad, 128)

    init = jnp.zeros((nout, p_padl), jnp.float32)
    return pl.pallas_call(
        functools.partial(_gather_wv_kernel, w=w, t=t, wc=wc,
                          nout=nout),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nout, p_padl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, _CP, w), jnp.float32),
                        pltpu.VMEM((2, tt, _CP), jnp.float32),
                        pltpu.VMEM((nout, tt), jnp.float32),
                        pltpu.SemaphoreType.DMA((5,))],
        input_output_aliases={5: 0},
        interpret=interpret,
    )(blk, ps, pe, table_cm, wv_rows, init)


# ---- fused scatter + shift-reduce (no materialized 108-channel grid) -------
#
# ``scatter_wv_cm`` + ``pallas_shift.reduce_haloed`` round-trip a
# (128, ncells) base-cell table through HBM (1.4 GB at 129^3, 4.4 GB at
# 193^3: zero-init write + windowed RMW + a 27-offset re-read with 3x halo
# overlap).  But a window's 108 accumulated channel rows ARE the final
# 4-channel sums of its 3x(W+512) output neighbourhood, just indexed by
# (offset, base lane) instead of (target row, target lane): channel 4o+g of
# base lane j lands at target row r+ox(o), lane j + (oy*n + oz).  This
# kernel keeps the per-window (128, W) accumulator in VMEM, lays its rows
# down as 108 statically-shifted (1, W) adds into a (4, 3, W+512) haloed
# block, and RMWs that block into the (4, XR, LWRP) output — the reverse of
# ``_gather_wv_fused_kernel``'s in-kernel table build.  The intermediate
# never exists; the output is 32x smaller.
#
# Output rows are dynamic (r-1..r+1), and Mosaic forbids dynamic sublane
# stores, so the RMW window is the 8-aligned 16-row band around r and the
# 3 live rows are placed with an exact one-hot row-scatter matmul (the
# mirror of the gather's row-select).  Consecutive chunks' bands overlap;
# correctness needs the band read of chunk j+1 to start after chunk j's
# write-back completed, which the sequential grid + synchronous write give
# (same argument as scatter_wv_cm's shared boundary windows).


def _scatter_wv_fused_kernel(blk_ref, ps_ref, pe_ref, wv_hbm, init_ref,
                             out_hbm, wvbuf2, zbuf, acc3, outwin, sems,
                             *, w, t, wc, n, winrow, expand, cols, lh):
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]

    def start_wv(j2):
        if cols:
            a2 = pl.multiple_of((ps_ref[j2] // 128) * 128, 128)
            pltpu.make_async_copy(wv_hbm.at[:, pl.ds(a2, t + 128)],
                                  wvbuf2.at[j2 % 2], sems.at[j2 % 2]).start()
        else:
            a2 = pl.multiple_of((ps_ref[j2] // 8) * 8, 8)
            pltpu.make_async_copy(wv_hbm.at[pl.ds(a2, t + 8)],
                                  wvbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        _prefetch(0, mc, blk_ref, start_wv)
    _prefetch(j + 1, mc, blk_ref, start_wv)

    # Window-run coalescing: consecutive live chunks share one window b
    # (build_chunks splits window runs into <= T-particle chunks), hence
    # one RMW band.  Read the band into ``outwin`` only on the FIRST chunk
    # of a run and write it back only on the LAST: ``outwin`` (VMEM
    # scratch) persists across sequential grid steps, and the accumulation
    # order (band + c1 + c2 + ...) is exactly the per-chunk RMW's.
    prv = jnp.where(j > 0, blk_ref[jnp.maximum(j - 1, 0)], -2)
    nxt = jnp.where(j + 1 < mc, blk_ref[jnp.minimum(j + 1, mc - 1)], -2)
    first_of_run = prv != b
    last_of_run = nxt != b

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        if cols:
            a = pl.multiple_of((pstart // 128) * 128, 128)
            tt = t + 128
        else:
            a = pl.multiple_of((pstart // 8) * 8, 8)
            tt = t + 8
        slot = j % 2

        r = b // winrow
        a_r = pl.multiple_of(((r - 1) // 8) * 8, 8)
        lane0 = pl.multiple_of((b % winrow) * w, w)   # = padded lane - lh
        # RMW band read: NOT prefetched across grid steps — the previous
        # run's write-back into an overlapping band must land first.
        cp_w = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(a_r, 16), pl.ds(lane0, w + 2 * lh)],
            outwin, sems.at[2])

        @pl.when(first_of_run)
        def _():
            cp_w.start()
        src = (wv_hbm.at[:, pl.ds(a, tt)] if cols
               else wv_hbm.at[pl.ds(a, tt)])
        pltpu.make_async_copy(src, wvbuf2.at[slot], sems.at[slot]).wait()

        buf = wvbuf2[slot]
        if cols:
            # channel-major columns: particles on LANES throughout — the
            # expansion/one-hot math is the rows path transposed, feeding
            # zbuf's (CP, w) layout directly.
            local = (buf[cols - 1:cols, :]).astype(jnp.int32)     # (1, TT)
            gidx = a + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
            valid = (gidx >= pstart) & (gidx < pend)
            if expand == "fg":
                u = _fg_expand_cm(buf)                            # (CP, TT)
            else:
                r_m, tm = _wv_mats_cm(cols)
                _, u = _wv_expand_cm(buf, r_m, tm)                # (CP, TT)
            um_split = _split3(jnp.where(valid, u, 0.0))
            dims = (((1,), (1,)), ((), ()))
            for k in range(w // wc):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (wc, tt), 0)
                        + k * wc)
                oh = (local == iota).astype(jnp.bfloat16)         # (Wc, TT)
                contrib = None
                for part in um_split:                             # (CP, Wc)
                    d = jax.lax.dot_general(part, oh, dims,
                                            preferred_element_type=jnp.float32)
                    contrib = d if contrib is None else contrib + d
                zbuf[:, pl.ds(k * wc, wc)] = contrib
        else:
            local = (buf[:, _CP - 1:_CP]).astype(jnp.int32)  # window-local
            gidx = a + jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
            valid = (gidx >= pstart) & (gidx < pend)

            if expand == "fg":
                u = _fg_expand(buf)                               # (TT, CP)
            else:
                r_m, tm = _wv_mats()
                _, u = _wv_expand(buf, r_m, tm)                   # (TT, CP)
            um = jnp.where(valid, u, 0.0)
            um_split = _split3(um)

            dims = (((0,), (0,)), ((), ()))
            for k in range(w // wc):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1)
                        + k * wc)
                oh = (local == iota).astype(jnp.bfloat16)         # (TT, Wc)
                contrib = None
                for part in um_split:                             # (CP, Wc)
                    d = jax.lax.dot_general(part, oh, dims,
                                            preferred_element_type=jnp.float32)
                    contrib = d if contrib is None else contrib + d
                zbuf[:, pl.ds(k * wc, wc)] = contrib

        # shift-reduce in VMEM: channel 4o+g of base lane j -> target row
        # ox(o)+1 of the 3-row block, lanes [lh+s, lh+s+W) (all static).
        acc3[...] = jnp.zeros_like(acc3[...])
        for o in range(27):
            ox = _off(o, 0)
            s = _off(o, 1) * n + _off(o, 2)
            for g in range(4):
                acc3[g, ox + 1, pl.ds(lh + s, w)] = (
                    acc3[g, ox + 1, pl.ds(lh + s, w)] + zbuf[o * 4 + g, :])

        # one-hot row scatter of the 3 live rows into the 16-row band
        dr = r - 1 - a_r                                          # in [0, 8)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (3, 16), 1)
               == dr + jax.lax.broadcasted_iota(jnp.int32, (3, 16), 0)
               ).astype(jnp.bfloat16)
        @pl.when(first_of_run)
        def _():
            cp_w.wait()
        for g in range(4):
            addg = None
            for part in _split3(acc3[g]):                         # (3, W+2lh)
                d3 = jax.lax.dot_general(sel, part, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                addg = d3 if addg is None else addg + d3          # (16, W+2lh)
            outwin[g] = outwin[g] + addg

        @pl.when(last_of_run)
        def _():
            cp_back = pltpu.make_async_copy(
                outwin,
                out_hbm.at[:, pl.ds(a_r, 16), pl.ds(lane0, w + 2 * lh)],
                sems.at[2])
            cp_back.start()
            cp_back.wait()


@functools.partial(jax.jit, static_argnames=("xr", "lwr", "n", "w", "t",
                                             "wc", "interpret",
                                             "dynamic_grid", "expand",
                                             "cols", "lh"))
def scatter_wv_fused(wv_rows, flat_s, xr: int, lwr: int, n: int,
                     w: int = 512, t: int = 2048, wc: int = 256,
                     interpret: bool = False, dynamic_grid: bool = True,
                     expand: str = "wv", cols: int = 0,
                     lh: int | None = None):
    """Fused ``scatter_wv_cm`` + 27-offset shift-reduce: returns the
    4-channel haloed grid sums directly.

    wv_rows: (P_pad, 128) packed rows (``pack_wv_rows``, window-local ids).
    Returns (4, xr, lwr + 2*lh) float32, lh = ``lane_halo(n)`` — live lanes
    shifted +lh
    (``out[g, x, lh + i] = sum_{o, flat==x*lwr+i-off} w27*[1,v]``); halo
    rows/lanes hold the out-of-box spill the callers slice away.  Matches
    ``reduce_haloed(scatter_wv_cm(...))`` up to f32 summation order.

    ``expand='fg'`` switches the in-kernel channel expansion to the MPM
    force stencil ``u[4o+c] = sum_k M[c,k] gradW_k(o)`` from
    ``mpm_pallas.pack_force_rows`` rows (``_fg_expand``); channels 4o+3 and
    output row 3 are then exactly zero.

    ``cols=nc`` (static) switches the particle input to a ``pack_cols``
    CHANNEL-MAJOR (nc, P_padl) buffer: 4x less DMA per window and no XLA
    relayout on the producer side (see ``pack_cols``); wv expansion only.
    """
    ncells = xr * lwr
    p = flat_s.shape[0]
    lh = lane_halo(n) if lh is None else lh
    assert n + 1 <= lh and lwr % w == 0    # window-local ids: no ncells cap
    winrow = lwr // w
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 128 if cols else t + 8
    wvbuf_shape = (2, cols, tt) if cols else (2, tt, _CP)

    init = jnp.zeros((4, xr, lwr + 2 * lh), jnp.float32)
    return pl.pallas_call(
        functools.partial(_scatter_wv_fused_kernel, w=w, t=t, wc=wc, n=n,
                          winrow=winrow, expand=expand, cols=cols, lh=lh),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, xr, lwr + 2 * lh), jnp.float32),
        scratch_shapes=[pltpu.VMEM(wvbuf_shape, jnp.float32),
                        pltpu.VMEM((_CP, w), jnp.float32),
                        pltpu.VMEM((4, 3, w + 2 * lh), jnp.float32),
                        pltpu.VMEM((4, 16, w + 2 * lh), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(blk, ps, pe, wv_rows, init)


# ---- fused-table gather (no materialized neighbourhood table) --------------
#
# ``expand_haloed`` writes a (128, ncells) table (1.78 GB at 129^3, ~7 ms)
# that the windowed gather then re-reads.  But a gather window is a 512-lane
# range of ONE x-row, and every table channel 4o+g of that window is just a
# *statically shifted* slice of the 4-channel field row r+ox: the table
# never needs to exist.  This kernel DMAs the (4, 16, 1024)-lane field slab
# around the window (same bytes as the old table window), selects rows
# r-1/r/r+1 with an exact one-hot matmul (dynamic sublane indexing of refs
# is not allowed), and lays down the 108 channel rows as static shifted
# slices; the one-hot contraction then proceeds exactly as _gather_wv_kernel.


def _gather_wv_fused_kernel(blk_ref, ps_ref, pe_ref, fm_hbm, wv_hbm, init_ref,
                            out_hbm, fmbuf2, wvbuf2, tablebuf, outbuf, sems,
                            *, w, t, wc, nout, n, winrow, contract, cols, lh):
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    mc = pl.num_programs(0)
    b = blk_ref[j]
    tt = t + 128

    def start_fm(j2):
        b2 = blk_ref[j2]
        r2 = b2 // winrow
        a2 = pl.multiple_of(((r2 - 1) // 8) * 8, 8)
        lane0 = pl.multiple_of((b2 % winrow) * w, w)
        pltpu.make_async_copy(
            fm_hbm.at[:, pl.ds(a2, 16), pl.ds(lane0, w + 2 * lh)],
            fmbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    def start_wv(j2):
        a2 = pl.multiple_of((ps_ref[j2] // 128) * 128, 128)
        src = (wv_hbm.at[:, pl.ds(a2, tt)] if cols
               else wv_hbm.at[pl.ds(a2, tt)])
        pltpu.make_async_copy(src, wvbuf2.at[j2 % 2],
                              sems.at[2 + j2 % 2]).start()

    @pl.when(j == 0)
    def _():
        tablebuf[...] = jnp.zeros_like(tablebuf[...])   # rows >= 108 stay 0
        _prefetch(0, mc, blk_ref, start_fm)
        _prefetch(0, mc, blk_ref, start_wv)
    _prefetch(j + 1, mc, blk_ref, start_fm)
    _prefetch(j + 1, mc, blk_ref, start_wv)

    # Consecutive chunks of one window run share the table: rebuild only on
    # the first chunk of a run (tablebuf persists across grid steps).  The
    # fm slab DMA + wait still run per chunk to keep semaphores balanced.
    rebuild = jnp.where(j > 0, blk_ref[jnp.maximum(j - 1, 0)], -2) != b

    @pl.when(b >= 0)
    def _():
        pstart = ps_ref[j]
        pend = pe_ref[j]
        a = pl.multiple_of((pstart // 128) * 128, 128)
        slot = j % 2

        cp_o = pltpu.make_async_copy(out_hbm.at[:, pl.ds(a, tt)], outbuf,
                                     sems.at[4])
        cp_o.start()
        pltpu.make_async_copy(
            fm_hbm.at[:, pl.ds(pl.multiple_of(
                (((b // winrow) - 1) // 8) * 8, 8), 16),
                pl.ds(pl.multiple_of((b % winrow) * w, w), w + 2 * lh)],
            fmbuf2.at[slot], sems.at[slot]).wait()
        src = (wv_hbm.at[:, pl.ds(a, tt)] if cols
               else wv_hbm.at[pl.ds(a, tt)])
        pltpu.make_async_copy(src, wvbuf2.at[slot],
                              sems.at[2 + slot]).wait()
        cp_o.wait()

        # table window build: rows r-1/r/r+1 of each field channel via an
        # exact one-hot row select (drow = local index of row r-1), then 108
        # statically-shifted (1, W) slices into the table scratch.
        @pl.when(rebuild)
        def _():
            r = b // winrow
            drow = r - 1 - ((r - 1) // 8) * 8               # in [0, 8)
            sel_i = (jax.lax.broadcasted_iota(jnp.int32, (3, 16), 1)
                     == drow + jax.lax.broadcasted_iota(jnp.int32, (3, 16), 0))
            sel = sel_i.astype(jnp.bfloat16)
            rows = []
            for g in range(4):
                acc3 = None
                for part in _split3(fmbuf2[slot, g]):
                    d3 = jax.lax.dot_general(sel, part,
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                    acc3 = d3 if acc3 is None else acc3 + d3
                rows.append(acc3)                           # (3, W + 2lh)
            for o in range(27):
                ox = _off(o, 0)
                s = _off(o, 1) * n + _off(o, 2)
                for g in range(4):
                    tablebuf[o * 4 + g, :] = rows[g][ox + 1,
                                                     lh + s:lh + s + w]

        buf = wvbuf2[slot]
        gidx = a + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
        valid = (gidx >= pstart) & (gidx < pend)                  # (1, TT)

        if cols:
            # channel-major columns: the rows flow transposed end to end
            # (acc/m/out4 all (CP/nout, TT)).
            local = (buf[cols - 1:cols, :]).astype(jnp.int32)     # (1, TT)
            acc = None
            for k in range(w // wc):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (wc, tt), 0)
                        + k * wc)
                oh = (local == iota).astype(jnp.bfloat16)         # (Wc, TT)
                part = None
                for tpart in _split3(tablebuf[:, pl.ds(k * wc, wc)]):
                    d = jax.lax.dot_general(
                        tpart, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    part = d if part is None else part + d
                acc = part if acc is None else acc + part         # (CP, TT)

            dims = (((1,), (0,)), ((), ()))
            if contract == "gw":
                st = _contract_mat(8)
                parts = _split3(buf)
                outs = []
                for rk in _gw_mats_cm(cols):
                    wk = None
                    for part in parts:
                        d = jax.lax.dot_general(
                            rk, part, dims,
                            preferred_element_type=jnp.float32)
                        wk = d if wk is None else wk + d          # (CP, TT)
                    m = acc * wk
                    o8 = None
                    for mpart in _split3(m):
                        d = jax.lax.dot_general(
                            st, mpart, dims,
                            preferred_element_type=jnp.float32)
                        o8 = d if o8 is None else o8 + d          # (8, TT)
                    outs.append(o8[:4])
                out4 = jnp.concatenate(outs + [jnp.zeros_like(outs[0])],
                                       axis=0)
            else:
                r_m, tm = _wv_mats_cm(cols)
                wrep, _ = _wv_expand_cm(buf, r_m, tm)             # (CP, TT)
                m = acc * wrep

                st = _contract_mat(nout)
                out4 = None
                for mpart in _split3(m):
                    d = jax.lax.dot_general(
                        st, mpart, dims,
                        preferred_element_type=jnp.float32)
                    out4 = d if out4 is None else out4 + d        # (nout, TT)
            outbuf[...] = jnp.where(valid, out4, outbuf[...])
            cp_back = pltpu.make_async_copy(
                outbuf, out_hbm.at[:, pl.ds(a, tt)], sems.at[4])
            cp_back.start()
            cp_back.wait()
            return

        local = (buf[:, _CP - 1:_CP]).astype(jnp.int32)  # window-local

        acc = None
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (tt, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.bfloat16)             # (TT, Wc)
            part = None
            for tpart in _split3(tablebuf[:, pl.ds(k * wc, wc)]):
                d = jax.lax.dot_general(oh, tpart, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                part = d if part is None else part + d
            acc = part if acc is None else acc + part             # (TT, CP)

        if contract == "gw":
            # per-component gradW contraction: out rows 4k+c = sum_o
            # gradW_k(o) * field_c(o) (c=3: the mask channel) — the
            # velocity-gradient / Hessian-column gather of
            # ``updateDeformationGradient`` (``mpm.cc:499-537``)
            st = _contract_mat(8)
            parts = _split3(buf)
            outs = []
            for rk in _gw_mats():
                wk = None
                for part in parts:
                    d = jax.lax.dot_general(
                        part, rk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    wk = d if wk is None else wk + d
                m = acc * wk                                      # (TT, CP)
                o8 = None
                for mpart in _split3(m):
                    d = jax.lax.dot_general(
                        st, mpart, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o8 = d if o8 is None else o8 + d              # (8, TT)
                outs.append(o8[:4])
            out4 = jnp.concatenate(outs + [jnp.zeros_like(outs[0])], axis=0)
        else:
            r_m, tm = _wv_mats()
            wrep, _ = _wv_expand(buf, r_m, tm)
            m = acc * wrep                                        # (TT, CP)

            st = _contract_mat(nout)
            out4 = None
            for mpart in _split3(m):
                d = jax.lax.dot_general(st, mpart, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                out4 = d if out4 is None else out4 + d            # (nout, TT)

        outbuf[...] = jnp.where(valid, out4, outbuf[...])
        cp_back = pltpu.make_async_copy(outbuf, out_hbm.at[:, pl.ds(a, tt)],
                                        sems.at[4])
        cp_back.start()
        cp_back.wait()


@functools.partial(jax.jit, static_argnames=("n", "w", "t", "wc", "interpret",
                                             "nout", "dynamic_grid",
                                             "contract", "cols", "lh"))
def gather_wv_fused(fm_hp, wv_rows, flat_s, n: int, w: int = 512,
                    t: int = 2048, wc: int = 256, interpret: bool = False,
                    nout: int = 8, dynamic_grid: bool = True,
                    contract: str = "wv", cols: int = 0,
                    lh: int | None = None):
    """``gather_wv_cm`` over an implicit table: same contract, but takes the
    4-channel haloed field grid directly (lane-padded by an extra
    lh = ``lane_halo(n)`` each side: ``fm_hp[g, x, q] == fm_h[g, x, q - lh]``)
    and builds each window's 108 table channels in-VMEM.  Requires
    |oy*n + oz| <= lh (any n the halo covers — lane_halo grows in 256-lane
    steps) and the windows-per-row layout (LWR % w == 0).

    ``contract='gw'`` (pass nout=16) contracts the gathered channels with
    the THREE per-particle gradW weight vectors from the packed lanes
    (``mpm_pallas.pack_mpm_rows``) instead of w27: rows 4k+c =
    sum_o gradW_k(o) field_c(o); rows 12-15 are zero.

    ``cols=nc`` (static): particle input is a ``pack_cols`` channel-major
    (nc, P_padl) buffer (wv contract only) — 4x less wv DMA per window."""
    lh = lane_halo(n) if lh is None else lh
    xr, lwrp = fm_hp.shape[1], fm_hp.shape[2]
    lwr = lwrp - 2 * lh
    ncells = xr * lwr
    p = flat_s.shape[0]
    assert n + 1 <= lh and lwr % w == 0    # window-local ids: no ncells cap
    winrow = lwr // w
    p_pad = wv_rows.shape[1] if cols else wv_rows.shape[0]
    if cols:
        assert p_pad >= _ceil_to(p, 128) + t + 128, (
            "columns too short for 128-aligned gather windows — pack with "
            "pack_cols(..., t)")
    else:
        assert p_pad >= _ceil_to(p, 8) + t + 136, (
            "wv_rows too short for 128-aligned gather windows — pack with "
            "pack_wv_rows(..., t)")
    blk, ps, pe, nlive = build_chunks(flat_s, p, ncells, w, t)
    mc = blk.shape[0]
    tt = t + 128
    p_padl = _ceil_to(p_pad, 128)
    wvbuf_shape = (2, cols, tt) if cols else (2, tt, _CP)

    init = jnp.zeros((nout, p_padl), jnp.float32)
    return pl.pallas_call(
        functools.partial(_gather_wv_fused_kernel, w=w, t=t, wc=wc,
                          nout=nout, n=n, winrow=winrow, contract=contract,
                          cols=cols, lh=lh),
        grid=(nlive if dynamic_grid and not interpret else mc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nout, p_padl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 4, 16, w + 2 * lh), jnp.float32),
                        pltpu.VMEM(wvbuf_shape, jnp.float32),
                        pltpu.VMEM((_CP, w), jnp.float32),
                        pltpu.VMEM((nout, tt), jnp.float32),
                        pltpu.SemaphoreType.DMA((5,))],
        input_output_aliases={5: 0},
        interpret=interpret,
    )(blk, ps, pe, fm_hp, wv_rows, init)


# ---- span-chunked variants (measured SLOWER; kept as documentation) --------
#
# build_chunks allocates one grid slot per cell WINDOW (plus full chunks),
# so at 129^3 the kernels run ~6400 grid steps of which ~75% are inert
# (unoccupied windows).  The span formulation instead walks ceil(P/T)
# fixed-stride particle chunks and fori_loops over the windows each chunk
# touches; fixed strides also delete the gather's output read-modify-write.
# MEASURED on v5e at 129^3/2M: window-chunk pipeline 11.16 steps/s, spans
# 10.16, spans + double-buffered window DMA 10.68 — the inert grid steps
# are cheaper than the dynamic-trip-count inner loop (Mosaic pipelines the
# static grid better than a data-dependent fori_loop), so the production
# pipeline uses the *_cm window-chunk kernels.  Correctness of both is
# pinned by the interpret-mode tests.


def build_spans(flat_s, p: int, w: int, t: int):
    """Per-chunk touched-window ranges: (blo, bhi) int32 (ceil(P/T),)."""
    nch = -(-p // t)
    starts = jnp.arange(nch, dtype=jnp.int32) * t
    ends = jnp.minimum(starts + t, p) - 1
    return flat_s[starts] // w, flat_s[ends] // w


def _scatter_wv_spans_kernel(blo_ref, bhi_ref, wv_hbm, init_ref, out_hbm,
                             wvbuf2, wbuf2, sems, *, w, t, wc, nch, p):
    """RMW window reads are double-buffered against compute: the chunk's
    first window read starts before the (u-expansion) prologue, and the
    inner loop prefetches window wb+1 into the alternate slot while
    accumulating wb.  Writes stay synchronous, which also makes boundary
    windows shared between consecutive chunks safe (the next chunk's first
    read begins only after this kernel body — all writes — finished)."""
    del init_ref  # aliased with out_hbm (zero init)
    j = pl.program_id(0)
    blo = blo_ref[j]
    bhi = bhi_ref[j]

    def start_wv(j2):
        pltpu.make_async_copy(wv_hbm.at[pl.ds(j2 * t, t)],
                              wvbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    def start_win(wb):
        pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(pl.multiple_of(wb * w, w), w)],
            wbuf2.at[wb % 2], sems.at[2 + wb % 2]).start()

    @pl.when(j == 0)
    def _():
        start_wv(0)
    start_win(blo)
    @pl.when(j + 1 < nch)
    def _():
        start_wv(j + 1)

    slot = j % 2
    pltpu.make_async_copy(wv_hbm.at[pl.ds(j * t, t)], wvbuf2.at[slot],
                          sems.at[slot]).wait()
    buf = wvbuf2[slot]
    local0 = (buf[:, _CP - 1:_CP]).astype(jnp.int32)          # (T, 1) ids
    r, tm = _wv_mats()
    _, u = _wv_expand(buf, r, tm)                             # (T, CP)
    # pad-row ids are -1 and their packed lanes zero, so no valid mask is
    # needed: they match no window cell and contribute exact zeros.
    um_split = _split3(u)

    def body(wb, _):
        ws = wb % 2
        woff = pl.multiple_of(wb * w, w)
        @pl.when(wb < bhi)
        def _():
            start_win(wb + 1)
        pltpu.make_async_copy(out_hbm.at[:, pl.ds(woff, w)],
                              wbuf2.at[ws], sems.at[2 + ws]).wait()
        local = local0 - woff
        dims = (((0,), (0,)), ((), ()))
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (t, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.bfloat16)
            contrib = None
            for part in um_split:
                d = jax.lax.dot_general(part, oh, dims,
                                        preferred_element_type=jnp.float32)
                contrib = d if contrib is None else contrib + d
            wbuf2[ws, :, pl.ds(k * wc, wc)] = (
                wbuf2[ws, :, pl.ds(k * wc, wc)] + contrib)
        cp_b = pltpu.make_async_copy(wbuf2.at[ws],
                                     out_hbm.at[:, pl.ds(woff, w)],
                                     sems.at[4])
        cp_b.start()
        cp_b.wait()
        return 0

    jax.lax.fori_loop(blo, bhi + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("ncells", "w", "t", "wc",
                                             "interpret"))
def scatter_wv_spans(wv_rows, flat_s, ncells: int, w: int = 512,
                     t: int = 2048, wc: int = 256, interpret: bool = False):
    """Span-chunked ``scatter_wv_cm`` (same contract, ~no inert steps).
    Requires GLOBAL-id rows (``pad_rows_with_ids(..., idmod=0)``)."""
    p = flat_s.shape[0]
    assert ncells < _ID_LIMIT and ncells % w == 0
    blo, bhi = build_spans(flat_s, p, w, t)
    nch = blo.shape[0]
    assert wv_rows.shape[0] >= nch * t

    init = jnp.zeros((_CP, ncells), jnp.float32)
    return pl.pallas_call(
        functools.partial(_scatter_wv_spans_kernel, w=w, t=t, wc=wc,
                          nch=nch, p=p),
        grid=(nch,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((_CP, ncells), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, t, _CP), jnp.float32),
                        pltpu.VMEM((2, _CP, w), jnp.float32),
                        pltpu.SemaphoreType.DMA((5,))],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(blo, bhi, wv_rows, init)


def _gather_wv_spans_kernel(blo_ref, bhi_ref, table_hbm, wv_hbm, out_hbm,
                            tbuf2, wvbuf2, outbuf, sems, *, w, t, wc, nch,
                            nout):
    """Table window reads double-buffered against compute; see the scatter
    twin.  Windows are read-only here, so cross-chunk boundary windows need
    no ordering beyond the sequential grid."""
    j = pl.program_id(0)
    blo = blo_ref[j]
    bhi = bhi_ref[j]

    def start_wv(j2):
        pltpu.make_async_copy(wv_hbm.at[pl.ds(j2 * t, t)],
                              wvbuf2.at[j2 % 2], sems.at[j2 % 2]).start()

    def start_win(wb):
        pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(pl.multiple_of(wb * w, w), w)],
            tbuf2.at[wb % 2], sems.at[2 + wb % 2]).start()

    @pl.when(j == 0)
    def _():
        start_wv(0)
    start_win(blo)
    @pl.when(j + 1 < nch)
    def _():
        start_wv(j + 1)

    slot = j % 2
    pltpu.make_async_copy(wv_hbm.at[pl.ds(j * t, t)], wvbuf2.at[slot],
                          sems.at[slot]).wait()
    buf = wvbuf2[slot]
    local0 = (buf[:, _CP - 1:_CP]).astype(jnp.int32)

    def body(wb, acc):
        ws = wb % 2
        woff = pl.multiple_of(wb * w, w)
        @pl.when(wb < bhi)
        def _():
            start_win(wb + 1)
        pltpu.make_async_copy(table_hbm.at[:, pl.ds(woff, w)],
                              tbuf2.at[ws], sems.at[2 + ws]).wait()
        local = local0 - woff
        for k in range(w // wc):
            iota = jax.lax.broadcasted_iota(jnp.int32, (t, wc), 1) + k * wc
            oh = (local == iota).astype(jnp.bfloat16)
            part = None
            for tpart in _split3(tbuf2[ws, :, pl.ds(k * wc, wc)]):
                d = jax.lax.dot_general(oh, tpart, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                part = d if part is None else part + d
            acc = acc + part
        return acc

    acc = jax.lax.fori_loop(blo, bhi + 1, body,
                            jnp.zeros((t, _CP), jnp.float32))

    r, tm = _wv_mats()
    wrep, _ = _wv_expand(buf, r, tm)
    m = acc * wrep
    st = _contract_mat(nout)
    out4 = None
    for mpart in _split3(m):
        d = jax.lax.dot_general(st, mpart, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out4 = d if out4 is None else out4 + d                # (nout, T)
    outbuf[...] = out4
    cp_b = pltpu.make_async_copy(outbuf, out_hbm.at[:, pl.ds(j * t, t)],
                                 sems.at[4])
    cp_b.start()
    cp_b.wait()


@functools.partial(jax.jit, static_argnames=("w", "t", "wc", "interpret",
                                             "nout"))
def gather_wv_spans(table_cm, wv_rows, flat_s, w: int = 512, t: int = 2048,
                    wc: int = 256, interpret: bool = False, nout: int = 8):
    """Span-chunked ``gather_wv_cm``: same contract, no output RMW (fixed
    strides make every output lane window written exactly once).
    Requires GLOBAL-id rows (``pad_rows_with_ids(..., idmod=0)``)."""
    ncells = table_cm.shape[1]
    p = flat_s.shape[0]
    assert ncells < _ID_LIMIT and ncells % w == 0
    blo, bhi = build_spans(flat_s, p, w, t)
    nch = blo.shape[0]
    assert wv_rows.shape[0] >= nch * t
    p_padl = nch * t                     # t is a multiple of 128

    return pl.pallas_call(
        functools.partial(_gather_wv_spans_kernel, w=w, t=t, wc=wc,
                          nch=nch, nout=nout),
        grid=(nch,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nout, p_padl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, _CP, w), jnp.float32),
                        pltpu.VMEM((2, t, _CP), jnp.float32),
                        pltpu.VMEM((nout, t), jnp.float32),
                        pltpu.SemaphoreType.DMA((5,))],
        interpret=interpret,
    )(blo, bhi, table_cm, wv_rows)
