"""Window-grouped bucket sort for the Pallas transfer pipeline.

The transfer kernels (``pallas_transfer``) never need a fully sorted
particle order — they need particles GROUPED BY 512-cell WINDOW with the
windows in ascending order:

* ``build_chunks`` binary-searches window EDGES into the id array; since
  every id in window w lies in [wW, (w+1)W), within-window disorder can
  never flip an edge comparison, so the chunk spans stay exact;
* the scatter accumulates a chunk through an order-free one-hot add and
  the gather reads each row independently (window-local ids ride in the
  rows), so within-chunk order is free.

That turns the per-frame 7-operand ``lax.sort`` (11 ms at 129^3/2M,
82 ms at 255^3/9.8M on this chip — an oblivious comparison network) into
a bucketing problem with frame coherence to exploit: particle state is
kept in the previous frame's window-grouped order and the CFL bound
limits motion to <= 1 cell/frame, so a T-particle chunk's new window ids
take only a handful of DISTINCT values (measured: blocked T=512 local
sort is 4-9x cheaper than the full sort).

Algorithm (XLA except the final move kernel):
  1. view the P (padded) rows as (C, T) chunks; ``lax.sort`` each chunk
     locally (cost P log^2 T instead of P log^2 P);
  2. detect the <= RMAX window-runs per chunk (violation -> fall back to
     the full sort, ``lax.cond``);
  3. place runs globally: sort the (C*RMAX) run descriptors by
     (window, chunk) — a tiny sort — and exclusive-cumsum their counts:
     output = runs concatenated in (window, chunk) order, i.e.
     window-grouped;
  4. move the rows with one Pallas kernel over OUTPUT blocks: each block
     is covered by <= EMAX run intersections, and because a run is
     contiguous on both sides, loading a To-wide source block at offset
     ``src_start - dest_start + o*To`` lands every row at its destination
     lane — the kernel is pure DMA + lane-masked selects, no shuffle.

Payload columns travel bit-exactly (int32 keys ride bitcast to f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = jnp.int32(2**30)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _move_kernel(tbl_hbm, in_hbm, out_hbm, tbl, bufs, outb, tsem, sems,
                 osem, *, to, emax, nc):
    """Particle rows are packed (128 // NC)-per-128-lane-row (NC f32
    columns each), because Mosaic DMA slices must cover whole 128-lane
    tiles and 8-aligned sublane offsets.  Each run's source block is
    loaded from the aligned-down row; the residual shift (delta_r rows +
    sub-row particles) is resolved with dynamic ``pltpu.roll``s plus a
    lane-boundary select — no per-element shuffle anywhere.

    Per-block run descriptors (dst, src, cnt) arrive as an HBM table
    (SMEM cannot hold the full pair tables at 10M-particle scale) and are
    DMA'd into SMEM scratch one block ahead; data loads are likewise
    double-buffered, so DMA latency is amortized across the grid."""
    o = pl.program_id(0)
    num = pl.num_programs(0)
    g = 128 // nc                        # particles per 128-lane row
    tor = to // g                        # rows per block
    nrows = tor + 16                     # loaded rows (8-aligned + slack)

    def fetch_tbl(j):
        pltpu.make_async_copy(tbl_hbm.at[pl.ds(j, 1)], tbl.at[j % 2],
                              tsem.at[j % 2]).start()

    def wait_tbl(j):
        pltpu.make_async_copy(tbl_hbm.at[pl.ds(j, 1)], tbl.at[j % 2],
                              tsem.at[j % 2]).wait()

    def run_info(j, slot, e):
        ds = tbl[slot, 0, 0, e]
        src = tbl[slot, 0, 1, e]
        cnt = tbl[slot, 0, 2, e]
        base = j * to
        a = jnp.maximum(ds - base, 0)
        l = jnp.minimum(ds + cnt - base, to) - a
        s0p = src - ds + base + to                    # +to front padding
        r0 = s0p // g
        r0a = pl.multiple_of((r0 // 8) * 8, 8)
        return a, l, r0 - r0a, (s0p % g) * nc, r0a

    def start_loads(j, slot):
        for e in range(emax):
            _, l, _, _, r0a = run_info(j, slot, e)

            @pl.when(l > 0)
            def _(e=e, r0a=r0a):
                pltpu.make_async_copy(in_hbm.at[pl.ds(r0a, nrows)],
                                      bufs.at[slot, e],
                                      sems.at[slot, e]).start()

    @pl.when(o == 0)
    def _():
        fetch_tbl(0)
        wait_tbl(0)
        start_loads(0, 0)

    @pl.when(o + 1 < num)
    def _():
        fetch_tbl(o + 1)
        wait_tbl(o + 1)
        start_loads(o + 1, (o + 1) % 2)

    slot = o % 2
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tor, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (tor, 128), 1)
    pidx = rows_i * g + lane_i // nc
    acc = jnp.zeros((tor, 128), jnp.float32)
    for e in range(emax):
        a, l, dr, dl, _ = run_info(o, slot, e)

        @pl.when(l > 0)
        def _(e=e):
            pltpu.make_async_copy(in_hbm.at[pl.ds(0, nrows)],
                                  bufs.at[slot, e],
                                  sems.at[slot, e]).wait()
        # row part: cyclic roll rows up by dr (wrapped rows fall beyond
        # the tor slice), then sub-row particle shift: roll lanes up by
        # dl with the next row supplying the wrapped lanes
        rowsh = pltpu.roll(bufs[slot, e], (nrows - dr) % nrows, 0)
        r0v = rowsh[0:tor]
        r1v = rowsh[1:tor + 1]
        d0 = pltpu.roll(r0v, (128 - dl) % 128, 1)
        d1 = pltpu.roll(r1v, (128 - dl) % 128, 1)
        c = jnp.where(lane_i < 128 - dl, d0, d1)
        mask = (pidx >= a) & (pidx < a + l)
        acc = jnp.where(mask, c, acc)

    # wait for the write started two steps ago before reusing its slot
    @pl.when(o >= 2)
    def _():
        pltpu.make_async_copy(outb.at[slot],
                              out_hbm.at[pl.ds((o - 2) * tor, tor)],
                              osem.at[slot]).wait()
    outb[slot] = acc
    pltpu.make_async_copy(outb.at[slot], out_hbm.at[pl.ds(o * tor, tor)],
                          osem.at[slot]).start()

    @pl.when(o + 1 >= num)
    def _():
        pltpu.make_async_copy(outb.at[slot],
                              out_hbm.at[pl.ds(o * tor, tor)],
                              osem.at[slot]).wait()

        @pl.when((num >= 2) & (o >= 1))
        def _():
            pltpu.make_async_copy(outb.at[(o + 1) % 2],
                                  out_hbm.at[pl.ds((o - 1) * tor, tor)],
                                  osem.at[(o + 1) % 2]).wait()


@functools.partial(jax.jit,
                   static_argnames=("t", "w", "rmax", "emax", "to",
                                    "interpret"))
def bucket_by_window(flat, cols, t: int = 512, w: int = 512, rmax: int = 8,
                     emax: int = 8, to: int = 1024,
                     interpret: bool = False):
    """Window-group ``cols`` rows by ``flat`` (haloed cell ids).

    flat: (P,) int32 ids; cols: (NC, P) f32 payload (bitcast int
    columns to f32 to ride along).  Returns (flat_out, cols_out, ok):
    reordered so ``flat_out // w`` is non-decreasing; ``ok`` False means
    a coherence cap was exceeded and the caller must use the full-sort
    fallback (``bucket_or_sort`` does this automatically).
    """
    p = flat.shape[0]
    nc = cols.shape[0]
    tc = _ceil_to(p, t)
    nchunk = tc // t
    nout = _ceil_to(tc, to) // to

    key = jnp.pad(flat, (0, tc - p), constant_values=2**30 - 1)
    pay = jnp.pad(cols, ((0, 0), (0, tc - p)))

    # 1. local chunk sort
    ops = [key.reshape(nchunk, t)] + [pay[c].reshape(nchunk, t)
                                      for c in range(nc)]
    srt = jax.lax.sort(ops, dimension=1, num_keys=1)
    key_s = srt[0]
    win = key_s // w                                      # (C, T)

    # 2. run detection
    q = jax.lax.broadcasted_iota(jnp.int32, (nchunk, t), 1)
    newrun = jnp.concatenate(
        [jnp.ones((nchunk, 1), bool), win[:, 1:] != win[:, :-1]], axis=1)
    ridx = jnp.cumsum(newrun, axis=1).astype(jnp.int32) - 1   # (C, T)
    rcount = ridx[:, -1] + 1
    ok = jnp.max(rcount) <= rmax

    # run tables (C, RMAX): window id + start within chunk — built with
    # RMAX masked row reductions (an .at[].min scatter here costs tens of
    # ms on TPU; XLA scatters move one row per index)
    rr = jnp.minimum(ridx, rmax - 1)
    ci = jnp.broadcast_to(jnp.arange(nchunk, dtype=jnp.int32)[:, None],
                          (nchunk, t))
    win_slots, start_slots = [], []
    for r in range(rmax):
        m = newrun & (rr == r)
        win_slots.append(jnp.min(jnp.where(m, win, 2**30 - 1), axis=1))
        start_slots.append(jnp.min(jnp.where(m, q, t), axis=1))
    win_cr = jnp.stack(win_slots, axis=1)
    start_cr = jnp.stack(start_slots, axis=1)
    nextstart = jnp.concatenate(
        [start_cr[:, 1:], jnp.full((nchunk, 1), t, jnp.int32)], axis=1)
    live_r = jnp.arange(rmax)[None, :] < rcount[:, None]
    count_cr = jnp.where(live_r, nextstart - start_cr, 0)

    # 3. global placement: sort run descriptors by (window, chunk) — a
    # TWO-KEY sort (no packed key, so no int32 overflow at any scale).
    # Dead slots and the tail-padding runs both clamp to the same sentinel
    # window class past any real window (< 2^24/W); their rows land after
    # every live row and are sliced away.
    src_global = (jnp.arange(nchunk, dtype=jnp.int32)[:, None] * t
                  + start_cr)
    # window sort class: real windows (< 2^24/W) keep their id, the tail-
    # padding runs clamp to 2^16, and DEAD slots (win untouched at the
    # 2^30-1 init) go one past that — so after the cumsum every dead
    # descriptor is a strict suffix and the dst sentinel swap below
    # preserves monotonicity
    wkey = jnp.where(win_cr == 2**30 - 1, jnp.int32((1 << 16) + 1),
                     jnp.minimum(win_cr, jnp.int32(1 << 16))).reshape(-1)
    ckey = jnp.broadcast_to(ci[:, :1], (nchunk, rmax)).reshape(-1)
    _, _, src_p, cnt_p = jax.lax.sort(
        [wkey, ckey, src_global.reshape(-1), count_cr.reshape(-1)],
        num_keys=2)
    dst_p = jnp.cumsum(cnt_p) - cnt_p                     # exclusive
    # dead (zero-count) descriptors all share the running total as their
    # dst; park them far past the data so they never intersect an output
    # block (they are all in the sentinel window class, so monotonicity
    # of dst_p is preserved)
    dst_p = jnp.where(cnt_p > 0, dst_p, jnp.int32(2**30))

    # 4. per-output-block pair ranges; pad the pair tables by EMAX dead
    # entries so the kernel's lo+e indexing never leaves the arrays
    edges = jnp.arange(nout, dtype=jnp.int32) * to
    lo = jnp.searchsorted(dst_p, edges, side="right").astype(jnp.int32) - 1
    lo = jnp.maximum(lo, 0)
    hi = jnp.searchsorted(dst_p, edges + to, side="left").astype(jnp.int32)
    ok = ok & (jnp.max(hi - lo) <= emax)
    src_p = jnp.pad(src_p, (0, emax))
    cnt_p = jnp.pad(cnt_p, (0, emax))
    dst_p = jnp.pad(dst_p, (0, emax), constant_values=2**30)
    # per-block descriptor table (dst, src, cnt) x EMAX slots, gathered
    # once here so the kernel never indexes the (possibly multi-100k-row)
    # pair tables from SMEM (1 MB cap) — each block's row is DMA'd into
    # SMEM scratch one step ahead
    sl = lo[:, None] + jnp.arange(emax, dtype=jnp.int32)[None, :]
    tbl = jnp.stack([dst_p[sl], src_p[sl], cnt_p[sl]],
                    axis=-1).transpose(0, 2, 1)           # (nout, 3, emax)
    tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, 128 - emax)))  # lane-tile pad

    # pack 16 particles (8 f32 columns each, key bitcast into column 0)
    # per 128-lane row; pad by To particles in front and To + slack
    # behind so every aligned block load stays in bounds
    ncp = 8 if nc < 8 else 16
    assert nc <= 15, "at most 15 payload columns (key + 15 = one row group)"
    allc = jnp.stack(
        [jax.lax.bitcast_convert_type(key_s.reshape(tc), jnp.float32)]
        + [srt[1 + c].reshape(tc) for c in range(nc)]
        + [jnp.zeros((tc,), jnp.float32)] * (ncp - 1 - nc),
        axis=-1)                                           # (TC, NCP)
    src_pad = jnp.pad(allc, ((to, to + 256), (0, 0))).reshape(-1, 128)
    g = 128 // ncp
    tor = to // g
    out = pl.pallas_call(
        functools.partial(_move_kernel, to=to, emax=emax, nc=ncp),
        grid=(nout,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nout * tor, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, 1, 3, 128), jnp.int32),
                        pltpu.VMEM((2, emax, tor + 16, 128), jnp.float32),
                        pltpu.VMEM((2, tor, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2, emax)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(tbl, src_pad)

    rows8 = out.reshape(-1, ncp)                           # (nout*to, NCP)
    flat_out = jax.lax.bitcast_convert_type(rows8[:p, 0], jnp.int32)
    return flat_out, rows8[:p, 1:1 + nc].T, ok


def bucket_or_sort(flat, cols, t: int = 512, w: int = 512, rmax: int = 8,
                   emax: int = 8, to: int = 1024, interpret: bool = False):
    """``bucket_by_window`` with an automatic full-``lax.sort`` fallback
    when a coherence cap trips (first frame from an arbitrary order, or a
    pathological scramble).  Same return contract minus ``ok``."""
    p = flat.shape[0]
    nc = cols.shape[0]
    flat_b, cols_b, ok = bucket_by_window(flat, cols, t=t, w=w, rmax=rmax,
                                          emax=emax, to=to,
                                          interpret=interpret)

    def full(_):
        srt = jax.lax.sort([flat] + [cols[c] for c in range(nc)],
                           num_keys=1)
        return srt[0], jnp.stack(srt[1:], axis=0)

    def keep(_):
        return flat_b, cols_b

    return jax.lax.cond(ok, keep, full, operand=None)
