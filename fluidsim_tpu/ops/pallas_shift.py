"""Pallas TPU kernels: the 27-offset shift-reduce / neighbourhood-expand
stencils of the fused transfer path, in one pass over HBM.

``transfer_fast`` turns P2G into one sorted scatter plus 27 dense shifted
adds, and G2P into a 27-shift neighbourhood table plus one sorted gather.
The XLA lowering of those dense halves is layout-hostile: each shifted add
is a pad+slice chain that re-materialises the (N,N,N,4) accumulator (the
4-wide minor dim pads to 128 lanes), measured 45 ms / 58 ms per frame at
129^3 — 10x more HBM traffic than the data.

Layout here (the ``pallas_stencil`` trick): channel-major ``(C, X, Y*Z)``
with x on sublanes and the flattened y/z planes on lanes.  A stencil offset
(ox, oy, oz) becomes a sublane shift by ``ox`` (patched from 8-aligned halo
blocks) plus a lane roll by ``oy*n + oz`` (halo-padded so window wrap-around
never reaches live lanes).  Cross-row lane wraps at the domain's y/z edges
land only in cells that are solid walls in every reference scene, whose
outputs the callers mask — and on the expand side the wrapped *values* are
already zero because the within-wall mask multiplies the fields first.

  reduce (P2G):  acc[g, x, l]      = sum_o d[o*4+g, x-ox(o), l-s(o)]
  expand (G2P):  table[o*4+g, x, l] = fm[g, x+ox(o), l+s(o)]

The reduce runs a 3-long reduction grid dim over ox so the 36-channel input
windows stay small; the accumulator lives in VMEM scratch across those
steps.  Iteration order matches the XLA loop, so results are bit-identical
to ``transfer_fast`` after the callers' masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidsim_tpu.ops.transfer import _OFFSETS

_LH = 256          # lane halo each side (>= max |oy*n + oz|, 128-aligned)
_XH = 8            # sublane halo each side (8-aligned windows)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def lane_halo(n: int, lhmin: int = 256) -> int:
    """Lane halo for grid extent ``n``: the smallest multiple of 256 that
    covers the widest in-row stencil shift ``|oy*n + oz| = n + 1``.

    Multiples of 256 keep ``lwr = 2*lh + roundup(n^2, 512)`` divisible by
    the kernels' 512-lane window width.  256 for n <= 255 (the historical
    constant — layouts unchanged), 512 for 257^3-class grids, and so on up
    to the HBM limit.  ``lhmin`` lets tests force the wide-halo code path
    at small n."""
    return max(lhmin, _ceil_to(n + 1, 256))


def _xshift(buf, ch: int, ox: int, bx: int):
    """Rows shifted by ``ox`` out of channel ``ch`` of a (C, bx+16, L)
    window whose live rows start at 8 — built from 8-aligned ref slices +
    value concat (Mosaic forbids unaligned sublane slicing of refs)."""
    mid = buf[ch, pl.ds(8, bx)]
    if ox == 0:
        return mid
    if ox == 1:   # out[x] reads in[x - 1]  (reduce) -> rows 7..7+bx
        lo = buf[ch, pl.ds(0, 8)]
        return jnp.concatenate([lo[7:8], mid[:-1]], axis=0)
    # ox == -1 -> rows 9..9+bx
    hi = buf[ch, pl.ds(bx + 8, 8)]
    return jnp.concatenate([mid[1:], hi[0:1]], axis=0)


def _reduce_kernel(d_hbm, out_hbm, inbuf2, acc, sems, *, n, bx, lblk, lw):
    """Per (x-block, lane-block): loop the 27 offsets statically, double-
    buffering each offset's 4-channel input window so the next DMA overlaps
    the current shift+add."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    def dma(o, slot):
        return pltpu.make_async_copy(
            d_hbm.at[pl.ds(o * 4, 4), pl.ds(i * bx, bx + 16),
                     pl.ds(j * lblk, lw)],
            inbuf2.at[slot], sems.at[slot])

    lh = (lw - lblk) // 2
    dma(0, 0).start()
    acc[...] = jnp.zeros((4, bx, lblk), jnp.float32)
    for o in range(27):
        slot = o % 2
        if o < 26:
            dma(o + 1, 1 - slot).start()
        dma(o, slot).wait()
        ox, oy, oz = (int(v) for v in _OFFSETS[o])
        s = oy * n + oz
        for g in range(4):
            v = _xshift(inbuf2.at[slot], g, ox, bx)          # (bx, LW)
            v = pltpu.roll(v, s % lw, 1)                     # [l] = v[l - s]
            acc[g] = acc[g] + v[:, lh:lh + lblk]

    cp_out = pltpu.make_async_copy(
        acc, out_hbm.at[:, pl.ds(i * bx, bx), pl.ds(j * lblk, lblk)],
        sems.at[2])
    cp_out.start()
    cp_out.wait()


def _expand_kernel(fm_hbm, out_hbm, inbuf, outbuf, sems, *, n, bx, lblk, lw):
    i = pl.program_id(0)
    j = pl.program_id(1)

    cp_in = pltpu.make_async_copy(
        fm_hbm.at[:, pl.ds(i * bx, bx + 16), pl.ds(j * lblk, lw)],
        inbuf, sems.at[0])
    cp_in.start()
    cp_in.wait()

    lh = (lw - lblk) // 2
    for o in range(27):
        ox, oy, oz = (int(v) for v in _OFFSETS[o])
        s = oy * n + oz
        for g in range(4):
            # out[x, l] = in[x + ox, l + s]: invert the reduce-direction shifts
            v = _xshift(inbuf, g, -ox, bx)                   # (bx, LW)
            v = pltpu.roll(v, (-s) % lw, 1)                  # [l] = v[l + s]
            outbuf[o * 4 + g] = v[:, lh:lh + lblk]

    cp_out = pltpu.make_async_copy(
        outbuf, out_hbm.at[:, pl.ds(i * bx, bx), pl.ds(j * lblk, lblk)],
        sems.at[1])
    cp_out.start()
    cp_out.wait()


def _pack(x_chan_major, n: int, bx: int):
    """(C, N, N*N) -> (C, XH + ceil(N,bx) + XH, LH + ceil128(N^2) + LH)
    with zero halos."""
    c = x_chan_major.shape[0]
    lh = lane_halo(n)
    l = _ceil_to(n * n, 128)
    nxb = _ceil_to(n, bx)
    return jnp.pad(x_chan_major,
                   ((0, 0), (_XH, nxb - n + _XH), (lh, l - n * n + lh)))


@functools.partial(jax.jit, static_argnames=("n", "bx", "lblk", "interpret"))
def p2g_shift_reduce(d, n: int, bx: int = 16, lblk: int = 512,
                     interpret: bool = False):
    """The 27-offset shifted-add reduction of ``p2g_fused``:
    ``acc[cell, g] = sum_o d[cell - off_o, o*4+g]``.

    d: (n^3, 108) from the sorted base-cell scatter.  Returns (n, n, n, 4).
    Valid only after the caller's cell masks (domain-edge wrap cells are
    solid in every scene; see module docstring).
    """
    l = _ceil_to(n * n, 128)
    nxb = _ceil_to(n, bx)
    lw = lblk + 2 * lane_halo(n)
    dp = _pack(d.T.reshape(108, n, n * n), n, bx)

    out = pl.pallas_call(
        functools.partial(_reduce_kernel, n=n, bx=bx, lblk=lblk, lw=lw),
        grid=(nxb // bx, l // lblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, nxb, l), d.dtype),
        scratch_shapes=[pltpu.VMEM((2, 4, bx + 16, lw), jnp.float32),
                        pltpu.VMEM((4, bx, lblk), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(dp)
    return jnp.moveaxis(out[:, :n, :n * n], 0, -1).reshape(n, n, n, 4)


@functools.partial(jax.jit, static_argnames=("n", "bx", "lblk", "interpret"))
def g2p_table_expand(fm, n: int, bx: int = 16, lblk: int = 512,
                     interpret: bool = False):
    """The 27-shift neighbourhood-table build of ``g2p_fused``:
    ``table[cell, o*4+g] = fm[cell + off_o, g]``.

    fm: (n, n, n, 4) masked fields + mask channel (zero at every non-valid
    cell, which also zeroes the y/z-edge lane wraps).  Returns (n^3, 108)
    rows for the sorted gather.
    """
    l = _ceil_to(n * n, 128)
    nxb = _ceil_to(n, bx)
    lw = lblk + 2 * lane_halo(n)
    fmp = _pack(jnp.moveaxis(fm.reshape(n, n * n, 4), -1, 0), n, bx)

    out = pl.pallas_call(
        functools.partial(_expand_kernel, n=n, bx=bx, lblk=lblk, lw=lw),
        grid=(nxb // bx, l // lblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((108, nxb, l), fm.dtype),
        scratch_shapes=[pltpu.VMEM((4, bx + 16, lw), jnp.float32),
                        pltpu.VMEM((108, bx, lblk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(fmp)
    return jnp.moveaxis(out[:, :n, :n * n], 0, -1).reshape(n * n * n, 108)


def _t_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def to_channel_major(x, r: int = 2048, interpret: bool = False):
    """(n3, C) -> (C, n3p) via a tiled Pallas transpose (XLA's transpose of
    a 108-minor array round-trips through scalar relayouts, ~35 ms at 129^3;
    this is a straight (R, C) -> (C, R) block pipeline)."""
    n3, c = x.shape
    n3p = _ceil_to(n3, r)
    xp = jnp.pad(x, ((0, n3p - n3), (0, 0)))
    return pl.pallas_call(
        _t_kernel,
        grid=(n3p // r,),
        in_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((c, r), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c, n3p), x.dtype),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("n3", "r", "interpret"))
def from_channel_major(y, n3: int, r: int = 2048, interpret: bool = False):
    """(C, n3p) -> (n3, C): inverse of ``to_channel_major``."""
    c, n3p = y.shape
    assert n3p % r == 0
    out = pl.pallas_call(
        _t_kernel,
        grid=(n3p // r,),
        in_specs=[pl.BlockSpec((c, r), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n3p, c), y.dtype),
        interpret=interpret,
    )(y)
    return out[:n3]


# ---- pack-less haloed variants (transfer_pallas pipeline) ----
#
# The channel-major one-hot scatter (``pallas_transfer``) can write its
# output *directly* into the haloed (C, XH + X + XH, LH + L + LH) layout by
# using haloed flat cell ids, which removes every pad/transpose between the
# scatter and these stencils.  These entry points take/emit that layout.

def reduce_haloed(d_h, n: int, bx: int = 16, lblk: int = 512,
                  interpret: bool = False, lh: int | None = None):
    """27-offset shift-reduce on a pre-haloed channel-major grid.

    d_h: (128, XH + ceil(n,bx) + XH, LH + ceil(n^2,lblk) + LH) — channels
    108..127 ignored.  Returns (4, ceil(n,bx), ceil(n^2,lblk)).
    """
    lh = lane_halo(n) if lh is None else lh
    _, xr, lwr = d_h.shape
    l = lwr - 2 * lh
    nxb = xr - 2 * _XH
    assert nxb % bx == 0 and l % lblk == 0
    lw = lblk + 2 * lh
    return pl.pallas_call(
        functools.partial(_reduce_kernel, n=n, bx=bx, lblk=lblk, lw=lw),
        grid=(nxb // bx, l // lblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, nxb, l), d_h.dtype),
        scratch_shapes=[pltpu.VMEM((2, 4, bx + 16, lw), jnp.float32),
                        pltpu.VMEM((4, bx, lblk), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(d_h)


def _expand_kernel_haloed(fm_hbm, init_ref, out_hbm, inbuf, outbuf, sems,
                          *, n, bx, lblk, lw):
    """Like ``_expand_kernel`` but writes into the haloed output layout
    (live rows at +XH, live lanes at +LH).  The output aliases a zeros
    input: halo windows and spare channels must be *finite* (zero), because
    the downstream one-hot gather's dot products touch every lane of a
    window — 0 x NaN would poison unselected columns."""
    del init_ref  # aliased with out_hbm (zero init)
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        outbuf[...] = jnp.zeros_like(outbuf[...])

    cp_in = pltpu.make_async_copy(
        fm_hbm.at[:, pl.ds(i * bx, bx + 16), pl.ds(j * lblk, lw)],
        inbuf, sems.at[0])
    cp_in.start()
    cp_in.wait()

    lh = (lw - lblk) // 2
    for o in range(27):
        ox, oy, oz = (int(v) for v in _OFFSETS[o])
        s = oy * n + oz
        for g in range(4):
            v = _xshift(inbuf, g, -ox, bx)                   # (bx, LW)
            v = pltpu.roll(v, (-s) % lw, 1)                  # [l] = v[l + s]
            outbuf[o * 4 + g] = v[:, lh:lh + lblk]           # 108..127 stay 0

    cp_out = pltpu.make_async_copy(
        outbuf,
        out_hbm.at[:, pl.ds(_XH + i * bx, bx), pl.ds(lh + j * lblk, lblk)],
        sems.at[1])
    cp_out.start()
    cp_out.wait()


def expand_haloed(fm_h, n: int, bx: int = 16, lblk: int = 512,
                  interpret: bool = False, lh: int | None = None):
    """27-shift neighbourhood-table build, haloed in AND out.

    fm_h: (4, XR, LWR) haloed masked fields + mask channel.  Returns
    (128, XR, LWR) — the table in the same haloed channel-major layout the
    one-hot gather indexes with haloed flat ids.  Halo windows and spare
    channels are zero (see the kernel docstring for why they must be).
    """
    lh = lane_halo(n) if lh is None else lh
    _, xr, lwr = fm_h.shape
    l = lwr - 2 * lh
    nxb = xr - 2 * _XH
    assert nxb % bx == 0 and l % lblk == 0
    lw = lblk + 2 * lh
    init = jnp.zeros((128, xr, lwr), fm_h.dtype)
    return pl.pallas_call(
        functools.partial(_expand_kernel_haloed, n=n, bx=bx, lblk=lblk, lw=lw),
        grid=(nxb // bx, l // lblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((128, xr, lwr), fm_h.dtype),
        scratch_shapes=[pltpu.VMEM((4, bx + 16, lw), jnp.float32),
                        pltpu.VMEM((128, bx, lblk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(fm_h, init)
