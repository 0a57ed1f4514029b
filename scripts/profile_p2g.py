"""Isolate the fused-scatter COMPOSITION overhead at 129^3/2M.

A prior sweep measured the scatter kernel at 7.2 ms with PREBUILT rows
(fed as a jit argument), yet pack+scatter composed in one jit measures
19-25 ms and the production p2g phase ~30 ms.  This probe times, in one
process: the kernel with rows as an argument, pack alone, pack+kernel
composed, and composed+masking (the full p2g_pallas) — the deltas locate
where XLA inserts the extra passes (suspect: a layout copy between the
pack's output and the pallas_call operand).

Usage: python scripts/profile_p2g.py [--bound 64] [--density 25]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import pallas_transfer as pt
    from fluidsim_tpu.ops import transfer as tr

    sim = FlipSim(get_scene("water_cube_drop", bound=args.bound,
                            density=args.density))
    for _ in range(3):
        sim.step()
    params = sim.params
    B = params.bound
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    solid = sim.solid
    st = sim.state
    print(f"grid {n}^3  particles {sim.num_particles}")

    @jax.jit
    def prep(pos0, vel0):
        pos, vel, flat = tp.sort_by_cell_h(pos0, vel0, B, lay)
        w27 = tp.masked_weights(pos, B, params.kernel)
        wv, _ = pt.pack_wv_rows(flat, w27, vel, 2048)
        return pos, vel, flat, w27, wv

    pos, vel, flat, w27, wv = jax.block_until_ready(prep(st.pos, st.vel))

    def null(vel, flat, w27, wv):
        return jnp.sum(flat) * 0.0 + vel[0, 0]

    def kernel_arg(vel, flat, w27, wv):
        # rows enter as a jit argument: no composition with the pack
        d4 = pt.scatter_wv_fused(wv, flat, lay.xr, lay.lwr, n)
        return d4[0, 64, 4096] + d4[0, 0, 0]

    def pack_only(vel, flat, w27, wv):
        rows, _ = pt.pack_wv_rows(flat, w27, vel, 2048)
        return jnp.sum(rows[:, 127]) + rows[0, 0]

    def pack_kernel(vel, flat, w27, wv):
        rows, _ = pt.pack_wv_rows(flat, w27, vel, 2048)
        d4 = pt.scatter_wv_fused(rows, flat, lay.xr, lay.lwr, n)
        return d4[0, 64, 4096] + d4[0, 0, 0]

    def pack_kernel_barrier(vel, flat, w27, wv):
        rows, _ = pt.pack_wv_rows(flat, w27, vel, 2048)
        rows = jax.lax.optimization_barrier(rows)
        d4 = pt.scatter_wv_fused(rows, flat, lay.xr, lay.lwr, n)
        return d4[0, 64, 4096] + d4[0, 0, 0]

    def passthrough_kernel(vel, flat, w27, wv):
        # in-jit producer that is just an elementwise copy of the arg
        rows = wv + 0.0
        d4 = pt.scatter_wv_fused(rows, flat, lay.xr, lay.lwr, n)
        return d4[0, 64, 4096] + d4[0, 0, 0]

    def cols_kernel(vel, flat, w27, wv):
        # channel-major columns end to end (the production path)
        w27t = tp.masked_weights_cm(pos, B, params.kernel)
        cw, _ = pt.pack_cols(flat, w27t, vel, 2048)
        d4 = pt.scatter_wv_fused(cw, flat, lay.xr, lay.lwr, n,
                                 cols=cw.shape[0])
        return d4[0, 64, 4096] + d4[0, 0, 0]

    def full_p2g(vel, flat, w27, wv):
        weights, mom, occ, rows = tp.p2g_pallas(
            pos, vel, flat, solid, B, lay, params.kernel,
            channel_major=True)
        velg = tr.normalize_velocity_cm(weights, mom)
        return jnp.sum(velg) + jnp.sum(occ)

    base = None
    for name, fn in (("null", null), ("kernel(arg rows)", kernel_arg),
                     ("pack only", pack_only),
                     ("pack+kernel rows", pack_kernel),
                     ("weights+pack+cols", cols_kernel),
                     ("full p2g_pallas", full_p2g)):
        ms = timeit(jax.jit(fn), vel, flat, w27, wv, iters=args.iters)
        if base is None:
            base = ms
        print(f"{name:22s} {ms:8.1f} ms   (net {ms - base:6.1f})")

    # g2p: rows vs cols reuse
    @jax.jit
    def mk(flat, w27, vel):
        rows, _ = pt.pack_wv_rows(flat, w27, None, 2048)
        w27t = tp.masked_weights_cm(pos, B, params.kernel)
        colsb, _ = pt.pack_cols(flat, w27t, vel, 2048)
        return rows, colsb

    rows_b, cols_b = jax.block_until_ready(mk(flat, w27, vel))
    vc = jnp.zeros((3, n, n, n), jnp.float32)

    for name, buf in (("g2p rows", rows_b), ("g2p cols", cols_b)):
        def g2p(flat, buf, vc):
            out = tp.g2p_pallas(pos, flat, vc, B, params.wall, lay,
                                params.kernel, wv_rows=buf,
                                channel_major=True)
            return jnp.sum(out)
        ms = timeit(jax.jit(g2p), flat, buf, vc, iters=args.iters)
        print(f"{name:22s} {ms:8.1f} ms   (net {ms - base:6.1f})")


if __name__ == "__main__":
    main()
