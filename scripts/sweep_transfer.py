"""Sweep tile sizes / matmul precision of the one-hot Pallas transfer
kernels on the current backend, using a realistic particle distribution
(water-cube drop advanced a few frames).

Usage: python scripts/sweep_transfer.py [--bound 64] [--density 25]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn()
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    args = ap.parse_args()

    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import pallas_transfer as pt

    sim = FlipSim(get_scene("water_cube_drop", bound=args.bound,
                            density=args.density))
    for _ in range(3):
        sim.step()
    B = args.bound
    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = jax.jit(
        lambda p, v: tp.sort_by_cell_h(p, v, B, lay))(sim.state.pos,
                                                      sim.state.vel)
    p = flat.shape[0]
    ncells = lay.ncells
    ncp = ((ncells + 511) // 512) * 512
    print(f"P={p}  ncells={ncells}")

    # fabricate (P_pad, 128) rows with ids attached, as production does
    vals = jnp.concatenate([pos, vel], axis=1)
    vals = jnp.tile(vals, (1, 21))[:, :127]          # fill 127 payload lanes

    table = jnp.ones((128, ncp), jnp.float32)

    null = timeit(jax.jit(lambda: table[:8, :128] + 1.0))
    print(f"null dispatch {null:.1f} ms")

    for prec in ("split3",):
        for (w, t, wc) in ((512, 2048, 256), (256, 2048, 256), (512, 1024, 256),
                           (256, 1024, 256), (512, 2048, 512), (256, 1024, 128)):
            rows, _ = jax.jit(lambda v, f: pt.pad_rows_with_ids(f, v, t),
                              static_argnums=())(vals, flat)
            try:
                ms_g = timeit(lambda: pt.gather_rows_cm(
                    table, rows, flat, w=w, t=t, wc=wc, precision=prec))
                ms_s = timeit(lambda: pt.scatter_rows_cm(
                    rows, flat, ncp, w=w, t=t, wc=wc, precision=prec))
            except Exception as ex:  # noqa: BLE001
                print(f"{prec:8s} w={w:5d} t={t:5d} wc={wc:4d}  FAILED: "
                      f"{type(ex).__name__}: {str(ex)[:120]}")
                continue
            print(f"{prec:8s} w={w:5d} t={t:5d} wc={wc:4d}  "
                  f"gather {ms_g - null:7.1f} ms  scatter {ms_s - null:7.1f} ms")


if __name__ == "__main__":
    main()
