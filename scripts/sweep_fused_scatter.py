"""Sweep (w, t) block sizes of the fused scatter+reduce kernel and the
fused-table gather on a real water-cube particle distribution.

Usage: python scripts/sweep_fused_scatter.py [--bound 64] [--density 25]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6, warmup=2):
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
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    st = sim.state
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    w27 = tp.masked_weights(pos, B, "flip")
    print(f"grid {n}^3  particles {pos.shape[0]}")

    # null: dispatch+fetch floor
    null = timeit(jax.jit(lambda x: jnp.sum(x[:128])), pos)
    print(f"null             {null:7.1f} ms")

    for w, t, wc in ((512, 2048, 256), (512, 4096, 256), (1024, 2048, 256),
                     (1024, 4096, 256), (256, 2048, 256), (256, 4096, 256),
                     (256, 1024, 256), (512, 2048, 512), (512, 1024, 256),
                     (512, 2048, 128)):
        wv, _ = pt.pack_wv_rows(flat, w27, vel, t, w=w)

        def f_sc(wv, flat):
            d4 = pt.scatter_wv_fused(wv, flat, lay.xr, lay.lwr, n, w=w, t=t,
                                     wc=wc)
            return d4[0, 64, 4096]

        try:
            ms = timeit(jax.jit(f_sc), wv, flat)
        except Exception as e:  # noqa: BLE001
            print(f"scatter w={w:5d} t={t:5d} wc={wc:4d}  "
                  f"FAILED: {type(e).__name__}")
            continue
        print(f"scatter w={w:5d} t={t:5d} wc={wc:4d}  {ms - null:7.1f} ms",
              flush=True)

    # gather sweep (fused table)
    fm = jnp.ones((4, n, n * n), jnp.float32)
    from fluidsim_tpu.ops import pallas_shift as psh
    for w, t in ((512, 2048), (512, 4096), (1024, 2048), (1024, 4096)):
        wv, _ = pt.pack_wv_rows(flat, w27, vel, t, w=w)
        fm_hp = jnp.pad(fm, ((0, 0), (psh._XH, lay.xr - n - psh._XH),
                             (psh._LH + 256,
                              lay.lwr + 512 - (psh._LH + 256) - n * n)))

        def f_g(fm_hp, wv, flat):
            out = pt.gather_wv_fused(fm_hp, wv, flat, n, w=w, t=t)
            return out[3, 1000]

        try:
            ms = timeit(jax.jit(f_g), fm_hp, wv, flat)
        except Exception as e:  # noqa: BLE001
            print(f"gather  w={w:5d} t={t:5d}  FAILED: {type(e).__name__}")
            continue
        print(f"gather  w={w:5d} t={t:5d}  {ms - null:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
