"""Sweep the Pallas transfer window width W / chunk rows T.

Round 3's roofline put p2g at 22% and g2p at 16% of HBM peak and named
"fewer, wider windows" as the next lever (docs/architecture.md): the
kernels pay a fixed per-(chunk, window) cost (one-hot MXU contraction +
DMA issue), so widening W shrinks the window count, at the price of a
bigger one-hot contraction per chunk (W/256 wc-blocks) and more VMEM per
window.  This measures the actual curve.

For each (W, T) it times the full FLIP frame AND the isolated p2g/g2p
phases (floor-cancelled), at the bench scales.

Usage: python scripts/sweep_window.py [--bound 64] [--density 25]
           [--mode flip] [--json docs/window_sweep.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from fluidsim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3, out


def measure(bound, density, mode, w, t, iters):
    import dataclasses
    from fluidsim_tpu.models.flip import FlipSim, FlipParams
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer as tr
    from fluidsim_tpu.core.gridspec import cell_center_velocity

    scene = get_scene("water_cube_drop", bound=bound, density=density)
    params = FlipParams(bound=bound, wall=bound - 2, mode=mode,
                        transfer_window=w, transfer_chunk=t)
    sim = FlipSim(scene, params=params)
    assert sim.params.pallas_transfer, "sweep requires the Pallas path"
    for _ in range(3):
        m = sim.step()

    f_null = jax.jit(lambda x: x + 1.0)
    floor, _ = timeit(f_null, jnp.zeros((8, 128)), iters=iters)

    B = bound
    lay = tp.HaloLayout(2 * B + 1, w=w, t=t)
    st = sim.state
    solid = sim.solid

    f_sort = jax.jit(lambda p, v: tp.sort_by_cell_h(p, v, B, lay))
    ms_sort, (pos, vel, flat) = timeit(f_sort, st.pos, st.vel, iters=iters)

    f_p2g = jax.jit(lambda p, v, f: tp.p2g_pallas(
        p, v, f, solid, B, lay, "flip", channel_major=True))
    ms_p2g, (weights, mom, occ, wv) = timeit(f_p2g, pos, vel, flat,
                                             iters=iters)

    velg = tr.normalize_velocity_cm(weights, mom)
    vc = cell_center_velocity(jnp.moveaxis(velg, 0, -1))
    vcm = jnp.moveaxis(vc, -1, 0)
    f_g2p = jax.jit(lambda p, f, fields, rows: tp.g2p_pallas(
        p, f, fields, B, B - 2, lay, "flip", wv_rows=rows,
        channel_major=True))
    ms_g2p, _ = timeit(f_g2p, pos, flat, vcm, wv, iters=iters)

    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        m = sim.step()
        _ = float(m["kinetic_energy"])
        best = min(best, time.time() - t0)

    return {
        "w": w, "t": t, "grid": 2 * bound + 1, "mode": mode,
        "particles": sim.num_particles,
        "floor_ms": round(floor, 2),
        "sort_ms": round(ms_sort - floor, 2),
        "p2g_ms": round(ms_p2g - floor, 2),
        "g2p_ms": round(ms_g2p - floor, 2),
        "frame_ms": round(best * 1e3, 2),
        "steps_per_sec": round(1.0 / best, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--mode", default="flip")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--windows", default="512,1024,2048")
    ap.add_argument("--chunks", default="2048")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for w in [int(x) for x in args.windows.split(",")]:
        for t in [int(x) for x in args.chunks.split(",")]:
            try:
                r = measure(args.bound, args.density, args.mode, w, t,
                            args.iters)
            except Exception as e:      # record the failure, keep sweeping
                r = {"w": w, "t": t, "grid": 2 * args.bound + 1,
                     "mode": args.mode, "error": f"{type(e).__name__}: {e}"}
            rows.append(r)
            print(json.dumps(r), flush=True)

    if args.json:
        data = {}
        if os.path.exists(args.json):
            with open(args.json) as f:
                data = json.load(f)
        key = f"{args.mode}_{2*args.bound+1}"
        data[key] = rows
        with open(args.json, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
