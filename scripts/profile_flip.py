"""Phase-level timing of the FLIP frame at an arbitrary scale on the
current backend.  Each phase is jitted separately and timed with a forced
host fetch (axon tunnel: block_until_ready does not reliably block).

Usage: python scripts/profile_flip.py [--bound 64] [--density 10] [--iters 10]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    # calibrate per-dispatch tunnel/sync overhead with a trivial op
    f_null = jax.jit(lambda x: x + 1.0)
    ms0, _ = timeit(f_null, jnp.zeros((8, 128)), iters=args.iters)
    print(f"null dispatch       {ms0:8.1f} ms  (subtract from every phase)")

    from fluidsim_tpu.models.flip import FlipSim, project
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.core.gridspec import cell_center_velocity
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer as tr

    sim = FlipSim(get_scene("water_cube_drop", bound=args.bound,
                            density=args.density))
    params = sim.params
    print(f"grid {2*args.bound+1}^3  particles {sim.num_particles}  "
          f"pallas={params.pallas_transfer}")
    # advance a few frames so the state is physically typical
    for _ in range(3):
        sim.step()
    B = params.bound
    lay = tp.HaloLayout(2 * B + 1)
    solid, st = sim.solid, sim.state

    f_sort = jax.jit(lambda p, v: tp.sort_by_cell_h(p, v, B, lay))
    ms, (pos, vel, flat) = timeit(f_sort, st.pos, st.vel, iters=args.iters)
    print(f"sort_by_cell_h      {ms:8.1f} ms")

    f_w = jax.jit(lambda p: tp.masked_weights(p, B, params.kernel))
    ms, w27 = timeit(f_w, pos, iters=args.iters)
    print(f"masked_weights      {ms:8.1f} ms")

    f_p2g = jax.jit(lambda p, v, f, w: tp.p2g_pallas(
        p, v, f, solid, B, lay, params.kernel, w27=w))
    ms, (weights, mom, occ, wv_rows) = timeit(f_p2g, pos, vel, flat, w27,
                                              iters=args.iters)
    print(f"p2g_pallas          {ms:8.1f} ms")

    velg = tr.normalize_velocity(weights, mom)
    fluid = (occ > 0) & (~solid)

    f_proj = jax.jit(lambda vg, fl, dtv: project(params, vg, fl, solid, dtv))
    ms, proj_out = timeit(f_proj, velg, fluid, st.dt, iters=args.iters)
    print(f"project             {ms:8.1f} ms   "
          f"(outer {int(proj_out[2])}, cg {int(proj_out[3])})")
    velg2 = proj_out[0]

    vc_new = cell_center_velocity(velg2)
    vc_old = cell_center_velocity(velg)

    f_g2p = jax.jit(lambda p, f, fields, wv: tp.g2p_pallas(
        p, f, fields, B, params.wall, lay, params.kernel, wv_rows=wv))
    ms, delta = timeit(f_g2p, pos, flat, vc_new - vc_old, wv_rows,
                       iters=args.iters)
    print(f"g2p_pallas          {ms:8.1f} ms")

    from fluidsim_tpu.models.flip import advect_bounce
    f_adv = jax.jit(lambda p, v: advect_bounce(p, v, st.dt, solid, B, 0.0,
                                               rounding="round"))
    ms, _ = timeit(f_adv, pos, vel + delta, iters=args.iters)
    print(f"advect_bounce       {ms:8.1f} ms")

    # full step via sim.step() (donated state — can't reuse st here)
    best = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        m = sim.step()
        _ = float(m["kinetic_energy"])
        best = min(best, time.time() - t0)
    print(f"FULL STEP           {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
