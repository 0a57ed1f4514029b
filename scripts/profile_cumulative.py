"""Cumulative phase timing of the Pallas FLIP frame: jit prefixes of the
step and difference successive timings, cancelling the per-dispatch tunnel
overhead that pollutes standalone phase timings.

Usage: python scripts/profile_cumulative.py [--bound 64] [--density 25]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    ap.add_argument("--mode", choices=("flip", "apic"), default="flip")
    args = ap.parse_args()

    from fluidsim_tpu.models.flip import (FlipSim, FlipParams, project,
                                          advect_bounce)
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.core.gridspec import cell_center_velocity
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer as tr

    scene = get_scene("water_cube_drop", bound=args.bound,
                      density=args.density)
    params_kw = {}
    if args.mode == "apic":
        params_kw["params"] = FlipParams(bound=args.bound,
                                         wall=args.bound - 2, mode="apic")
    sim = FlipSim(scene, **params_kw)
    for _ in range(3):
        sim.step()
    params = sim.params
    B, wall = params.bound, params.wall
    lay = tp.HaloLayout(2 * B + 1)
    solid = sim.solid
    st = sim.state
    print(f"grid {2*B+1}^3  particles {sim.num_particles}")

    def upto_apic(stage):
        # mirrors the PRODUCTION APIC path (flip_step mode=="apic" branch)
        from fluidsim_tpu.core.gridspec import cell_center_velocity_cm

        def fn(pos0, vel0, aff0, dt, p_prev):
            pos, vel, flat, aff_flat = tp.sort_by_cell_h(
                pos0, vel0, B, lay, extra=aff0.reshape(-1, 9))
            aff = aff_flat.reshape(-1, 3, 3)
            if stage == "sort":
                return jnp.sum(aff) + jnp.sum(flat)
            weights, mom, occ, wv_rows = tp.p2g_pallas(
                pos, vel, flat, solid, B, lay, params.kernel, aff=aff,
                channel_major=True)
            velg = tr.normalize_velocity_cm(weights, mom)
            fluid = (occ > 0) & (~solid)
            if stage == "p2g":
                return jnp.sum(velg) + jnp.sum(fluid)
            velg, err, n_outer, cg_iters, div_rms, pressure = project(
                params, velg, fluid, solid, dt, p0=p_prev, cm=True)
            if stage == "project":
                return jnp.sum(velg) + err
            vc_new = cell_center_velocity_cm(velg)
            vel2, aff2 = tp.g2p_apic_pallas(pos, flat, vc_new, B, wall, lay,
                                            params.kernel, wv_rows=wv_rows,
                                            channel_major=True)
            if stage == "g2p":
                return jnp.sum(vel2) + jnp.sum(aff2)
            speed = jnp.sqrt(jnp.sum(vel2 * vel2, axis=-1))
            max_speed = jnp.max(speed)
            dt_new = jnp.where(max_speed != 0,
                               jnp.minimum(params.max_dt, params.dx / max_speed),
                               params.max_dt)
            pos2, vel3 = advect_bounce(
                pos, vel2, dt_new, solid, B, 0.5, rounding="round",
                analytic_wall=params.wall if params.walls_only_solid else None)
            ke = 0.5 * jnp.sum((vel3 * vel3).astype(jnp.float32))
            return jnp.sum(pos2) + ke
        return jax.jit(fn)

    def upto(stage):
        # mirrors the PRODUCTION path: channel-major grids end to end
        from fluidsim_tpu.core.gridspec import cell_center_velocity_cm

        def fn(pos0, vel0, dt, p_prev):
            pos, vel, flat = tp.sort_by_cell_h(pos0, vel0, B, lay)
            w27 = tp.masked_weights(pos, B, params.kernel)
            if stage == "sort":
                return jnp.sum(w27) + jnp.sum(flat)
            weights, mom, occ, wv_rows = tp.p2g_pallas(
                pos, vel, flat, solid, B, lay, params.kernel, w27=w27,
                channel_major=True)
            velg = tr.normalize_velocity_cm(weights, mom)
            fluid = (occ > 0) & (~solid)
            if stage == "p2g":
                return jnp.sum(velg) + jnp.sum(fluid)
            velb = velg
            velg, err, n_outer, cg_iters, div_rms, pressure = project(
                params, velg, fluid, solid, dt, p0=p_prev, cm=True)
            if stage == "project":
                return jnp.sum(velg) + err
            vc_new = cell_center_velocity_cm(velg)
            vc_old = cell_center_velocity_cm(velb)
            delta = tp.g2p_pallas(pos, flat, vc_new - vc_old, B, wall, lay,
                                  params.kernel, wv_rows=wv_rows,
                                  channel_major=True)
            vel2 = vel + delta
            if stage == "g2p":
                return jnp.sum(vel2)
            speed = jnp.sqrt(jnp.sum(vel2 * vel2, axis=-1))
            max_speed = jnp.max(speed)
            dt_new = jnp.where(max_speed != 0,
                               jnp.minimum(params.max_dt, params.dx / max_speed),
                               params.max_dt)
            pos2, vel3 = advect_bounce(
                pos, vel2, dt_new, solid, B, 0.0, rounding="round",
                analytic_wall=params.wall if params.walls_only_solid else None)
            ke = 0.5 * jnp.sum((vel3 * vel3).astype(jnp.float32))
            return jnp.sum(pos2) + ke
        return jax.jit(fn)

    prev = 0.0
    for stage in ("sort", "p2g", "project", "g2p", "advect"):
        if args.mode == "apic":
            ms = timeit(upto_apic(stage), st.pos, st.vel, st.aff, st.dt,
                        st.pressure, iters=args.iters)
        else:
            ms = timeit(upto(stage), st.pos, st.vel, st.dt, st.pressure,
                        iters=args.iters)
        print(f"upto {stage:8s} {ms:8.1f} ms   (+{ms - prev:6.1f})")
        prev = ms


if __name__ == "__main__":
    main()
