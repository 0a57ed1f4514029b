"""Cumulative phase timing of the Pallas MPM frame: jit prefixes of the
step body and difference successive timings (same method as
profile_cumulative.py — cancels the per-dispatch tunnel overhead).

Usage: python scripts/profile_mpm.py [--bound 48] [--density 400]
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
    ap.add_argument("--bound", type=int, default=48)
    ap.add_argument("--density", type=float, default=400.0)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from fluidsim_tpu.models.mpm import MpmSim, hardening, det3
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import mpm_pallas as mp
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops.pcg import pcg
    from fluidsim_tpu.ops.svd3 import clamp_singular, mm3

    sim = MpmSim(get_scene("mpm_cone", bound=args.bound,
                           density=args.density))
    p = sim.params
    B, n = p.bound, 2 * p.bound + 1
    n3 = n * n * n
    lay = tp.HaloLayout(n)
    for _ in range(3):
        m = sim.step()
    st = sim.state
    solid = sim.solid
    print(f"grid {n}^3  particles {st.pos.shape[0]}  "
          f"cg_iters {int(m['cg_iters'])}")

    def upto(stage):
        def fn(pos, vel, FE, FP, volume, dt):
            g = jnp.asarray(p.gravity, pos.dtype)
            thr = p.mass_threshold
            pos, vel, fe_in, fp_in, volume_in, flat_h = mp.sort_mpm_h(
                pos, vel, FE, FP, volume, B, lay)
            rows = mp.pack_mpm_rows(flat_h, pos, vel, B)
            if stage == "sort":
                return jnp.sum(rows[:2, :2]) + jnp.sum(pos[0])
            mass, mom = mp.p2g_mpm(rows, flat_h, solid, B, lay)
            velg = jnp.where((mass > thr)[..., None],
                             mom / jnp.where(mass > thr, mass, 1.0)[..., None], 0.0)
            dens = mp.density(mass, rows, flat_h, solid, B, lay)
            if stage == "p2g":
                return jnp.sum(velg[0, 0]) + dens[0]
            active = (mass > thr) & (~solid)
            mu, lam = hardening(p.mu0, p.lam0, p.hardening_eps,
                                det3(fp_in), exponent_cap=p.hardening_max)
            f0_fn, dforce = mp.make_force_fns(pos, flat_h, rows, fe_in,
                                              volume_in, mu, lam, active,
                                              solid, B, lay)
            f0 = f0_fn().reshape(n3, 3)
            if stage == "f0":
                return f0[0, 0] + jnp.sum(velg[0, 0])
            mass_safe = jnp.where(active, mass, 1.0)[..., None]
            b = jnp.where(active[..., None],
                          velg + dt * (f0.reshape(n, n, n, 3) / mass_safe + g),
                          0.0)
            beta_dt2 = p.beta * dt * dt

            def matvec(wv):
                wm = jnp.where(active[..., None], wv, 0.0)
                df = dforce(wm)
                out = wv + beta_dt2 * (-df) / mass_safe
                return jnp.where(active[..., None], out, wv)

            res = pcg(matvec, b, x0=b, rtol=p.cg_rtol, maxiter=p.cg_maxiter)
            velg2 = jnp.where(active[..., None], res.x, 0.0)
            if stage == "cg":
                return jnp.sum(velg2[0, 0]) + res.residual
            gradv = mp.gradv_gather(velg2, rows, flat_h, solid, B, lay)
            gmax = jnp.max(jnp.abs(gradv), axis=(-2, -1))
            sc = jnp.minimum(1.0, p.max_gradv_dt
                             / jnp.maximum(dt * gmax, 1e-12))
            gradv = gradv * sc[:, None, None]
            eye = jnp.eye(3, dtype=pos.dtype)
            t_fe = mm3(eye + dt * gradv, fe_in)
            f_total = mm3(t_fe, fp_in)
            fe_new, v_sinv_ut = clamp_singular(t_fe, 1.0 - p.theta_c,
                                               1.0 + p.theta_s)
            fp_new = mm3(v_sinv_ut, f_total)
            if stage == "defgrad":
                return jnp.sum(fe_new[0]) + jnp.sum(fp_new[0])
            from fluidsim_tpu.core.gridspec import cell_center_velocity
            vc_new = cell_center_velocity(velg2)
            vc_old = cell_center_velocity(velg)
            delta = mp.flip_delta(pos, rows, flat_h, vc_new - vc_old, B,
                                  p.wall, lay)
            return jnp.sum(delta[0]) + jnp.sum(fe_new[0])
        return jax.jit(fn)

    stages = ["sort", "p2g", "f0", "cg", "defgrad", "flip"]
    prev = 0.0
    inputs = (st.pos, st.vel, st.FE, st.FP, st.volume, st.dt)
    for s in stages:
        ms = timeit(upto(s), *inputs, iters=args.iters)
        print(f"upto {s:8s} {ms:8.1f} ms   (+{ms - prev:7.1f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
