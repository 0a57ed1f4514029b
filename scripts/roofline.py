"""Per-phase roofline accounting (VERDICT r2 item 5): for each phase of
the Pallas FLIP frame, measure wall time (cumulative-prefix diffs, which
cancel the tunnel dispatch floor) AND bytes accessed (XLA's own
cost-analysis on the same compiled prefixes, which counts fused-HLO and
pallas-call operands/outputs), then report achieved GB/s and % of the
v5e HBM peak.  The point: every "structural" claim (APIC gap, large-n
transfer decay) gets a distance-from-roofline number instead of a
differential timing.

Usage: python scripts/roofline.py [--bound 64] [--density 25]
       [--mode flip|apic] [--out docs/roofline.json]

Writes/updates a per-config entry in docs/roofline.json.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

HBM_PEAK_GBPS = 819.0        # TPU v5e (v5 lite): 819 GB/s HBM bandwidth


def timeit(fn, *args, iters=8, warmup=2):
    import jax.numpy as jnp
    for _ in range(warmup):
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def cost_bytes(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("bytes accessed", 0.0))


def report(rows, out_path, key, meta):
    """Emit per-phase lines + the whole-frame rollup, merge into the JSON."""
    tot_ms = sum(r["ms"] for r in rows)
    tot_by = sum(r["bytes"] for r in rows)
    sol_ms = tot_by / HBM_PEAK_GBPS / 1e6
    rollup = {"ms": round(tot_ms, 2), "bytes": tot_by,
              "GBps": round(tot_by / max(tot_ms, 1e-9) / 1e6, 1),
              "pct_hbm_peak": round(100 * (tot_by / max(tot_ms, 1e-9) / 1e6)
                                    / HBM_PEAK_GBPS, 1),
              "speed_of_light_ms": round(sol_ms, 2),
              "x_over_speed_of_light": round(tot_ms / max(sol_ms, 1e-9), 2)}
    print(f"FRAME    {tot_ms:8.2f} ms  {tot_by/1e6:9.1f} MB  "
          f"{rollup['GBps']:7.1f} GB/s  {rollup['pct_hbm_peak']:5.1f}% peak "
          f"({rollup['x_over_speed_of_light']}x over speed of light)",
          file=sys.stderr)
    entry = dict(meta)
    entry.update({"hbm_peak_GBps": HBM_PEAK_GBPS, "phases": rows,
                  "frame_rollup": rollup,
                  "note": "bytes = XLA cost-analysis 'bytes accessed' diffs "
                          "of compiled cumulative prefixes; ms = "
                          "floor-cancelled prefix-diff wall times"})
    data = {}
    if os.path.exists(out_path):
        data = json.load(open(out_path))
    data[key] = entry
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out_path} [{key}]", file=sys.stderr)


def run_stages(stage_names, upto, call_args, iters):
    """Time + cost-analyse cumulative prefixes, return per-phase rows."""
    import jax
    import jax.numpy as jnp

    floor = timeit(jax.jit(
        lambda *a: jnp.sum(a[0]) + jnp.sum(a[1])), *call_args, iters=iters)
    print(f"# dispatch floor: {floor:.2f} ms", file=sys.stderr)
    rows = []
    prev_ms, prev_by = floor, 0.0
    for stage in stage_names:
        j = upto(stage)
        ms = timeit(j, *call_args, iters=iters)
        by = cost_bytes(j, *call_args)
        # prefix walls are each best-of-N; a cheap phase can measure
        # slightly NEGATIVE from run-to-run noise — clamp the delta for
        # the rate (the cumulative wall stays honest in the rollup)
        d_ms, d_by = max(ms - prev_ms, 0.05), by - prev_by
        gbps = d_by / max(d_ms, 1e-9) / 1e6
        rows.append({"phase": stage, "ms": round(ms - prev_ms, 2),
                     "clamped_ms": round(d_ms, 2),
                     "bytes": d_by, "GBps": round(gbps, 1),
                     "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBPS, 1)})
        prev_ms, prev_by = ms, by
        print(f"{stage:8s} {d_ms:8.2f} ms  {d_by/1e6:9.1f} MB  "
              f"{gbps:7.1f} GB/s  {100*gbps/HBM_PEAK_GBPS:5.1f}% peak",
              file=sys.stderr)
    return rows


def run_mpm(args):
    """MPM roofline: the profile_mpm.py stage prefixes with XLA
    cost-analysis bytes (VERDICT r3 item 8: the rollup for MPM 127^3)."""
    import jax
    import jax.numpy as jnp
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.mpm import MpmSim, hardening, det3
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import mpm_pallas as mp
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops.pcg import pcg
    from fluidsim_tpu.ops.svd3 import clamp_singular, mm3
    from fluidsim_tpu.core.gridspec import cell_center_velocity

    from fluidsim_tpu.models.mpm import MpmParams

    kw = {} if args.density is None else {"density": args.density}
    scene = get_scene("mpm_cone", bound=args.bound, **kw)
    # pin the full (reference) operator: the stage prefixes below rebuild
    # the solve with the full Hessian, so the timed sim must match
    sim = MpmSim(scene, params=MpmParams(
        bound=args.bound, wall=scene.spec.wall, dx=scene.spec.dx,
        gravity=tuple(scene.gravity), hessian="full"))
    p = sim.params
    B, n = p.bound, 2 * p.bound + 1
    n3 = n * n * n
    lay = tp.HaloLayout(n)
    for _ in range(3):
        m = sim.step()
    st = sim.state
    solid = sim.solid
    cg_iters = int(m["cg_iters"])
    print(f"# grid {n}^3  particles {st.pos.shape[0]}  mode mpm",
          file=sys.stderr)

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
                             mom / jnp.where(mass > thr, mass,
                                             1.0)[..., None], 0.0)
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
                          velg + dt * (f0.reshape(n, n, n, 3) / mass_safe
                                       + g), 0.0)
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
            vc_new = cell_center_velocity(velg2)
            vc_old = cell_center_velocity(velg)
            delta = mp.flip_delta(pos, rows, flat_h, vc_new - vc_old, B,
                                  p.wall, lay)
            return jnp.sum(delta[0]) + jnp.sum(fe_new[0])
        return jax.jit(fn)

    call_args = (st.pos, st.vel, st.FE, st.FP, st.volume, st.dt)
    rows = run_stages(["sort", "p2g", "f0", "cg", "defgrad", "flip"],
                      upto, call_args, args.iters)
    report(rows, args.out, f"mpm_{n}",
           {"grid": n, "particles": int(st.pos.shape[0]), "mode": "mpm",
            "cg_iters": cg_iters})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=None,
                    help="default: 25 for flip/apic, scene default for mpm")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", choices=("flip", "apic", "mpm"),
                    default="flip")
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "roofline.json"))
    args = ap.parse_args()

    if args.mode == "mpm":
        run_mpm(args)
        return

    import jax
    import jax.numpy as jnp
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.flip import FlipSim, FlipParams, project, advect_bounce
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.core.gridspec import cell_center_velocity_cm
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer as tr

    if args.density is None:
        args.density = 25.0
    scene = get_scene("water_cube_drop", bound=args.bound,
                      density=args.density)
    params_kw = {}
    if args.mode == "apic":
        params_kw["params"] = FlipParams(bound=args.bound,
                                         wall=args.bound - 2, mode="apic")
    sim = FlipSim(scene, **params_kw)
    for _ in range(3):
        sim.step()
    # CG/outer counts for the report (step() donates its input state, so
    # take them BEFORE capturing the state the prefix timings will reuse)
    m = sim.step()
    cg_iters = int(m["cg_iters"])
    outer = int(m["outer_iters"])
    params = sim.params
    B, wall = params.bound, params.wall
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    solid = sim.solid
    st = sim.state
    print(f"# grid {n}^3  particles {sim.num_particles}  mode {args.mode}",
          file=sys.stderr)

    def upto(stage):
        def fn(pos0, vel0, dt, p_prev, *extra):
            if args.mode == "apic":
                pos, vel, flat, aff_flat = tp.sort_by_cell_h(
                    pos0, vel0, B, lay, extra=extra[0].reshape(-1, 9))
                aff = aff_flat.reshape(-1, 3, 3)
                w27 = None
            else:
                pos, vel, flat = tp.sort_by_cell_h(pos0, vel0, B, lay)
                aff = None
                w27 = tp.masked_weights(pos, B, params.kernel)
            if stage == "sort":
                return jnp.sum(vel) + jnp.sum(flat)
            weights, mom, occ, wv_rows = tp.p2g_pallas(
                pos, vel, flat, solid, B, lay, params.kernel, w27=w27,
                aff=aff, channel_major=True)
            velg = tr.normalize_velocity_cm(weights, mom)
            fluid = (occ > 0) & (~solid)
            if stage == "p2g":
                return jnp.sum(velg) + jnp.sum(fluid)
            velb = velg
            velg, err, n_outer, cg_iters, div_rms, pressure = project(
                params, velg, fluid, solid, dt, p0=p_prev, cm=True)
            if stage == "project":
                return jnp.sum(velg) + err + cg_iters.astype(jnp.float32)
            vc_new = cell_center_velocity_cm(velg)
            if args.mode == "apic":
                vel2, aff2 = tp.g2p_apic_pallas(
                    pos, flat, vc_new, B, wall, lay, params.kernel,
                    wv_rows=wv_rows, channel_major=True)
            else:
                vc_old = cell_center_velocity_cm(velb)
                delta = tp.g2p_pallas(pos, flat, vc_new - vc_old, B, wall,
                                      lay, params.kernel, wv_rows=wv_rows,
                                      channel_major=True)
                vel2 = vel + delta
            if stage == "g2p":
                return jnp.sum(vel2)
            speed = jnp.sqrt(jnp.sum(vel2 * vel2, axis=-1))
            max_speed = jnp.max(speed)
            dt_new = jnp.where(max_speed != 0,
                               jnp.minimum(params.max_dt, params.dx / max_speed),
                               params.max_dt)
            e = 0.5 if args.mode == "apic" else 0.0
            rounding = "round"
            pos2, vel3 = advect_bounce(
                pos, vel2, dt_new, solid, B, e, rounding=rounding,
                analytic_wall=params.wall if params.walls_only_solid else None)
            ke = 0.5 * jnp.sum((vel3 * vel3).astype(jnp.float32))
            return jnp.sum(pos2) + ke
        return jax.jit(fn)

    call_args = [st.pos, st.vel, st.dt, st.pressure]
    if args.mode == "apic":
        call_args.append(st.aff)

    rows = run_stages(("sort", "p2g", "project", "g2p", "advect"),
                      upto, call_args, args.iters)
    report(rows, args.out, f"{args.mode}_{n}",
           {"grid": n, "particles": sim.num_particles, "mode": args.mode,
            "cg_iters": cg_iters, "outer_iters": outer})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
