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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", choices=("flip", "apic"), default="flip")
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "roofline.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.flip import FlipSim, FlipParams, project, advect_bounce
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.core.gridspec import cell_center_velocity_cm
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

    # dispatch floor (tunnel round trip): subtract from the FIRST stage —
    # later stages are prefix diffs, so the floor cancels there
    floor = timeit(jax.jit(
        lambda *a: jnp.sum(a[0]) + jnp.sum(a[1])), *call_args,
        iters=args.iters)
    print(f"# dispatch floor: {floor:.2f} ms", file=sys.stderr)

    rows = []
    prev_ms, prev_by = floor, 0.0
    for stage in ("sort", "p2g", "project", "g2p", "advect"):
        j = upto(stage)
        ms = timeit(j, *call_args, iters=args.iters)
        by = cost_bytes(j, *call_args)
        d_ms, d_by = ms - prev_ms, by - prev_by
        gbps = d_by / max(d_ms, 1e-9) / 1e6
        rows.append({"phase": stage, "ms": round(d_ms, 2),
                     "bytes": d_by, "GBps": round(gbps, 1),
                     "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBPS, 1)})
        prev_ms, prev_by = ms, by
        print(f"{stage:8s} {d_ms:8.2f} ms  {d_by/1e6:9.1f} MB  "
              f"{gbps:7.1f} GB/s  {100*gbps/HBM_PEAK_GBPS:5.1f}% peak",
              file=sys.stderr)

    # whole-frame rollup (VERDICT r3 item 8): one line per config so
    # transfer-phase progress is read off a single number per round —
    # speed-of-light = the time this frame's total bytes would take at
    # HBM peak (a lower bound: MXU-bound phases could beat it)
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

    entry = {"grid": n, "particles": sim.num_particles, "mode": args.mode,
             "cg_iters": cg_iters, "outer_iters": outer,
             "hbm_peak_GBps": HBM_PEAK_GBPS, "phases": rows,
             "frame_rollup": rollup,
             "note": "bytes = XLA cost-analysis 'bytes accessed' diffs of "
                     "compiled cumulative prefixes; ms = floor-cancelled "
                     "prefix-diff wall times"}
    data = {}
    if os.path.exists(args.out):
        data = json.load(open(args.out))
    data[f"{args.mode}_{n}"] = entry
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
