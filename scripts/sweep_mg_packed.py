"""Measure the packed-smoother V-cycle vs fused-Chebyshev at scale.

Round-5 follow-through on the one formulation `docs/architecture.md` left
open: the round-4 multigrid-at-255^3 negative was priced as fine-level
bound (dense sweeps ~100 GB/s vs the packed Pallas apply's 304), so
`mg_preconditioner_packed` moves exactly those sweeps into the packed
layout.  This script times the full projection (the `project` call the
production frame makes) under both preconditioners on the same state,
reports ms / CG iters / solution agreement, and appends the result to
``docs/mg_packed.json``.

Usage: python scripts/sweep_mg_packed.py [--bound 127] [--density 25]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=127)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "mg_packed.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.flip import FlipSim, project
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer as tr

    scene = get_scene("water_cube_drop", bound=args.bound,
                      density=args.density)
    sim = FlipSim(scene)
    for _ in range(4):
        sim.step()
    params = sim.params
    B = params.bound
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    solid = sim.solid
    st = sim.state
    print(f"# grid {n}^3  particles {sim.num_particles}", file=sys.stderr)

    # materialize the projection inputs once (post-P2G grid state)
    @jax.jit
    def make_inputs(pos0, vel0):
        pos, vel, flat = tp.sort_by_cell_h(pos0, vel0, B, lay)
        w27 = tp.masked_weights(pos, B, params.kernel)
        weights, mom, occ, wv_rows = tp.p2g_pallas(
            pos, vel, flat, solid, B, lay, params.kernel, w27=w27,
            channel_major=True)
        velg = tr.normalize_velocity_cm(weights, mom)
        fluid = (occ > 0) & (~solid)
        return velg, fluid

    velg, fluid = make_inputs(st.pos, st.vel)
    velg = jax.device_get(velg), fluid  # force materialization
    velg, fluid = jnp.asarray(velg[0]), fluid

    entry = {"grid": n, "particles": sim.num_particles, "rows": []}
    sols = {}
    for name in ("chebyshev", "multigrid"):
        p = dataclasses.replace(params, preconditioner=name)

        @jax.jit
        def proj(velg, fluid, dt, p0, _p=p):
            out = project(_p, velg, fluid, solid, dt, p0=p0, cm=True)
            return out[0], out[1], out[3], out[5]   # velg', err, cg, pressure

        vout, err, cg, press = proj(velg, fluid, st.dt, st.pressure)
        _ = float(err)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.time()
            vout, err, cg, press = proj(velg, fluid, st.dt, st.pressure)
            _ = float(err) + float(cg)
            best = min(best, time.time() - t0)
        sols[name] = np.asarray(jax.device_get(vout))
        row = {"precond": name, "ms": round(best * 1e3, 2),
               "cg_iters": int(cg), "err": float(err)}
        entry["rows"].append(row)
        print(row, file=sys.stderr)

    d = np.abs(sols["multigrid"] - sols["chebyshev"])
    s = np.abs(sols["chebyshev"]).max()
    entry["vel_max_abs_diff"] = float(d.max())
    entry["vel_rel_diff"] = float(d.max() / max(s, 1e-30))
    data = {}
    if os.path.exists(args.out):
        data = json.load(open(args.out))
    data[f"flip_{n}"] = entry
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry["rows"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
