"""Per-phase anatomy of the SHARDED FLIP step (``parallel/flip_sharded.py``).

Round 3 measured the sharded program at 257^3 on a 1-device TPU mesh at
0.463 steps/s vs 2.38 unsharded on the same chip — a 5.1x machinery
overhead with no breakdown.  This script produces that breakdown: it jits
cumulative prefixes of the REAL ``_sharded_step`` body (the ``upto``
checkpoints), times each with the dispatch floor cancelled, and diffs
adjacent prefixes into a per-phase ledger, next to the single-chip phase
numbers at the same scale.

Usage:
  python scripts/profile_sharded.py [--bound 128] [--density 16]
      [--iters 5] [--cap-factor 1.6] [--json docs/sharded_anatomy.json]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fluidsim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=128)
    ap.add_argument("--density", type=float, default=16.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warm-frames", type=int, default=3)
    ap.add_argument("--cap-factor", type=float, default=1.6)
    ap.add_argument("--json", default=None)
    ap.add_argument("--mpm", action="store_true",
                    help="profile the sharded MPM step (mpm_cone scene)")
    ap.add_argument("--full-only", action="store_true",
                    help="time only the full step (skip prefix compiles)")
    args = ap.parse_args()
    if args.mpm:
        return main_mpm(args)

    from fluidsim_tpu.parallel import flip_sharded as fs
    from fluidsim_tpu.parallel.flip_sharded import ShardedFlipSim, AX

    f_null = jax.jit(lambda x: x + 1.0)
    floor = timeit(f_null, jnp.zeros((8, 128)), iters=args.iters)
    print(f"null dispatch       {floor:8.1f} ms  (cancelled from phases)")

    sim = ShardedFlipSim("water_cube_drop", bound=args.bound,
                         density=args.density, cap_factor=args.cap_factor)
    ndev = sim.mesh.devices.size
    n = sim.scene.spec.n
    print(f"grid {n}^3  particles {sim.num_particles}  ndev {ndev}  "
          f"cap {sim.cap} ({sim.cap * ndev / sim.num_particles:.2f}x P)  "
          f"pallas={sim.params.pallas_transfer}")
    for _ in range(args.warm_frames):
        m = sim.step()
    print(f"warm state: outer {int(m['outer_iters'])} cg {int(m['cg_iters'])}")
    st = sim.state

    checkpoints = ["sort", "p2g", "reduce", "pass1", "project", "g2p",
                   "advect", "owner", "migrate", "insert"]
    state_specs = fs.ShardedFlipState(
        pos=P(AX), vel=P(AX), alive=P(AX), dt=P(), t=P(), frame=P(),
        pressure=P(AX))

    def prefix_fn(upto):
        def body(sf, spe, state):
            d = fs._sharded_step(sim.params, sim.nl, sim.cap, sim.mig_cap,
                                 sf, spe, state, upto=upto,
                                 tail_insert=sim.tail_insert)
            return jax.lax.psum(d, AX)
        return jax.jit(shard_map(
            body, mesh=sim.mesh, in_specs=(P(), P(), state_specs),
            out_specs=P(), check_vma=False))

    rows = []
    prev_ms = 0.0
    prev_name = "(floor)"
    for cp in checkpoints:
        fn = prefix_fn(cp)
        t0 = time.time()
        ms = timeit(fn, sim.solid_full, sim.solid_pad_ext, st,
                    iters=args.iters)
        ms_net = ms - floor
        rows.append({"prefix": cp, "cum_ms": round(ms_net, 2),
                     "phase_ms": round(ms_net - prev_ms, 2)})
        print(f"upto {cp:10s}  cum {ms_net:8.1f} ms   "
              f"phase(+{prev_name}->{cp}) {ms_net - prev_ms:8.1f} ms   "
              f"[compile+timing {time.time()-t0:.0f}s]")
        prev_ms = ms_net
        prev_name = cp

    # full step (uses the real compiled path incl. migration + metrics)
    best = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        m = sim.step()
        _ = float(m["kinetic_energy"])
        best = min(best, time.time() - t0)
    full_ms = best * 1e3 - floor
    rows.append({"prefix": "full", "cum_ms": round(full_ms, 2),
                 "phase_ms": round(full_ms - prev_ms, 2)})
    print(f"FULL STEP           {full_ms:8.1f} ms   "
          f"migrate+metrics {full_ms - prev_ms:8.1f} ms")

    out = {
        "grid": n, "particles": sim.num_particles, "ndev": ndev,
        "cap": sim.cap, "cap_factor": args.cap_factor,
        "mig_cap": sim.mig_cap, "pallas": bool(sim.params.pallas_transfer),
        "floor_ms": round(floor, 2),
        "outer_iters": int(m["outer_iters"]), "cg_iters": int(m["cg_iters"]),
        "rows": rows,
        "steps_per_sec": round(1e3 / (full_ms + floor), 3),
    }
    if args.json:
        path = args.json
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[f"sharded_{n}_ndev{ndev}_cap{args.cap_factor}"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {path}")
    print(json.dumps(out))


def main_mpm(args):
    """Per-phase anatomy of the SHARDED MPM step (``parallel/mpm_sharded``).

    The round-5 reconciliation measured ~1.9x same-mode sharded overhead
    at 255^3 (docs/validation.md) with no breakdown; this produces it,
    mirroring the FLIP prefix method on ``_sharded_mpm_step``'s ``upto``
    checkpoints."""
    from fluidsim_tpu.parallel import mpm_sharded as ms
    from fluidsim_tpu.parallel.flip_sharded import AX

    f_null = jax.jit(lambda x: x + 1.0)
    floor = timeit(f_null, jnp.zeros((8, 128)), iters=args.iters)
    print(f"null dispatch       {floor:8.1f} ms  (cancelled from phases)")

    sim = ms.ShardedMpmSim("mpm_cone", bound=args.bound,
                           cap_factor=args.cap_factor)
    ndev = sim.mesh.devices.size
    n = sim.scene.spec.n
    print(f"grid {n}^3  particles {sim.num_particles}  ndev {ndev}  "
          f"cap {sim.cap} ({sim.cap * ndev / sim.num_particles:.2f}x P)  "
          f"pallas={sim.params.pallas_transfer}")
    for _ in range(args.warm_frames):
        m = sim.step()
    print(f"warm state: cg {int(m['cg_iters'])} "
          f"spd {int(m['spd_fallback'])}")
    st = sim.state

    checkpoints = ["sort", "p2g", "reduce", "density", "force0", "solve",
                   "gradF", "g2p", "advect"]
    state_specs = ms.ShardedMpmState(
        pos=P(AX), vel=P(AX), FE=P(AX), FP=P(AX), volume=P(AX),
        alive=P(AX), dt=P(), t=P(), frame=P())

    def prefix_fn(upto):
        def body(sf, spe, state):
            d = ms._sharded_mpm_step(sim.params, sim.nl, sim.cap,
                                     sim.mig_cap, sf, spe, state,
                                     tail_insert=sim.tail_insert, upto=upto)
            return jax.lax.psum(d, AX)
        return jax.jit(shard_map(
            body, mesh=sim.mesh, in_specs=(P(), P(), state_specs),
            out_specs=P(), check_vma=False))

    rows = []
    prev_ms = 0.0
    prev_name = "(floor)"
    for cp in ([] if args.full_only else checkpoints):
        fn = prefix_fn(cp)
        t0 = time.time()
        ms_t = timeit(fn, sim.solid_full, sim.solid_pad_ext, st,
                      iters=args.iters)
        ms_net = ms_t - floor
        rows.append({"prefix": cp, "cum_ms": round(ms_net, 2),
                     "phase_ms": round(ms_net - prev_ms, 2)})
        print(f"upto {cp:10s}  cum {ms_net:8.1f} ms   "
              f"phase(+{prev_name}->{cp}) {ms_net - prev_ms:8.1f} ms   "
              f"[compile+timing {time.time()-t0:.0f}s]")
        prev_ms = ms_net
        prev_name = cp

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        m = sim.step()
        _ = float(m["kinetic_energy"])
        best = min(best, time.time() - t0)
    full_ms = best * 1e3 - floor
    rows.append({"prefix": "full", "cum_ms": round(full_ms, 2),
                 "phase_ms": round(full_ms - prev_ms, 2)})
    print(f"FULL STEP           {full_ms:8.1f} ms   "
          f"migrate+metrics {full_ms - prev_ms:8.1f} ms")

    out = {
        "grid": n, "particles": sim.num_particles, "ndev": ndev,
        "cap": sim.cap, "cap_factor": args.cap_factor,
        "mig_cap": sim.mig_cap, "pallas": bool(sim.params.pallas_transfer),
        "floor_ms": round(floor, 2),
        "cg_iters": int(m["cg_iters"]),
        "spd_fallback": int(m["spd_fallback"]),
        "rows": rows,
        "steps_per_sec": round(1e3 / (full_ms + floor), 3),
    }
    if args.json:
        path = args.json
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[f"sharded_mpm_{n}_ndev{ndev}_cap{args.cap_factor}"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
