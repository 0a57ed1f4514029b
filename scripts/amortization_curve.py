"""Measure the sharded-step amortization model (VERDICT r4 #6).

Round 4 decomposed the +43 ms residual sharded-minus-unsharded overhead
at 257^3 into per-device terms and ARGUED "no term scales with the
global domain at fixed per-device slab" — a model, not a measurement.
This script produces the two measurements that check it:

* ``--curve`` (real TPU, default): the sharded(1-device-mesh) minus
  unsharded per-step overhead at 129^3 / 193^3 / 257^3 (the bench-ladder
  configs).  If the decomposition is right, overhead_ms tracks the slab
  size (~ the particle count), not a fixed constant — i.e. the RATIO
  overhead/unsharded stays roughly flat while absolute overhead grows
  with the domain, because on a 1-device mesh the slab IS the domain.
* ``--collectives`` (any backend; run under the 8-device virtual CPU
  mesh): lower the compiled sharded step at fixed GLOBAL size for
  ndev in {2,4,8} and count collective ops (+ their payload elements)
  in the StableHLO.  The model predicts the per-device collective
  COUNT is independent of ndev (fixed rounds of halo exchange + CG
  psum), with per-op payload shrinking as the slab shrinks.

Writes/merges keys ``amortization_curve`` / ``collective_counts`` into
docs/sharded_anatomy_r4.json.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "sharded_anatomy_r4.json")

# (bound, density) — the bench-ladder configs (bench.py --suite)
CURVE_CONFIGS = ((64, 25.0), (96, 15.0), (128, 16.0))


def _merge(key, entry, path):
    data = {}
    if os.path.exists(path):
        data = json.load(open(path))
    data[key] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {path} [{key}]")


def timeit_step(step_fn, iters=5, warmup=3):
    for _ in range(warmup):
        m = step_fn()
        _ = float(m["kinetic_energy"])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        m = step_fn()
        _ = float(m["kinetic_energy"])
        best = min(best, time.time() - t0)
    return best * 1e3


def run_curve(args):
    import jax
    import jax.numpy as jnp
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.parallel.flip_sharded import ShardedFlipSim
    from fluidsim_tpu.scenes import get_scene

    f_null = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128))
    for _ in range(3):
        _ = float(f_null(x0).ravel()[0])
    floor = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        _ = float(f_null(x0).ravel()[0])
        floor = min(floor, time.time() - t0)
    floor *= 1e3
    print(f"# dispatch floor {floor:.1f} ms", file=sys.stderr)

    rows = []
    for bound, density in CURVE_CONFIGS:
        n = 2 * bound + 1
        single = FlipSim(get_scene("water_cube_drop", bound=bound,
                                   density=density))
        ms_single = timeit_step(single.step, iters=args.iters) - floor
        p = single.num_particles
        del single
        shard = ShardedFlipSim("water_cube_drop", bound=bound,
                               density=density)
        ms_shard = timeit_step(shard.step, iters=args.iters) - floor
        ndev = shard.mesh.devices.size
        del shard
        rows.append({
            "grid": n, "particles": p, "ndev": ndev,
            "unsharded_ms": round(ms_single, 1),
            "sharded_ms": round(ms_shard, 1),
            "overhead_ms": round(ms_shard - ms_single, 1),
            "overhead_ratio": round(ms_shard / ms_single, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    entry = {"floor_ms": round(floor, 2), "rows": rows,
             "note": "sharded = 1-device mesh (slab == domain); model "
                     "prediction: overhead_ms grows with the slab, "
                     "overhead_ratio stays ~flat"}
    _merge("amortization_curve", entry, args.json)


_COLL_RE = re.compile(
    r"stablehlo\.(collective_permute|all_reduce|all_gather|"
    r"reduce_scatter|all_to_all)\b")
_SHAPE_RE = re.compile(r"tensor<([0-9x]+)x(?:f32|f64|i32|i1|ui32)")


def run_collectives(args):
    # the environment's sitecustomize force-sets jax_platforms=axon, so a
    # plain JAX_PLATFORMS env var is not enough (see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from fluidsim_tpu.parallel import flip_sharded as fs
    from fluidsim_tpu.parallel.flip_sharded import ShardedFlipSim

    ndevs = [int(x) for x in args.ndevs.split(",")]
    avail = len(jax.devices())
    rows = []
    for ndev in ndevs:
        if ndev > avail:
            print(f"# skip ndev={ndev} (only {avail} devices)",
                  file=sys.stderr)
            continue
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), (fs.AX,))
        sim = ShardedFlipSim("water_cube_drop", bound=args.bound,
                             density=args.density, mesh=mesh)
        lowered = sim._step.lower(sim.solid_full, sim.solid_pad_ext,
                                  sim.state)
        txt = lowered.as_text()
        counts = {}
        elems = {}
        for m in _COLL_RE.finditer(txt):
            op = m.group(1)
            counts[op] = counts.get(op, 0) + 1
            # payload elements: first tensor type on the op's line
            line_end = txt.find("\n", m.end())
            sm = _SHAPE_RE.search(txt, m.end(),
                                  line_end if line_end > 0 else m.end() + 400)
            if sm:
                k = 1
                for d in sm.group(1).split("x"):
                    if d:
                        k *= int(d)
                elems[op] = elems.get(op, 0) + k
        rows.append({"ndev": ndev, "grid": 2 * args.bound + 1,
                     "collective_counts": counts,
                     "collective_payload_elems": elems})
        print(json.dumps(rows[-1]), flush=True)
        del sim

    entry = {"rows": rows,
             "note": "StableHLO collective-op counts of the lowered "
                     "sharded step at FIXED global size; model "
                     "prediction: counts independent of ndev, payload "
                     "shrinking ~1/ndev (slab halo area fixed, slab "
                     "volume shrinking)"}
    _merge("collective_counts", entry, args.json)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("curve", "collectives"),
                    default="curve")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--ndevs", default="2,4,8")
    ap.add_argument("--json", default=OUT)
    args = ap.parse_args()
    if args.mode == "curve":
        run_curve(args)
    else:
        run_collectives(args)


if __name__ == "__main__":
    main()
