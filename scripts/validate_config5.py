"""BASELINE config 5 AT SHAPE (VERDICT r2 item 2): run the sharded FLIP
water-cube drop at the flagship 257^3 / ~9.8M-particle scale, both

  (a) on an 8-device VIRTUAL CPU mesh (the CI stand-in for 8 real chips):
      >= 3 frames, asserting KE parity against the single-chip step on the
      same backend and lost == 0, and
  (b) on the real TPU as a 1-device mesh with the Pallas slab kernels +
      packed distributed solve — the exact program 8 real chips would run,
      compiled and executed at flagship shape on real hardware.

Both runs exercise the 512-lane halo layout, slab widths, migration
capacities and the distributed solve together at the shape where the
round-2 verdict found them untested (all prior sharded runs were 21-49^3).

Usage:
  python scripts/validate_config5.py --backend cpu [--bound 128] [--frames 3]
  python scripts/validate_config5.py --backend tpu [--bound 128] [--frames 5]

Results are appended to docs/validation_config5.json.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "docs", "validation_config5.json")


def record(entry):
    data = []
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.append(entry)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"recorded -> {OUT}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["cpu", "tpu"], required=True)
    ap.add_argument("--bound", type=int, default=128)      # 257^3
    ap.add_argument("--density", type=float, default=16.0)  # ~9.8M
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--skip-single", action="store_true",
                    help="TPU: skip the single-chip KE reference run")
    args = ap.parse_args()

    import numpy as np

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.ndev}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
        from fluidsim_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()

    from fluidsim_tpu.models.flip import FlipSim, FlipParams
    from fluidsim_tpu.parallel.flip_sharded import ShardedFlipSim
    from fluidsim_tpu.scenes import get_scene
    from jax.sharding import Mesh

    scene = get_scene("water_cube_drop", bound=args.bound,
                      density=args.density)
    n = 2 * args.bound + 1
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    print(f"# backend={args.backend} devices={ndev} grid {n}^3",
          file=sys.stderr)

    if args.backend == "tpu":
        params = FlipParams(bound=args.bound, wall=args.bound - 2,
                            fast_transfer=True, pallas_transfer=True)
    else:
        params = None                      # XLA slab path (CPU-compilable)

    t0 = time.time()
    sharded = ShardedFlipSim(scene, params=params, mesh=mesh)
    print(f"# sharded init ({sharded.num_particles} particles, "
          f"cap {sharded.cap}/shard): {time.time()-t0:.1f}s", file=sys.stderr)

    ke_s, walls = [], []
    t0 = time.time()
    for f in range(args.frames):
        tf = time.time()
        m = sharded.step()
        ke = float(m["kinetic_energy"])
        walls.append(time.time() - tf)
        ke_s.append(ke)
        assert int(m["lost"]) == 0, f"lost particles at frame {f}"
        assert np.isfinite(ke)
        print(f"# sharded frame {f}: ke={ke:.6e} lost=0 "
              f"migrated={int(m['migrated'])} wall={walls[-1]:.1f}s",
              file=sys.stderr)

    entry = {
        "backend": args.backend, "ndev": ndev, "grid": n,
        "particles": sharded.num_particles, "frames": args.frames,
        "ke_sharded": ke_s, "lost": 0,
        "first_frame_secs": walls[0],
        "steady_steps_per_sec": ((args.frames - 1) / sum(walls[1:])
                                 if args.frames > 1 else None),
    }

    if not args.skip_single:
        single = FlipSim(scene) if args.backend == "cpu" else FlipSim(
            get_scene("water_cube_drop", bound=args.bound,
                      density=args.density))
        ke_1 = []
        for f in range(args.frames):
            ms = single.step()
            ke_1.append(float(ms["kinetic_energy"]))
            print(f"# single frame {f}: ke={ke_1[-1]:.6e}", file=sys.stderr)
        rel = [abs(a - b) / max(abs(b), 1e-30) for a, b in zip(ke_s, ke_1)]
        entry["ke_single"] = ke_1
        entry["ke_rel_err"] = rel
        print(f"# KE rel err per frame: {['%.2e' % r for r in rel]}",
              file=sys.stderr)
        assert max(rel) < 2e-3, f"KE parity broken: {rel}"

    record(entry)
    print("CONFIG5 OK")


if __name__ == "__main__":
    main()
