"""MPM AT SHAPE (VERDICT r3 item 4a): run the sharded MPM cone at the
scaled 255^3 / ~3.9M-particle scale — the ``ShardedMpmSim`` analog of
``validate_config5.py`` (round 3's largest sharded MPM run was the ~6k
cone; this validates the slab layout, migration and distributed implicit
solve at the shape the bench ladder publishes):

  (a) 8-device VIRTUAL CPU mesh, reduced frames, KE parity vs the
      single-chip ``MpmSim`` on the same backend, lost == 0;
  (b) real TPU as a 1-device mesh with the Pallas MPM kernels — the exact
      program 8 real chips would run, at shape on real hardware.

Usage:
  python scripts/validate_mpm_shape.py --backend cpu [--bound 31] [--frames 3]
  python scripts/validate_mpm_shape.py --backend tpu [--bound 127] [--frames 5]

Results append to docs/validation_mpm_shape.json.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "docs", "validation_mpm_shape.json")


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
    ap.add_argument("--bound", type=int, default=127)      # 255^3 / ~3.9M
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--skip-single", action="store_true")
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

    from fluidsim_tpu.models.mpm import MpmSim
    from fluidsim_tpu.parallel.mpm_sharded import ShardedMpmSim
    from fluidsim_tpu.scenes import get_scene
    from jax.sharding import Mesh

    scene = get_scene("mpm_cone", bound=args.bound)
    n = 2 * args.bound + 1
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    print(f"# backend={args.backend} devices={ndev} grid {n}^3",
          file=sys.stderr)

    t0 = time.time()
    sharded = ShardedMpmSim(scene, mesh=mesh)
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
              f"wall={walls[-1]:.1f}s", file=sys.stderr)

    entry = {
        "backend": args.backend, "ndev": ndev, "grid": n,
        "particles": sharded.num_particles, "frames": args.frames,
        "ke_sharded": ke_s, "lost": 0,
        "first_frame_secs": walls[0],
        "steady_steps_per_sec": ((args.frames - 1) / sum(walls[1:])
                                 if args.frames > 1 else None),
    }

    if not args.skip_single:
        single = MpmSim(scene)
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


if __name__ == "__main__":
    main()
