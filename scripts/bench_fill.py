"""Fill in individual BENCH_DETAILS.json ladder entries without re-running
the whole suite (``bench.py --suite`` takes ~an hour on a cold cache).

Usage:  python scripts/bench_fill.py flip_257cube_10M apic_193cube_4M

Each tag maps to the same configuration ``bench.py --suite`` uses, so the
numbers are directly comparable; results are merged into
``BENCH_DETAILS.json`` in place.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import measure_tpu  # noqa: E402  (enables the compile cache)

# tag -> (kind, bound, density)
CONFIGS = {
    "flip_65cube": ("flip", 32, 10.0),
    "flip_129cube_2M": ("flip", 64, 25.0),
    "flip_193cube_4M": ("flip", 96, 15.0),
    "flip_255cube_10M": ("flip", 127, 16.0),
    "flip_257cube_10M": ("flip", 128, 16.0),
    "apic_129cube_2M": ("apic", 64, 25.0),
    "apic_193cube_4M": ("apic", 96, 15.0),
}


def measure_apic(bound: int, density: float, warmup: int, frames: int):
    from fluidsim_tpu.models.flip import FlipParams, FlipSim
    from fluidsim_tpu.scenes import get_scene

    scene = get_scene("water_cube_drop", bound=bound, density=density)
    sim = FlipSim(scene, params=FlipParams(bound=bound, wall=bound - 2,
                                           mode="apic"))
    print(f"# apic grid {2*bound+1}^3, {sim.num_particles} particles",
          file=sys.stderr)
    t0 = time.time()
    for _ in range(warmup):
        _ = float(sim.step()["kinetic_energy"])
    print(f"# warmup ({warmup} frames incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(frames):
            m = sim.step()
        _ = float(m["kinetic_energy"])       # window-end sync (see bench.py)
        best = min(best, (time.time() - t0) / frames)
    return {"steps_per_sec": 1.0 / best,
            "particle_steps_per_sec": sim.num_particles / best,
            "ms_per_frame": best * 1000.0,
            "particles": sim.num_particles,
            "grid": 2 * bound + 1}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="+", choices=sorted(CONFIGS))
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    path = os.path.join(HERE, "BENCH_DETAILS.json")
    with open(path) as f:
        details = json.load(f)
    for tag in args.tags:
        kind, bound, density = CONFIGS[tag]
        if kind == "flip":
            rec = measure_tpu(bound, density, args.warmup, args.frames)
        else:
            rec = measure_apic(bound, density, args.warmup, args.frames)
        details[tag] = rec
        print(json.dumps({tag: rec}))
        with open(path, "w") as f:       # write-through after each entry
            json.dump(details, f, indent=1)


if __name__ == "__main__":
    main()
