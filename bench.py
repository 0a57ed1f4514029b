"""Benchmark harness — prints ONE JSON line for the driver.

Headline config (BASELINE.json config 3): FLIP water-cube drop at 129^3
(bound 64) with ~2M particles, full reference pipeline per frame (P2G,
occupancy, pressure do-while with Jacobi-PCG, FLIP gather, CFL, advect).

``vs_baseline`` compares steps/sec against the single-core C++ CPU port of
the reference algorithm at the same scale (``native/ref_cpu.cc``), whose
measured number is stored in ``BASELINE_CPU.json``.  Run
``python bench.py --measure-cpu-baseline`` to (re)generate it.

NOTE (axon TPU tunnel): ``block_until_ready`` does not reliably block, so
timing forces a host fetch of a scalar whose value depends on every frame
in the window (see the sync note in ``measure_tpu``).
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(HERE, "BASELINE_CPU.json")

sys.path.insert(0, HERE)
from fluidsim_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def measure_tpu(bound: int, density: float, warmup: int, frames: int,
                sync_every_frame: bool = False):
    import numpy as np
    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene

    sim = FlipSim(get_scene("water_cube_drop", bound=bound, density=density))
    n_particles = sim.num_particles
    print(f"# grid {2*bound+1}^3, {n_particles} particles", file=sys.stderr)

    t0 = time.time()
    for _ in range(warmup):
        m = sim.step()
        _ = float(m["kinetic_energy"])
    print(f"# warmup ({warmup} frames incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # Timing sync: frame N's state depends on frame N-1's, so fetching the
    # LAST frame's kinetic energy forces the whole window's compute — that
    # measures throughput, which is what a 500-frame production run sees.
    # --sync-every-frame instead fetches per frame (adds the ~30 ms tunnel
    # round-trip to every frame; reports latency rather than throughput).
    # Best of two windows: the tunnel occasionally adds unrelated latency.
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(frames):
            m = sim.step()
            if sync_every_frame:
                _ = float(m["kinetic_energy"])
        _ = float(m["kinetic_energy"])      # forced host fetch (module note)
        best = min(best, (time.time() - t0) / frames)
    dt = best
    return {
        "steps_per_sec": 1.0 / dt,
        "particle_steps_per_sec": n_particles / dt,
        "ms_per_frame": dt * 1000.0,
        "particles": n_particles,
        "grid": 2 * bound + 1,
    }


def measure_cpu_baseline(bound: int, density: float, frames: int = 3):
    """Build and time the C++ CPU port of the reference at the same scale."""
    src = os.path.join(HERE, "native", "ref_cpu.cc")
    exe = os.path.join(HERE, "native", "ref_cpu")
    subprocess.check_call(["g++", "-O3", "-march=native", "-std=c++17",
                           "-fopenmp", "-o", exe, src])
    out = subprocess.check_output(
        [exe, str(bound), str(density), str(frames)], text=True)
    rec = json.loads(out.strip().splitlines()[-1])
    with open(BASELINE_PATH, "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)      # 129^3 ~ "128^3"
    ap.add_argument("--density", type=float, default=25.0)  # ~2.0M particles
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--measure-cpu-baseline", action="store_true")
    ap.add_argument("--sync-every-frame", action="store_true",
                    help="fetch a scalar per frame (latency mode) instead of "
                         "once per window (throughput mode)")
    ap.add_argument("--suite", action="store_true",
                    help="run the full BASELINE.json config ladder and write "
                         "BENCH_DETAILS.json (headline line still printed)")
    args = ap.parse_args()

    if args.measure_cpu_baseline:
        rec = measure_cpu_baseline(args.bound, args.density)
        print(json.dumps(rec))
        return

    if args.suite:
        import numpy as np
        from fluidsim_tpu.models.flip import FlipSim, FlipParams
        from fluidsim_tpu.models.mpm import MpmSim
        from fluidsim_tpu.scenes import get_scene
        # preserve rows other tools own (e.g. the sustained-throughput
        # windows from scripts/bench_sustained.py)
        details_path = os.path.join(HERE, "BENCH_DETAILS.json")
        details = {}
        if os.path.exists(details_path):
            with open(details_path) as f:
                details = json.load(f)
        # config 1: coarse 64^3-class FLIP; config 3: 128^3-class;
        # scaling points: 192^3 (packed bx=8 solve) / 255^3 / 257^3 (the
        # 256^3-class BASELINE config 5 scale — wide 512-lane halo Pallas
        # kernels + lane-blocked CG, single chip); config 4: APIC at
        # 128^3- and 192^3-class
        for tag, bound, density in (("flip_65cube", 32, 10.0),
                                    ("flip_129cube_2M", 64, 25.0),
                                    ("flip_193cube_4M", 96, 15.0),
                                    ("flip_255cube_10M", 127, 16.0),
                                    ("flip_257cube_10M", 128, 16.0)):
            details[tag] = measure_tpu(bound, density, args.warmup, args.frames)
        for tag, bound, density in (("apic_129cube_2M", 64, 25.0),
                                    ("apic_193cube_4M", 96, 15.0)):
            scene = get_scene("water_cube_drop", bound=bound, density=density)
            sim = FlipSim(scene, params=FlipParams(bound=bound,
                                                   wall=bound - 2,
                                                   mode="apic"))
            for _ in range(args.warmup):
                _ = float(sim.step()["kinetic_energy"])
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                for _ in range(args.frames):
                    m = sim.step()
                _ = float(m["kinetic_energy"])   # window-end sync (measure_tpu)
                best = min(best, (time.time() - t0) / args.frames)
            details[tag] = {
                "steps_per_sec": 1.0 / best,
                "particles": sim.num_particles}
        # config 2: MPM cone at reference scale, measured via the scan-
        # chunked production path (steps(50) = one dispatch for 50 frames;
        # per-step measurement of this tiny 31^3 workload is tunnel-noisy)
        msim = MpmSim("mpm_cone")
        _ = float(msim.steps(50)["kinetic_energy"][-1])     # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            m = msim.steps(50)
            _ = float(m["kinetic_energy"][-1])
            best = min(best, time.time() - t0)
        details["mpm_cone_ref"] = {
            "steps_per_sec": 50 / best,
            "particles": msim.num_particles,
            "note": "scan-chunked (50 frames/dispatch); device-bound at "
                    "this scale"}
        # Scaled MPM ladder (Pallas transfer pipeline — the XLA scatter
        # emitter cannot compile these grid sizes; see ops/mpm_pallas.py).
        # C++ single-core baselines (native/ref_mpm): 63^3/46k = 1.82
        # steps/s, 97^3/210k = 0.445, 127^3/474k = 0.157, 255^3/3.94M =
        # 0.0064 (155.7 s/frame).
        for tag, mb, cpu_sps, k in (("mpm_63cube_46k", 31, 1.82, 10),
                                    ("mpm_97cube_210k", 48, 0.445, 10),
                                    ("mpm_127cube_474k", 63, 0.157, 10),
                                    ("mpm_255cube_3.9M", 127, 0.0064, 5)):
            msim = MpmSim("mpm_cone", bound=mb)
            _ = float(msim.steps(k)["kinetic_energy"][-1])   # compile+warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                m = msim.steps(k)
                _ = float(m["kinetic_energy"][-1])
                best = min(best, time.time() - t0)
            details[tag] = {
                "steps_per_sec": k / best,
                "particles": msim.num_particles,
                "vs_cpu_ref": round(k / best / cpu_sps, 1)}
        with open(os.path.join(HERE, "BENCH_DETAILS.json"), "w") as f:
            json.dump(details, f, indent=1)
        print(json.dumps({"suite": {k: round(v["steps_per_sec"], 3)
                                    for k, v in details.items()}}),
              file=sys.stderr)
        res = details["flip_129cube_2M"]
    else:
        res = measure_tpu(args.bound, args.density, args.warmup, args.frames,
                          sync_every_frame=args.sync_every_frame)

    # vs_baseline uses the MOST CONSERVATIVE denominator available: the
    # Amdahl bound — the steps/s an infinitely-threaded reference could
    # reach on this CPU (particle loops free, serial grid/CG unchanged) —
    # computed over the SAME frame window the TPU numerator measures
    # (frames [warmup, warmup+2*frames) of the 500-frame per-frame CPU
    # trace, docs/ref_cpu_perframe_129.jsonl).  Early frames are the
    # cheapest for the CPU reference (free-fall: few CG iterations), so
    # the window-matched ratio is the honest one; the full-run average is
    # in BENCH_DETAILS.json:flip_129cube_2M_full.
    vs_baseline = 0.0
    denom = None
    trace = os.path.join(HERE, "docs", "ref_cpu_perframe_129.jsonl")
    if os.path.exists(trace):
        with open(trace) as f:
            rows = [json.loads(line) for line in f]
        lo, hi = args.warmup, args.warmup + 2 * args.frames
        window = rows[lo:hi]
        if window:
            serial = sum(r["secs"] - r["particle_secs"] for r in window)
            denom = len(window) / serial
    if denom is None and os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        denom = base.get("amdahl_bound_steps_per_sec") or base.get("steps_per_sec")
    if denom:
        vs_baseline = res["steps_per_sec"] / denom

    print(json.dumps({
        "metric": "flip_steps_per_sec_128cube_2Mparticles",
        "value": round(res["steps_per_sec"], 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
