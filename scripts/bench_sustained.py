"""Sustained-throughput measurement at bench scale (VERDICT r2 item 1).

The driver headline (``bench.py``) times frames 2-22 of the 129^3/2M
water-cube drop — early free fall, the cheapest regime (1 outer projection
pass, few CG iterations).  Production throughput is the *whole* 500-frame
run (the reference's actual workload, ``fluid.cc:1368``), whose post-impact
frames pay multiple outer passes.  This script publishes both sides in
identical windows:

  * TPU: one 500-frame run at 129^3/2M, wall-clocked per segment
    (boundary syncs only, so the axon tunnel round-trip is amortized):
    early = frames 2-22, post-impact = frames 50-70, full = frames 2-500.
  * CPU: the same windows extracted from the per-frame JSONL that
    ``native/ref_cpu <bound> <density> 500 --perframe=FILE`` writes
    (docs/ref_cpu_perframe_129.jsonl, a ~100-min single run, cached in
    git).  Each window also carries its own Amdahl bound (particle loops
    free, serial grid/CG unchanged — see BASELINE.md).

Writes docs/sustained_129.json and merges the rows into
BENCH_DETAILS.json (keys flip_129cube_2M_{early,post_impact,full} with
like-for-like ``vs_baseline`` per window).

Usage:
  python scripts/bench_sustained.py            # TPU run + merge CPU windows
  python scripts/bench_sustained.py --cpu-only # re-derive CPU windows only
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PERFRAME = os.path.join(HERE, "docs", "ref_cpu_perframe_129.jsonl")
OUT = os.path.join(HERE, "docs", "sustained_129.json")
DETAILS = os.path.join(HERE, "BENCH_DETAILS.json")

# (name, start_frame, end_frame) — half-open, frame indices in the run
WINDOWS = (("early", 2, 22), ("post_impact", 50, 70), ("full", 2, 500))


def cpu_windows():
    """Per-window steps/s + Amdahl bound from the ref_cpu per-frame trace."""
    if not os.path.exists(PERFRAME):
        return None
    rows = [json.loads(l) for l in open(PERFRAME) if l.strip()]
    if not rows:
        return None
    secs = np.array([r["secs"] for r in rows])
    psec = np.array([r["particle_secs"] for r in rows])
    out = {"frames_available": len(rows)}
    for name, a, b in WINDOWS:
        if len(rows) < b:
            continue
        w, p = secs[a:b], psec[a:b]
        total, part = w.sum(), p.sum()
        serial = (total - part) / len(w)
        out[name] = {
            "steps_per_sec": len(w) / total,
            "ms_per_frame": 1000.0 * total / len(w),
            "particle_fraction": part / total,
            "amdahl_bound_steps_per_sec": 1.0 / serial if serial > 0 else 0.0,
        }
    return out


def tpu_run(bound: int, density: float, frames: int):
    from fluidsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene

    sim = FlipSim(get_scene("water_cube_drop", bound=bound, density=density))
    print(f"# grid {2*bound+1}^3, {sim.num_particles} particles",
          file=sys.stderr)

    # segment boundaries: warmup ends at 2; then every window edge + end
    edges = sorted({2, frames} | {a for _, a, _ in WINDOWS}
                   | {b for _, _, b in WINDOWS})
    t0 = time.time()
    m = None
    for _ in range(edges[0]):
        m = sim.step()
    _ = float(m["kinetic_energy"])
    print(f"# warmup ({edges[0]} frames incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # cumulative wall at each boundary; frame N's state depends on N-1's,
    # so fetching the boundary frame's KE forces the whole segment
    cum = {edges[0]: 0.0}
    t0 = time.time()
    done = edges[0]
    for e in edges[1:]:
        for _ in range(done, e):
            m = sim.step()
        _ = float(m["kinetic_energy"])
        cum[e] = time.time() - t0
        done = e
        print(f"# frame {e}: cumulative {cum[e]:.1f}s", file=sys.stderr)

    out = {"particles": sim.num_particles, "grid": 2 * bound + 1}
    for name, a, b in WINDOWS:
        if a not in cum or b not in cum:
            continue
        secs = cum[b] - cum[a]
        out[name] = {"steps_per_sec": (b - a) / secs,
                     "ms_per_frame": 1000.0 * secs / (b - a)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--cpu-only", action="store_true")
    args = ap.parse_args()

    rec = {}
    if os.path.exists(OUT):
        rec = json.load(open(OUT))
    if not args.cpu_only:
        rec["tpu"] = tpu_run(args.bound, args.density, args.frames)
    cpu = cpu_windows()
    if cpu:
        rec["cpu"] = cpu

    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}")

    # merge per-window rows (with like-for-like vs_baseline) into
    # BENCH_DETAILS.json; bench.py --suite preserves these keys
    if "tpu" in rec:
        details = json.load(open(DETAILS)) if os.path.exists(DETAILS) else {}
        for name, _, _ in WINDOWS:
            if name not in rec["tpu"]:
                continue
            row = dict(rec["tpu"][name])
            cwin = (rec.get("cpu") or {}).get(name)
            if cwin:
                row["cpu_steps_per_sec"] = cwin["steps_per_sec"]
                row["cpu_amdahl_bound"] = cwin["amdahl_bound_steps_per_sec"]
                row["vs_baseline"] = round(
                    row["steps_per_sec"] / cwin["amdahl_bound_steps_per_sec"],
                    1)
            details[f"flip_129cube_2M_{name}"] = row
        with open(DETAILS, "w") as f:
            json.dump(details, f, indent=1)
        print(f"merged sustained rows into {DETAILS}")
    for side in ("tpu", "cpu"):
        if side in rec:
            for name, _, _ in WINDOWS:
                if name in rec[side]:
                    print(f"{side} {name}: "
                          f"{rec[side][name]['steps_per_sec']:.3f} steps/s")


if __name__ == "__main__":
    main()
