"""500-frame MPM cone soak on the current backend (full reference workload:
dt=1e-3, E=48000, nu=0.47, snow plasticity), compared against the recorded
trace (``docs/mpm_trace_500frames.json``).

Usage: python scripts/soak_mpm.py [--frames 500] [--update]
"""

import argparse
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE = os.path.join(HERE, "docs", "mpm_trace_500frames.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    from fluidsim_tpu.models.mpm import MpmSim
    from fluidsim_tpu.compat.scatter import seed_particles_compat

    sim = MpmSim("mpm_cone", seeder=seed_particles_compat)
    print(f"# {sim.num_particles} particles")
    t0 = time.time()
    kes, mnds, mxds = [], [], []
    for f in range(args.frames):
        m = sim.step()
        kes.append(m["kinetic_energy"])
        mnds.append(m["min_det_fp"])
        mxds.append(m["max_det_fp"])
        if f == 0:
            print(f"# first frame (incl. compile): {time.time()-t0:.1f}s")
    ke = np.asarray([float(k) for k in kes])
    wall = time.time() - t0
    print(f"# {args.frames} frames in {wall:.1f}s")

    assert np.isfinite(ke).all(), "non-finite kinetic energy"
    pos = np.asarray(sim.state.pos)
    assert np.isfinite(pos).all() and np.abs(pos).max() <= sim.params.bound

    if os.path.exists(TRACE) and not args.update:
        ref = json.load(open(TRACE))
        ref_ke = np.asarray([r["ke"] for r in ref])[:args.frames]
        n = min(len(ref_ke), len(ke))
        early = slice(0, min(20, n))
        rel = np.abs(ke[early] - ref_ke[early]) / np.abs(ref_ke[early])
        print(f"# early-frame KE rel err max: {rel.max():.3e}")
        assert rel.max() < 1e-2
        tail = slice(max(0, n - 100), n)
        print(f"# tail KE: run {ke[tail].mean():.3e}  ref {ref_ke[tail].mean():.3e}")
        assert 0.1 < ke[tail].mean() / ref_ke[tail].mean() < 10.0
        print("MPM SOAK OK (trace matches recorded run)")
    if args.update or not os.path.exists(TRACE):
        rows = [{"frame": i, "ke": float(ke[i]),
                 "min_det_fp": float(mnds[i]), "max_det_fp": float(mxds[i])}
                for i in range(len(ke))]
        json.dump(rows, open(TRACE, "w"))
        print(f"wrote {TRACE}")


if __name__ == "__main__":
    main()
