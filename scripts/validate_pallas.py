"""Validate the fully-Pallas transfer pipeline against the XLA fused path
on the current backend (meant for the real TPU; CPU tests cover the XLA
path, the stencil kernel in interpret mode, and full-step physics).

Compares p2g (weights / momentum / occupancy) and the FLIP g2p delta for a
physically-typical particle distribution, plus full-step trajectories over
a few frames.

Usage: python scripts/validate_pallas.py [--bound 24] [--density 6]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=24)
    ap.add_argument("--density", type=float, default=6.0)
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    from fluidsim_tpu.models.flip import FlipSim, FlipParams
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import transfer_fast as tf
    from fluidsim_tpu.ops import transfer as tr

    scene = get_scene("water_cube_drop", bound=args.bound,
                      density=args.density)
    B = args.bound
    sim = FlipSim(scene)
    assert sim.params.pallas_transfer, "pallas path not active on this backend"
    for _ in range(3):
        sim.step()
    solid = sim.solid
    st = sim.state

    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = jax.jit(
        lambda p, v: tp.sort_by_cell_h(p, v, B, lay))(st.pos, st.vel)

    # --- P2G ---
    w27 = jax.jit(lambda p: tp.masked_weights(p, B, "flip"))(pos)
    wP, momP, occP, wv_rows = jax.jit(
        lambda p, v, f, w: tp.p2g_pallas(p, v, f, solid, B, lay, "flip",
                                         w27=w))(pos, vel, flat, w27)

    pos2, vel2, flat2 = jax.jit(
        lambda p, v: tf.sort_by_cell(p, v, B))(st.pos, st.vel)
    wX, momX, occX = jax.jit(
        lambda p, v, f: tf.p2g_fused(p, v, f, solid, B, "flip"))(pos2, vel2,
                                                                 flat2)

    for name, a, b in (("weights", wP, wX), ("momentum", momP, momX),
                       ("occupancy", occP, occX)):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / (float(jnp.max(jnp.abs(b))) + 1e-30)
        print(f"p2g {name:9s} max|diff| {d:.3e}  rel {rel:.3e}")
        assert rel < 1e-5, name

    # --- G2P (FLIP delta on a synthetic smooth field) ---
    from fluidsim_tpu.core.gridspec import cell_center_velocity
    velg = tr.normalize_velocity(wP, momP)
    vc = cell_center_velocity(velg)
    dP = jax.jit(lambda p, f, fields, wv: tp.g2p_pallas(
        p, f, fields, B, scene.spec.wall, lay, "flip",
        wv_rows=wv))(pos, flat, vc, wv_rows)
    dX = jax.jit(lambda p, f, fields: tf.g2p_fused(
        p, f, fields, B, scene.spec.wall, "flip"))(pos2, flat2, vc)
    d = float(jnp.max(jnp.abs(dP - dX)))
    rel = d / (float(jnp.max(jnp.abs(dX))) + 1e-30)
    print(f"g2p delta     max|diff| {d:.3e}  rel {rel:.3e}")
    assert rel < 1e-5

    # --- full-step trajectory: pallas vs XLA fused ---
    import dataclasses
    simA = FlipSim(scene)
    simB = FlipSim(scene, params=dataclasses.replace(
        simA.params, pallas_transfer=False))
    assert simA.params.pallas_transfer and not simB.params.pallas_transfer
    for i in range(args.frames):
        ma = simA.step()
        mb = simB.step()
        kea, keb = float(ma["kinetic_energy"]), float(mb["kinetic_energy"])
        rel = abs(kea - keb) / (abs(keb) + 1e-30)
        print(f"frame {i}: KE pallas {kea:.6e} xla {keb:.6e} rel {rel:.2e}")
        assert rel < 1e-4
    dpos = float(jnp.max(jnp.abs(jnp.sort(simA.state.pos, axis=0)
                                 - jnp.sort(simB.state.pos, axis=0))))
    print(f"sorted-position max diff after {args.frames} frames: {dpos:.3e}")

    # --- APIC full-step trajectory: pallas vs XLA fused ---
    from fluidsim_tpu.models.flip import FlipParams
    apic_params = FlipParams(bound=args.bound, wall=scene.spec.wall,
                             mode="apic")
    simA = FlipSim(scene, params=apic_params)
    simB = FlipSim(scene, params=dataclasses.replace(
        apic_params, pallas_transfer=False))
    assert simA.params.pallas_transfer and not simB.params.pallas_transfer
    for i in range(args.frames):
        kea = float(simA.step()["kinetic_energy"])
        keb = float(simB.step()["kinetic_energy"])
        rel = abs(kea - keb) / (abs(keb) + 1e-30)
        print(f"APIC frame {i}: KE pallas {kea:.6e} xla {keb:.6e} rel {rel:.2e}")
        assert rel < 1e-3
    print("PALLAS PIPELINE VALIDATED (FLIP + APIC)")

    # --- sharded paths on a single-device mesh: the compiled (non-
    # interpret) sharded Pallas kernels get real-TPU coverage despite the
    # machine having one chip; oracle = the single-chip trajectories. ---
    from jax.sharding import Mesh
    from fluidsim_tpu.parallel.flip_sharded import ShardedFlipSim
    from fluidsim_tpu.parallel.mpm_sharded import ShardedMpmSim
    from fluidsim_tpu.models.mpm import MpmSim

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    ssim = ShardedFlipSim(scene, mesh=mesh)
    ref = FlipSim(scene)
    assert ssim.num_particles == ref.num_particles
    for i in range(args.frames):
        ms = ssim.step()
        mr = ref.step()
        kes, ker = float(ms["kinetic_energy"]), float(mr["kinetic_energy"])
        rel = abs(kes - ker) / (abs(ker) + 1e-30)
        print(f"sharded FLIP frame {i}: KE sharded {kes:.6e} single "
              f"{ker:.6e} rel {rel:.2e}")
        assert rel < 2e-3
        assert int(ms["lost"]) == 0
        assert int(ms["num_fluid_cells"]) == int(mr["num_fluid_cells"])

    msim = ShardedMpmSim(get_scene("mpm_cone"), mesh=mesh)
    mref = MpmSim("mpm_cone")
    for i in range(args.frames):
        kes = float(msim.step()["kinetic_energy"])
        ker = float(mref.step()["kinetic_energy"])
        rel = abs(kes - ker) / (abs(ker) + 1e-30)
        print(f"sharded MPM frame {i}: KE sharded {kes:.6e} single "
              f"{ker:.6e} rel {rel:.2e}")
        assert rel < 2e-3
    print("SHARDED-ON-TPU VALIDATED (FLIP + MPM, 1-device mesh)")


if __name__ == "__main__":
    main()
