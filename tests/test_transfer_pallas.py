"""The fully-Pallas transfer pipeline vs the XLA fused path, in Mosaic
interpret mode on CPU (compiled equivalence is re-checked on real TPU by
``scripts/validate_pallas.py``).

Covers the packed-row kernels (in-kernel u build, in-kernel 27-weight
contraction) end to end: p2g weights/momentum/occupancy and the normalised
g2p gather.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidsim_tpu.models.flip import FlipSim
from fluidsim_tpu.scenes import get_scene
from fluidsim_tpu.ops import transfer_pallas as tp
from fluidsim_tpu.ops import transfer_fast as tf
from fluidsim_tpu.ops import transfer as tr
from fluidsim_tpu.core.gridspec import cell_center_velocity

BOUND = 8


@pytest.fixture(scope="module")
def state():
    scene = get_scene("water_cube_drop", bound=BOUND, density=3.0)
    sim = FlipSim(scene)
    for _ in range(3):
        sim.step()
    return scene, sim.solid, sim.state


def test_p2g_and_g2p_match_xla(state):
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    w27 = tp.masked_weights(pos, B, "flip")
    wP, momP, occP, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                       "flip", w27=w27, interpret=True)

    pos2, vel2, flat2 = tf.sort_by_cell(st.pos, st.vel, B)
    wX, momX, occX = tf.p2g_fused(pos2, vel2, flat2, solid, B, "flip")

    for name, a, b in (("weights", wP, wX), ("momentum", momP, momX),
                       ("occupancy", occP, occX)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    velg = tr.normalize_velocity(wP, momP)
    vc = cell_center_velocity(velg)
    dP = tp.g2p_pallas(pos, flat, vc, B, scene.spec.wall, lay, "flip",
                       wv_rows=wv, interpret=True)
    dX = tf.g2p_fused(pos2, flat2, vc, B, scene.spec.wall, "flip")
    np.testing.assert_allclose(np.asarray(dP), np.asarray(dX),
                               atol=1e-5, rtol=1e-4)


def test_g2p_without_p2g_rows(state):
    """g2p_pallas builds its own packed rows when none are passed."""
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    fields = jnp.stack([jnp.ones((2 * B + 1,) * 3)] * 3, axis=-1)
    out = tp.g2p_pallas(pos, flat, fields, B, scene.spec.wall, lay, "flip",
                        interpret=True)
    # constant field inside the wall: normalised gather returns ~1 for
    # particles whose stencil is fully inside
    inner = np.all(np.abs(np.asarray(pos)) < scene.spec.wall - 2, axis=-1)
    np.testing.assert_allclose(np.asarray(out)[inner], 1.0, atol=1e-5)


def test_apic_p2g_g2p_match_xla(state):
    """APIC fused kernels vs ops.apic: affine-augmented momentum scatter
    and the centred B/D affine fit from in-kernel offset moments."""
    from fluidsim_tpu.ops import apic

    scene, solid, st = state
    B = BOUND
    rng = np.random.default_rng(7)
    aff = jnp.asarray(rng.normal(scale=0.5,
                                 size=(st.pos.shape[0], 3, 3)),
                      jnp.float32)

    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat, aff_f = tp.sort_by_cell_h(st.pos, st.vel, B, lay,
                                              extra=aff.reshape(-1, 9))
    aff_s = aff_f.reshape(-1, 3, 3)
    w27 = tp.masked_weights(pos, B, "flip")
    wP, momP, occP, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                       "flip", w27=w27, aff=aff_s,
                                       interpret=True)

    pos2, vel2, flat2, aff_f2 = tf.sort_by_cell(st.pos, st.vel, B,
                                                extra=aff.reshape(-1, 9))
    aff_s2 = aff_f2.reshape(-1, 3, 3)
    wX, momX, occX = apic.p2g_apic(pos2, vel2, aff_s2, flat2, solid, B,
                                   "flip")
    for name, a, b in (("weights", wP, wX), ("momentum", momP, momX),
                       ("occupancy", occP, occX)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=name)

    velg = tr.normalize_velocity(wP, momP)
    vc = cell_center_velocity(velg)
    vP, cP = tp.g2p_apic_pallas(pos, flat, vc, B, scene.spec.wall, lay,
                                "flip", wv_rows=wv, interpret=True)
    vX, cX = apic.g2p_apic(pos2, flat2, vc, B, scene.spec.wall, "flip")
    np.testing.assert_allclose(np.asarray(vP), np.asarray(vX),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cP), np.asarray(cX),
                               atol=5e-4, rtol=5e-3)


def test_packed_projection_matches_xla(state):
    """The packed-layout CG solve (Pallas stencil + lane-128 axpys) must
    reproduce the XLA-layout projection; covered compiled on TPU by
    scripts/validate_pallas.py, here in Mosaic interpret mode."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu
    from fluidsim_tpu.models.flip import FlipParams, project
    from fluidsim_tpu.ops import transfer_fast as tf

    scene, solid, st = state
    B = BOUND
    params = FlipParams(bound=B, wall=scene.spec.wall)
    pos2, vel2, flat2 = tf.sort_by_cell(st.pos, st.vel, B)
    w, mom, occ = tf.p2g_fused(pos2, vel2, flat2, solid, B, "flip")
    velg = tr.normalize_velocity(w, mom)
    fluid = (occ > 0) & (~solid)
    dt = jnp.asarray(0.1, jnp.float32)

    ref = project(params, velg, fluid, solid, dt)
    with pltpu.force_tpu_interpret_mode():
        packed = project(dataclasses.replace(params, pallas_transfer=True),
                         velg, fluid, solid, dt)

    np.testing.assert_allclose(np.asarray(packed[0]), np.asarray(ref[0]),
                               atol=5e-4, rtol=1e-3)     # velocity field
    assert int(packed[2]) == int(ref[2])                 # outer iterations
    np.testing.assert_allclose(float(packed[1]), float(ref[1]), atol=1e-3)

def test_channel_major_grid_phase_matches(state):
    """The channel-major (3,N,N,N) grid phase the production Pallas step
    runs (p2g epilogue -> project(cm=True) -> cell centring -> g2p table
    build) must be a pure relayout of the (N,N,N,3) formulation."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu
    from fluidsim_tpu.models.flip import FlipParams, project
    from fluidsim_tpu.core.gridspec import cell_center_velocity_cm

    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    w27 = tp.masked_weights(pos, B, "flip")
    wP, momP, occP, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                       "flip", w27=w27, interpret=True)
    wC, momC, occC, _ = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                      "flip", w27=w27, interpret=True,
                                      channel_major=True)
    np.testing.assert_array_equal(np.asarray(momC),
                                  np.moveaxis(np.asarray(momP), -1, 0))
    np.testing.assert_array_equal(np.asarray(wC), np.asarray(wP))

    velg = tr.normalize_velocity(wP, momP)
    velg_cm = tr.normalize_velocity_cm(wC, momC)
    np.testing.assert_array_equal(np.asarray(velg_cm),
                                  np.moveaxis(np.asarray(velg), -1, 0))

    fluid = (occP > 0) & (~solid)
    dt = jnp.asarray(0.1, jnp.float32)
    params = dataclasses.replace(FlipParams(bound=B, wall=scene.spec.wall),
                                 pallas_transfer=True)
    with pltpu.force_tpu_interpret_mode():
        ref = project(params, velg, fluid, solid, dt)
        out = project(params, velg_cm, fluid, solid, dt, cm=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.moveaxis(np.asarray(ref[0]), -1, 0),
                               atol=1e-6, rtol=1e-6)
    assert int(out[2]) == int(ref[2])

    vc = cell_center_velocity(ref[0])
    vc_cm = cell_center_velocity_cm(out[0])
    np.testing.assert_allclose(np.asarray(vc_cm),
                               np.moveaxis(np.asarray(vc), -1, 0),
                               atol=1e-6, rtol=1e-6)

    dP = tp.g2p_pallas(pos, flat, vc, B, scene.spec.wall, lay, "flip",
                       wv_rows=wv, interpret=True)
    dC = tp.g2p_pallas(pos, flat, vc_cm, B, scene.spec.wall, lay, "flip",
                       wv_rows=wv, interpret=True, channel_major=True)
    np.testing.assert_allclose(np.asarray(dC), np.asarray(dP),
                               atol=1e-6, rtol=1e-6)

    vA, cA = tp.g2p_apic_pallas(pos, flat, vc, B, scene.spec.wall, lay,
                                "flip", wv_rows=wv, interpret=True)
    vAc, cAc = tp.g2p_apic_pallas(pos, flat, vc_cm, B, scene.spec.wall, lay,
                                  "flip", wv_rows=wv, interpret=True,
                                  channel_major=True)
    np.testing.assert_allclose(np.asarray(vAc), np.asarray(vA),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cAc), np.asarray(cA),
                               atol=1e-6, rtol=1e-6)


def test_fused_scatter_matches_materialized(state):
    """scatter_wv_fused (in-kernel shift-reduce) vs scatter_wv_cm +
    reduce_haloed, FLIP and APIC rows, interpret mode."""
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1)
    rng = np.random.default_rng(3)
    aff = jnp.asarray(rng.normal(scale=0.5, size=(st.pos.shape[0], 3, 3)),
                      jnp.float32)
    for use_aff in (None, aff):
        if use_aff is None:
            pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
            aff_s = None
        else:
            pos, vel, flat, aff_f = tp.sort_by_cell_h(
                st.pos, st.vel, B, lay, extra=use_aff.reshape(-1, 9))
            aff_s = aff_f.reshape(-1, 3, 3)
        a = tp.p2g_pallas(pos, vel, flat, solid, B, lay, "flip",
                          aff=aff_s, interpret=True, fused_scatter=True)
        b = tp.p2g_pallas(pos, vel, flat, solid, B, lay, "flip",
                          aff=aff_s, interpret=True, fused_scatter=False)
        for name, x, y in (("weights", a[0], b[0]), ("momentum", a[1], b[1]),
                           ("occupancy", a[2], b[2])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, rtol=1e-5, err_msg=name)


def test_fused_table_matches_materialized(state):
    """gather_wv_fused (in-kernel window build) vs expand_haloed +
    gather_wv_cm, both interpret-mode, FLIP (nout=8) and APIC (nout=24)."""
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1)
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    w27 = tp.masked_weights(pos, B, "flip")
    _, _, _, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay, "flip",
                                w27=w27, interpret=True)
    velg_like = jnp.stack(
        [jnp.sin(jnp.arange((2 * B + 1) ** 3, dtype=jnp.float32)
                 .reshape((2 * B + 1,) * 3) * (0.1 + d))
         for d in range(3)], axis=-1)
    a = tp.g2p_pallas(pos, flat, velg_like, B, scene.spec.wall, lay,
                      "flip", wv_rows=wv, interpret=True, fused_table=True)
    b = tp.g2p_pallas(pos, flat, velg_like, B, scene.spec.wall, lay,
                      "flip", wv_rows=wv, interpret=True, fused_table=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    va, ca = tp.g2p_apic_pallas(pos, flat, velg_like, B, scene.spec.wall,
                                lay, "flip", wv_rows=wv, interpret=True,
                                fused_table=True)
    vb, cb = tp.g2p_apic_pallas(pos, flat, velg_like, B, scene.spec.wall,
                                lay, "flip", wv_rows=wv, interpret=True,
                                fused_table=False)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_wide_lane_halo_matches_xla(state):
    """The lh=512 wide-halo path (used by 257^3-class grids) forced at
    small n via ``lhmin``: exercises the generalized kernel offsets that
    ``lane_halo(n)`` enables past n=255."""
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1, lhmin=512)
    assert lay.lh == 512
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    wP, momP, occP, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                       "flip", interpret=True)

    pos2, vel2, flat2 = tf.sort_by_cell(st.pos, st.vel, B)
    wX, momX, occX = tf.p2g_fused(pos2, vel2, flat2, solid, B, "flip")
    for name, a, b in (("weights", wP, wX), ("momentum", momP, momX),
                       ("occupancy", occP, occX)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    velg = tr.normalize_velocity(wP, momP)
    vc = cell_center_velocity(velg)
    dP = tp.g2p_pallas(pos, flat, vc, B, scene.spec.wall, lay, "flip",
                       wv_rows=wv, interpret=True)
    dX = tf.g2p_fused(pos2, flat2, vc, B, scene.spec.wall, "flip")
    np.testing.assert_allclose(np.asarray(dP), np.asarray(dX),
                               atol=1e-5, rtol=1e-4)


def test_wide_lane_halo_stencil_matches_row_kernel(state):
    """Lane-blocked stencil at forced lh (pad_x_lh layout) == the XLA
    matrix-free apply, on a small grid."""
    from fluidsim_tpu.ops import pallas_stencil as pst
    from fluidsim_tpu.ops import pressure as pr

    scene, solid, st = state
    n = 2 * BOUND + 1
    rng = np.random.default_rng(0)
    fluid = jnp.asarray(rng.random((n, n, n)) > 0.5) & (~solid)
    p = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    p = jnp.where(fluid, p, 0.0)
    dt, rho, dx = 0.1, 1.0, 1.0
    adiag = pr.laplacian_diag(fluid, solid, dt, rho, dx)
    scale = dt / (rho * dx * dx)

    want = pr.apply_laplacian(p, adiag, fluid, dt, rho, dx)

    # lane-blocked layout with a tiny lblk so the small grid spans blocks
    got = pst.unpad_x_lh(
        pst.apply_laplacian_padded_lh(
            pst.pad_x_lh(p, bx=8, lblk=128), pst.pad_x_lh(adiag, bx=8,
                                                          lblk=128),
            scale, n, bx=8, lblk=128, interpret=True),
        n, bx=8, lblk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("w,t", [(1024, 2048), (2048, 1024), (512, 4096)])
def test_window_width_sweep_matches_xla(state, w, t):
    """The transfer window width W / chunk rows T are sweepable layout
    parameters (the "fewer, wider windows" lever of the per-window
    fixed-cost model, docs/architecture.md): results must be identical
    for any (W, T)."""
    scene, solid, st = state
    B = BOUND
    lay = tp.HaloLayout(2 * B + 1, w=w, t=t)
    assert lay.lwr % w == 0
    pos, vel, flat = tp.sort_by_cell_h(st.pos, st.vel, B, lay)
    wP, momP, occP, wv = tp.p2g_pallas(pos, vel, flat, solid, B, lay,
                                       "flip", interpret=True)

    pos2, vel2, flat2 = tf.sort_by_cell(st.pos, st.vel, B)
    wX, momX, occX = tf.p2g_fused(pos2, vel2, flat2, solid, B, "flip")
    for name, a, b in (("weights", wP, wX), ("momentum", momP, momX),
                       ("occupancy", occP, occX)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    velg = tr.normalize_velocity(wP, momP)
    vc = cell_center_velocity(velg)
    dP = tp.g2p_pallas(pos, flat, vc, B, scene.spec.wall, lay, "flip",
                       wv_rows=wv, interpret=True)
    dX = tf.g2p_fused(pos2, flat2, vc, B, scene.spec.wall, "flip")
    np.testing.assert_allclose(np.asarray(dP), np.asarray(dX),
                               atol=1e-5, rtol=1e-4)
