"""The fully-Pallas MPM transfer pipeline vs ops.mpm_fast, in Mosaic
interpret mode on CPU (compiled equivalence is re-checked on real TPU by
``scripts/validate_pallas.py``).

Covers: sorted-state equivalence, mass+momentum P2G, the frame-0 density
gather, the gradW-contracted velocity-gradient gather, the in-kernel force
scatter (f0) and its explicit linearization (dforce vs jax.jvp of the XLA
force), and the FLIP delta gather.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidsim_tpu.models.mpm import MpmSim, MpmParams
from fluidsim_tpu.ops import mpm_fast as mf
from fluidsim_tpu.ops import mpm_pallas as mp
from fluidsim_tpu.ops import transfer_pallas as tp
from fluidsim_tpu.ops.svd3 import hardening, det3

B = 15
N = 2 * B + 1
WALL = 13


@pytest.fixture(scope="module")
def state():
    sim = MpmSim("mpm_cone", density=40.0,
                 params=MpmParams(fast_transfer=True))
    for _ in range(3):
        sim.step()
    return sim


@pytest.fixture(scope="module")
def sorted_state(state):
    st = state.state
    lay = tp.HaloLayout(N)
    pos, vel, FE, FP, vol, flat_h = mp.sort_mpm_h(
        st.pos, st.vel, st.FE, st.FP, st.volume, B, lay)
    pos2, vel2, FE2, FP2, vol2, flat_s = mf.sort_mpm(
        st.pos, st.vel, st.FE, st.FP, st.volume, B)
    # both sorts order by (monotone transforms of) the same base-cell key
    # with a stable sort, so the particle order is identical
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos2))
    np.testing.assert_array_equal(np.asarray(FE), np.asarray(FE2))
    rows = mp.pack_mpm_rows(flat_h, pos, vel, B)
    # the channel-major pack reproduces the (P, 27, 3) stencil arrays
    w27 = tp.masked_weights(pos, B, "mpm")
    _, gradw = mf.stencil_mpm(pos)
    np.testing.assert_allclose(np.asarray(rows[:27, :pos.shape[0]].T),
                               np.asarray(w27), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rows[40:121, :pos.shape[0]].T),
        np.asarray(gradw.reshape(-1, 81)), atol=1e-6)
    return dict(lay=lay, pos=pos, vel=vel, FE=FE, FP=FP, vol=vol,
                flat_h=flat_h, flat_s=flat_s, gradw=gradw, rows=rows,
                solid=state.solid)


def test_chunked_pack_matches_direct(sorted_state):
    """The lax.scan block-pack (large-P memory bound) is bit-identical to
    the single-shot pack."""
    s = sorted_state
    direct = mp.pack_mpm_rows(s["flat_h"], s["pos"], s["vel"], B)
    chunked = mp.pack_mpm_rows(s["flat_h"], s["pos"], s["vel"], B,
                               chunk=1000)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(chunked))


def test_p2g_and_density_match_fast(sorted_state):
    s = sorted_state
    mass, mom = mp.p2g_mpm(s["rows"], s["flat_h"], s["solid"], B, s["lay"],
                           interpret=True)
    massX, momX = mf.p2g_mpm(s["pos"], s["vel"], s["flat_s"], s["solid"], B)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(massX),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mom), np.asarray(momX),
                               atol=1e-5, rtol=1e-5)

    dens = mp.density(mass, s["rows"], s["flat_h"], s["solid"], B, s["lay"],
                      interpret=True)
    w, _ = mf.stencil_mpm(s["pos"])
    valid = jnp.all(jnp.abs(jnp.round(s["pos"])) <= B, axis=-1)
    rows_m = mf.gather_table(mass[..., None], ~s["solid"], s["flat_s"])
    densX = jnp.sum(jnp.where(valid[:, None], w, 0.0)
                    * rows_m[..., 0] * rows_m[..., 1], axis=1)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(densX),
                               atol=1e-5, rtol=1e-5)


def test_gradv_and_flip_delta_match_fast(sorted_state):
    s = sorted_state
    key = jax.random.PRNGKey(0)
    velg = jax.random.normal(key, (N, N, N, 3), jnp.float32)
    gv = mp.gradv_gather(velg, s["rows"], s["flat_h"], s["solid"], B,
                         s["lay"], interpret=True)
    gvX = mf.g2p_gradv(velg, s["flat_s"], s["gradw"], s["solid"], B)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gvX),
                               atol=1e-4, rtol=1e-4)

    dvc = jax.random.normal(jax.random.PRNGKey(1), (N, N, N, 3), jnp.float32)
    d = mp.flip_delta(s["pos"], s["rows"], s["flat_h"], dvc, B, WALL,
                      s["lay"], interpret=True)
    dX = mf.g2p_flip_mpm(s["pos"], s["flat_s"], dvc, B, WALL)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dX),
                               atol=1e-5, rtol=1e-4)


def test_force_and_hessp_match_fast(sorted_state):
    s = sorted_state
    params = MpmParams()
    mass, _ = mf.p2g_mpm(s["pos"], s["vel"], s["flat_s"], s["solid"], B)
    active = (mass > params.mass_threshold) & (~s["solid"])
    mu, lam = hardening(params.mu0, params.lam0, params.hardening_eps,
                        det3(s["FP"]), exponent_cap=params.hardening_max)
    valid = jnp.all(jnp.abs(jnp.round(s["pos"])) <= B, axis=-1)
    volume = jnp.maximum(s["vol"], 1e-3)   # frame>0 volumes are set

    forcesX = mf.make_force_fn_fused(
        s["pos"], s["flat_s"], s["gradw"], valid[:, None].astype(jnp.float32),
        s["FE"], volume, mu, lam, active, s["solid"], B)
    f0, dforce = mp.make_force_fns(
        s["pos"], s["flat_h"], s["rows"], s["FE"], volume, mu,
        lam, active, s["solid"], B, s["lay"], interpret=True)

    zeros = jnp.zeros((N, N, N, 3), jnp.float32)
    f0X = forcesX(zeros)
    f0P = f0()
    scale = float(jnp.max(jnp.abs(f0X))) + 1e-30
    np.testing.assert_allclose(np.asarray(f0P) / scale,
                               np.asarray(f0X) / scale, atol=2e-6)

    u = jnp.where(active[..., None],
                  jax.random.normal(jax.random.PRNGKey(2), (N, N, N, 3)), 0.0)
    _, dfX = jax.jvp(forcesX, (zeros,), (u,))
    dfP = dforce(u)
    dscale = float(jnp.max(jnp.abs(dfX))) + 1e-30
    np.testing.assert_allclose(np.asarray(dfP) / dscale,
                               np.asarray(dfX) / dscale, atol=2e-6)


def test_full_step_matches_fast(state):
    """One full frame through mpm_step with the Pallas pipeline (interpret
    mode) against the fast XLA path."""
    p_fast = MpmParams(fast_transfer=True)
    p_pal = MpmParams(pallas_transfer=True, pallas_interpret=True)
    a = MpmSim("mpm_cone", density=40.0, params=p_fast)
    b = MpmSim("mpm_cone", density=40.0, params=p_pal)
    ma = a.step()
    mb = b.step()
    np.testing.assert_allclose(float(mb["kinetic_energy"]),
                               float(ma["kinetic_energy"]), rtol=1e-4)
    assert int(mb["num_active_cells"]) == int(ma["num_active_cells"])
    np.testing.assert_allclose(np.asarray(b.state.pos),
                               np.asarray(a.state.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.state.FE),
                               np.asarray(a.state.FE), atol=1e-5)


def test_pack_mpm_rows_chunked_equals_full():
    """Regression (round 5): the chunked pack's last block used to
    dynamic_update_slice past the buffer end whenever nch*chunk exceeded
    p_padl; XLA clamps the start index, so the block landed misaligned
    over the previous one and the true tail stayed zero — every MPM run
    past 524k particles silently dropped ~the last block's contributions
    (measured ~10% of the 127^3 cone's mass with a forced small chunk)."""
    rng = np.random.default_rng(7)
    bound = 15
    p, chunk = 4097, 4096          # nch*chunk=8192 > p_padl=6400: triggers
    pos = (rng.random((p, 3), np.float32) * 24 - 12).astype(np.float32)
    vel = rng.standard_normal((p, 3)).astype(np.float32)
    n = 2 * bound + 1
    lay = tp.HaloLayout(n)
    from fluidsim_tpu.core.splines import cround
    from fluidsim_tpu.ops import pallas_shift as ps
    base = np.round(pos).astype(np.int64)
    gx = np.clip(base[:, 0] + bound, 0, n - 1)
    gy = np.clip(base[:, 1] + bound, 0, n - 1)
    gz = np.clip(base[:, 2] + bound, 0, n - 1)
    flat = ((gx + ps._XH) * lay.lwr + lay.lh + gy * n + gz).astype(np.int32)
    order = np.argsort(flat, kind="stable")
    flat_h = jnp.asarray(flat[order])
    pos_s = jnp.asarray(pos[order])
    vel_s = jnp.asarray(vel[order])

    full = np.asarray(mp.pack_mpm_rows(flat_h, pos_s, vel_s, bound,
                                       chunk=1 << 19))
    chunked = np.asarray(mp.pack_mpm_rows(flat_h, pos_s, vel_s, bound,
                                          chunk=chunk))
    # f32 fusion order differs slightly between the scan body and the
    # one-shot path; the bug this guards against zeroed/misplaced whole
    # blocks (O(1)-magnitude weight entries), far above this tolerance
    np.testing.assert_allclose(chunked, full, atol=1e-6)
