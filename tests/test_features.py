"""Tests for APIC transfers, extrapolation, MAC converters, resampling,
rendering/LOD tools, and failure detection."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from fluidsim_tpu.core.gridspec import GridSpec
from fluidsim_tpu.models.flip import FlipSim, FlipParams
from fluidsim_tpu.ops import apic, transfer_fast as tf
from fluidsim_tpu.ops.extrapolate import (extrapolate, to_collocated,
                                          to_staggered, resample_mask)
from fluidsim_tpu.io.render import render_volume, write_png, build_lod
from fluidsim_tpu.scenes import get_scene
from fluidsim_tpu.utils.profiling import check_finite, PhaseTimer


def test_apic_rigid_translation_preserved():
    # Constant velocity field: APIC must return v and C == 0.
    spec = GridSpec(bound=10, wall=8)
    solid = jnp.asarray(spec.wall_mask())
    rng = np.random.default_rng(0)
    npart = 8000
    pos = jnp.asarray(rng.uniform(-5, 5, size=(npart, 3)), jnp.float32)
    vel = jnp.broadcast_to(jnp.asarray([1.0, -2.0, 0.5], jnp.float32),
                           (npart, 3))
    aff = jnp.zeros((npart, 3, 3), jnp.float32)
    pos_s, vel_s, flat, aff_s = tf.sort_by_cell(pos, vel, 10,
                                                extra=aff.reshape(-1, 9))
    w, mom, occ = apic.p2g_apic(pos_s, vel_s, aff_s.reshape(-1, 3, 3), flat,
                                solid, 10)
    velg = jnp.where(w[..., None] > 0, mom / jnp.where(w > 0, w, 1)[..., None], 0)
    from fluidsim_tpu.core.gridspec import cell_center_velocity
    vc = cell_center_velocity(velg)
    v_out, c_out = apic.g2p_apic(pos_s, flat, vc, 10, 8)
    interior = np.all(np.abs(np.asarray(pos_s)) < 4, axis=1)
    np.testing.assert_allclose(np.asarray(v_out)[interior],
                               np.broadcast_to([1.0, -2.0, 0.5],
                                               (interior.sum(), 3)),
                               atol=0.05)
    # C should be ~0 for constant v (grid field flat in the interior)
    assert np.abs(np.asarray(c_out)[interior]).max() < 0.1


def test_apic_rotation_recovered():
    # v = omega x r: the C matrix must capture the angular velocity.
    spec = GridSpec(bound=12, wall=10)
    solid = jnp.asarray(spec.wall_mask())
    rng = np.random.default_rng(1)
    pos = np.asarray(rng.uniform(-5, 5, size=(4000, 3)), np.float32)
    omega = np.asarray([0.0, 0.0, 1.0])
    vel = np.cross(np.broadcast_to(omega, pos.shape), pos).astype(np.float32)
    aff = jnp.zeros((4000, 3, 3), jnp.float32)
    pos_s, vel_s, flat, aff_s = tf.sort_by_cell(
        jnp.asarray(pos), jnp.asarray(vel), 12, extra=aff.reshape(-1, 9))
    w, mom, occ = apic.p2g_apic(pos_s, vel_s, aff_s.reshape(-1, 3, 3), flat,
                                solid, 12)
    velg = jnp.where(w[..., None] > 0, mom / jnp.where(w > 0, w, 1)[..., None], 0)
    from fluidsim_tpu.core.gridspec import cell_center_velocity
    vc = cell_center_velocity(velg)
    v_out, c_out = apic.g2p_apic(pos_s, flat, vc, 12, 10)
    interior = np.all(np.abs(np.asarray(pos_s)) < 3.5, axis=1)
    c = np.asarray(c_out)[interior]
    # grad v of omega x r = [[0,-1,0],[1,0,0],[0,0,0]]
    np.testing.assert_allclose(np.median(c[:, 0, 1]), -1.0, atol=0.25)
    np.testing.assert_allclose(np.median(c[:, 1, 0]), 1.0, atol=0.25)
    assert abs(np.median(c[:, 2, 2])) < 0.1


def test_apic_full_sim_runs():
    sim = FlipSim(get_scene("water_cube_drop", bound=10, density=3.0),
                  params=FlipParams(bound=10, wall=8, mode="apic"))
    for _ in range(5):
        m = sim.step()
    assert np.isfinite(float(m["kinetic_energy"]))
    assert sim.state.aff is not None
    assert np.isfinite(np.asarray(sim.state.aff)).all()


def test_extrapolate_floods_from_seed():
    n = 17
    vel = jnp.zeros((n, n, n, 3), jnp.float32)
    defined = jnp.zeros((n, n, n), bool)
    vel = vel.at[8, 8, 8].set(jnp.asarray([3.0, 0.0, 0.0]))
    defined = defined.at[8, 8, 8].set(True)
    v, d = extrapolate(vel, defined)
    assert bool(d.all())
    np.testing.assert_allclose(np.asarray(v[..., 0]), 3.0, atol=1e-5)


def test_extrapolate_averages_two_sources():
    n = 9
    vel = jnp.zeros((n, n, n, 3), jnp.float32)
    defined = jnp.zeros((n, n, n), bool)
    vel = vel.at[0, 4, 4, 0].set(0.0)
    vel = vel.at[8, 4, 4, 0].set(8.0)
    defined = defined.at[0, 4, 4].set(True).at[8, 4, 4].set(True)
    v, d = extrapolate(vel, defined)
    assert bool(d.all())
    # monotone-ish gradient between the sources along x
    mid = np.asarray(v[:, 4, 4, 0])
    assert mid[0] == 0.0 and mid[8] == 8.0
    assert (np.diff(mid) >= -1e-4).all()


def test_mac_converters_roundtrip_linear_field():
    # For a linear velocity field, centre->face->centre is exact in the
    # interior.
    n = 12
    x = np.arange(n, dtype=np.float32)
    vc = np.zeros((n, n, n, 3), np.float32)
    vc[..., 0] = 2.0 * x[:, None, None] + 1.0
    stag = to_staggered(jnp.asarray(vc))
    back = to_collocated(stag)
    np.testing.assert_allclose(np.asarray(back)[1:-1, :, :, 0],
                               vc[1:-1, :, :, 0], atol=1e-4)


def test_resample_mask_caps_cells():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.concatenate([
        np.full((20, 3), 0.1), rng.uniform(3, 5, size=(10, 3))]), jnp.float32)
    keep = resample_mask(pos, bound=8, max_per_cell=4)
    kept = np.asarray(keep)
    assert kept[:20].sum() == 4          # crowded cell capped
    assert kept[20:].sum() >= 8          # sparse cells untouched


def test_render_and_png(tmp_path):
    rng = np.random.default_rng(0)
    dens = np.zeros((32, 32, 32), np.float32)
    dens[8:24, 8:24, 8:24] = rng.random((16, 16, 16)) * 20
    img = render_volume(dens)
    assert img.shape == (32, 32, 3)
    assert img.min() < 250                # something rendered
    p = str(tmp_path / "t.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" in data


def test_build_lod():
    v = np.ones((8, 8, 8), np.float32)
    pyr = build_lod(v)
    assert [p.shape[0] for p in pyr] == [8, 4, 2, 1]
    np.testing.assert_allclose(pyr[-1], 1.0)


def test_check_finite_raises():
    with pytest.raises(FloatingPointError):
        check_finite({"kinetic_energy": float("nan"), "dt": 0.1}, 3)
    with pytest.raises(FloatingPointError):
        check_finite({"kinetic_energy": 1.0, "dt": float("inf")}, 3)
    check_finite({"kinetic_energy": 1.0, "dt": 0.1}, 3)


def test_cli_render_lod(tmp_path):
    from fluidsim_tpu.cli import main as cli_main
    out = str(tmp_path / "sim")
    cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
              "--density", "3", "--frames", "1", "--out", out, "--no-accum",
              "--echo-every", "100"])
    vdb = os.path.join(out, "mygrids0.vdb")
    assert cli_main(["render", vdb]) == 0
    assert os.path.exists(os.path.join(out, "mygrids0.png"))
    assert cli_main(["lod", vdb]) == 0
    assert os.path.exists(os.path.join(out, "mygrids0_lod.vdb"))


def test_image_writers_roundtrip(tmp_path):
    """PPM (binary P6) and minimal uncompressed EXR, the two formats the
    reference's vdb_render emits (cmd/openvdb_render/main.cc:405-410)."""
    import numpy as np
    from fluidsim_tpu.io.render import (write_ppm, write_exr, read_exr,
                                        write_image)

    img = np.random.default_rng(0).random((6, 4, 3)).astype(np.float32)
    p = str(tmp_path / "a.exr")
    write_exr(p, img)
    back, ch = read_exr(p)
    assert ch == ["R", "G", "B"]
    np.testing.assert_array_equal(back, img)

    # grayscale EXR
    write_exr(p, img[..., 0])
    back, ch = read_exr(p)
    assert ch == ["Y"] and back.shape == (6, 4, 1)
    np.testing.assert_array_equal(back[..., 0], img[..., 0])

    u8 = (img * 255).astype(np.uint8)
    pp = str(tmp_path / "a.ppm")
    write_ppm(pp, u8)
    raw = open(pp, "rb").read()
    assert raw.startswith(b"P6\n4 6\n255\n")
    got = np.frombuffer(raw[len(b"P6\n4 6\n255\n"):], np.uint8)
    np.testing.assert_array_equal(got.reshape(6, 4, 3), u8)

    # extension dispatch
    for ext in ("png", "ppm", "exr"):
        f = str(tmp_path / f"d.{ext}")
        write_image(f, u8)
        assert os.path.getsize(f) > 0


def test_cli_render_exr_ppm(tmp_path):
    from fluidsim_tpu.cli import main as cli_main
    from fluidsim_tpu.io.render import read_exr
    out = str(tmp_path / "sim")
    cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
              "--density", "3", "--frames", "1", "--out", out, "--no-accum",
              "--echo-every", "100"])
    vdb = os.path.join(out, "mygrids0.vdb")
    exr = os.path.join(out, "f.exr")
    assert cli_main(["render", vdb, "-o", exr]) == 0
    img, ch = read_exr(exr)
    assert ch == ["R", "G", "B"] and img.shape[-1] == 3
    ppm = os.path.join(out, "f.ppm")
    assert cli_main(["render", vdb, "-o", ppm]) == 0
    assert open(ppm, "rb").read(2) == b"P6"


def test_render_volume_fog_options():
    """vdb_render fog light-model parity (-absorb/-scatter/-gain/-cutoff,
    cmd/openvdb_render/main.cc:82-111): defaults reproduce the legacy
    single-knob image; each knob changes the render in the expected
    direction."""
    import numpy as np

    from fluidsim_tpu.io.render import render_volume

    d = np.zeros((21, 21, 21), np.float32)
    d[5:15, 5:15, 5:15] = 2.0
    base = render_volume(d)
    # scalar absorption == per-channel broadcast of the same value
    same = render_volume(d, absorption=(0.1, 0.1, 0.1))
    np.testing.assert_array_equal(base, same)
    # per-channel absorb tints the image
    tint = render_volume(d, absorption=(0.3, 0.1, 0.05))
    assert not np.array_equal(base, tint)
    # higher gain brightens the fluid
    bright = render_volume(d, gain=0.4)
    assert bright.astype(int).sum() > base.astype(int).sum()
    # scatter scales the same emission term
    np.testing.assert_array_equal(render_volume(d, scatter=3.0), bright)
    # a cutoff above any transmittance suppresses all in-scatter -> darker
    dark = render_volume(d, cutoff=2.0)
    assert dark.astype(int).sum() < base.astype(int).sum()
