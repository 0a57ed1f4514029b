"""Oracles for the small-tool family: Composite/Mask/Clip/PointsToMask/
SignedFloodFill/TopologyToLevelSet/ChangeBackground (ops/composite.py),
GridTransformer/MultiResGrid (ops/resample.py), Diagnostics
(ops/diagnostics.py), LevelSetPlatonic (ops/platonic.py), VolumeToSpheres
(ops/volume_to_spheres.py), LevelSetFracture (ops/levelset.py)."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.levelset import sphere_sdf, box_sdf, fracture
from fluidsim_tpu.ops import composite as cp
from fluidsim_tpu.ops.resample import (
    affine_resample, resample_to_match, build_pyramid, sample_pyramid)
from fluidsim_tpu.ops.diagnostics import (
    check_levelset, check_fog_volume, check_range, diagnose)
from fluidsim_tpu.ops.platonic import platonic_mesh, platonic_sdf, PLATONIC_FACES
from fluidsim_tpu.ops.volume_to_spheres import (
    fill_with_spheres, closest_surface_points)

B = 10
N = 2 * B + 1


# ---------------- composite ----------------

def test_comp_family_topology_union():
    a = jnp.full((3, 3, 3), 2.0)
    b = jnp.full((3, 3, 3), 5.0)
    am = jnp.zeros((3, 3, 3), bool).at[0].set(True)
    bm = jnp.zeros((3, 3, 3), bool).at[2].set(True).at[0].set(True)
    out = np.asarray(cp.comp_max(a, b, am, bm, background=-1.0))
    assert (out[0] == 5.0).all()        # both active: max
    assert (out[2] == 5.0).all()        # only b active: b passes through
    assert (out[1] == -1.0).all()       # neither: background
    out = np.asarray(cp.comp_sum(a, b, am, bm))
    assert (out[0] == 7.0).all() and (out[2] == 5.0).all()
    out = np.asarray(cp.comp_div(a, jnp.zeros_like(b)))
    assert (out == 0.0).all()           # div-by-zero -> 0
    out = np.asarray(cp.comp_replace(a, b, bm))
    assert (out[2] == 5.0).all() and (out[1] == 2.0).all()


def test_interior_mask_and_clip():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    m = cp.interior_mask(s)
    vol = int(np.sum(np.asarray(m)))
    assert np.isclose(vol, 4 / 3 * np.pi * 125, rtol=0.1)
    clipped = np.asarray(cp.clip_to_box(s, (0, -B, -B), (B, B, B), B,
                                        background=99.0))
    assert (clipped[:B] == 99.0).all() and (clipped[B:] != 99.0).any()
    masked = np.asarray(cp.clip_to_mask(s, m, background=7.0))
    assert (masked[0, 0, 0] == 7.0) and masked[B, B, B] < 0


def test_points_to_mask():
    pos = jnp.asarray([[0.2, 0.1, -0.3], [3.0, 3.0, 3.0], [3.4, 2.9, 3.1]])
    m = np.asarray(cp.points_to_mask(pos, B))
    assert m[B, B, B] and m[B + 3, B + 3, B + 3]
    assert m.sum() == 2  # two particles share a voxel


def test_signed_flood_fill():
    s = np.asarray(sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0))
    band = 2.0
    trunc = np.where(np.abs(s) < band, s, band)  # signs lost far inside
    out = np.asarray(cp.signed_flood_fill(jnp.asarray(trunc), band))
    assert out[B, B, B] == -band          # interior sign restored
    assert out[0, 0, 0] == band
    inner = np.abs(s) < band
    assert np.array_equal(out[inner], trunc[inner])
    # signs agree everywhere off the exact zero set (lattice points right
    # on the surface keep their stored 0.0, which has no sign)
    nz = s != 0
    assert (np.sign(out)[nz] == np.sign(s)[nz]).all()


def test_topology_to_levelset():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    mask = np.asarray(s) < 0
    phi = np.asarray(cp.topology_to_levelset(jnp.asarray(mask),
                                             half_width=3.0))
    assert phi[B, B, B] == -3.0 and phi[0, 0, 0] == 3.0
    line = phi[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) >= 1 and abs(int(crossing[0]) - 5) <= 1


def test_change_background():
    g = jnp.asarray([[[1.0, -1.0], [3.0, 0.5]], [[2.0, 2.0], [2.0, 2.0]]])
    act = jnp.asarray([[[False, False], [True, True]],
                       [[True, True], [True, True]]])
    out = np.asarray(cp.change_background(g, act, 9.0))
    assert out[0, 0, 0] == 9.0 and out[0, 1, 0] == 3.0
    out = np.asarray(cp.change_background(g, act, 9.0, levelset=True))
    assert out[0, 0, 0] == 9.0 and out[0, 0, 1] == -9.0


# ---------------- resample ----------------

def test_affine_resample_translation_and_scale():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    # translate the grid +3 in x: new field is a sphere centered at (3,0,0)
    out = affine_resample(s, jnp.eye(3), (3.0, 0.0, 0.0), B)
    expect = sphere_sdf(None, B, (3.0, 0.0, 0.0), 5.0)
    shell = np.abs(np.asarray(expect)) < 3
    assert np.abs(np.asarray(out) - np.asarray(expect))[shell].mean() < 0.05
    # uniform 2x scale-up: sphere radius doubles (SDF values scale too,
    # but the zero set is what we check)
    out = np.asarray(affine_resample(s, 2.0 * jnp.eye(3), (0.0, 0.0, 0.0), B))
    line = out[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) and abs(int(crossing[0]) - 10) <= 1


def test_affine_resample_rotation():
    s = box_sdf(None, B, (-6, -2, -2), (6, 2, 2))
    th = np.pi / 2
    rot = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]], jnp.float32)
    out = affine_resample(s, rot, (0.0, 0.0, 0.0), B)
    expect = box_sdf(None, B, (-2, -6, -2), (2, 6, 2))
    shell = np.abs(np.asarray(expect)) < 2
    assert np.abs(np.asarray(out) - np.asarray(expect))[shell].mean() < 0.1


def test_resample_to_match_nearest():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    # halving the voxel size shrinks the sphere's index-space radius 2x
    out = np.asarray(resample_to_match(s, 1.0, 2.0, B, order=0))
    line = out[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) and abs(int(crossing[0]) - 2) <= 1


def test_pyramid_sampling():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    pyr = build_pyramid(s, 3)
    assert pyr[1].shape == (N // 2, N // 2, N // 2)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [6.0, 0.0, 0.0], [0.0, -8.0, 0.0]])
    v0 = np.asarray(sample_pyramid(pyr, pos, B, 0.0))
    assert np.allclose(v0, [-6.0, 0.0, 2.0], atol=1e-5)
    v1 = np.asarray(sample_pyramid(pyr, pos, B, 1.0))
    # the coarse level approximates (2x pooling smooths the SDF's interior
    # extremum, so the center sample legitimately moves the most)
    assert np.abs(v1 - v0).max() < 2.0
    vh = np.asarray(sample_pyramid(pyr, pos, B, 0.5))
    assert np.allclose(vh, 0.5 * (v0 + v1), atol=1e-5)


# ---------------- diagnostics ----------------

def test_diagnostics():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    w = 3.0
    good = jnp.clip(s, -w, w)
    assert diagnose(check_levelset(good, half_width=w)) == ""
    bad = good.at[2, 2, 2].set(jnp.nan).at[5, 5, 5].set(2 * w)
    report = diagnose(check_levelset(bad, half_width=w))
    assert "finite" in report and "band" in report
    # distorted gradient trips the unit-gradient check
    warped = jnp.clip(3.0 * s, -w, w)
    report = diagnose(check_levelset(warped, half_width=w))
    assert "unit-gradient" in report
    fog = jnp.zeros((5, 5, 5)).at[2, 2, 2].set(1.5)
    assert "range" in diagnose(check_fog_volume(fog))
    assert check_range(jnp.zeros((3, 3, 3)), -1, 1).ok


# ---------------- platonic ----------------

def test_platonic_meshes_closed():
    from fluidsim_tpu.ops.volume_to_mesh import mesh_area
    for f in PLATONIC_FACES:
        verts, tris = platonic_mesh(f, scale=1.0)
        # Euler characteristic of a closed triangulated sphere: V-E+F=2
        e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                            tris[:, [2, 0]]])
        e_und = np.unique(np.sort(e, axis=1), axis=0)
        assert len(verts) - len(e_und) + len(tris) == 2, f
        # outward winding: positive volume
        a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
        vol = np.einsum("ij,ij->", a, np.cross(b, c)) / 6.0
        assert vol > 0, f
        assert mesh_area(verts, tris) > 0


def test_platonic_sdf_cube_matches_box():
    # the 6-face platonic solid with circumradius r is the cube with
    # half-extent r/sqrt(3)
    r = 7.0
    h = r / np.sqrt(3)
    sdf = np.asarray(platonic_sdf(6, B, r))
    expect = np.asarray(box_sdf(None, B, (-h, -h, -h), (h, h, h)))
    shell = np.abs(expect) < 2.0
    assert np.abs(sdf - expect)[shell].mean() < 0.1


def test_platonic_sdf_icosahedron_near_sphere():
    sdf = np.asarray(platonic_sdf(20, B, 7.0))
    assert sdf[B, B, B] < -4.0 and sdf[0, 0, 0] > 0
    # icosahedron inradius = 0.7947 * circumradius; zero crossing along a
    # face-normal direction lands between inradius and circumradius
    line = sdf[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) and 4 <= int(crossing[0]) <= 7


# ---------------- volume to spheres ----------------

def test_fill_with_spheres():
    # box domain: after the maximal inscribed sphere there is still corner
    # room (a spherical domain would be exactly filled by one sphere)
    h = 7.0
    s = box_sdf(None, B, (-h, -h, -h), (h, h, h))
    centers, radii = fill_with_spheres(s, 9, B, min_radius=0.5)
    centers, radii = np.asarray(centers), np.asarray(radii)
    placed = radii > 0
    assert placed.sum() >= 5
    # first sphere is the maximum inscribed sphere
    assert np.allclose(centers[0], 0.0, atol=1.0) and abs(radii[0] - h) < 0.1
    for i in np.flatnonzero(placed):
        # inside the box: r <= distance to the box surface
        assert radii[i] <= h - np.abs(centers[i]).max() + 1e-3
        for j in np.flatnonzero(placed):
            if i < j:  # non-overlapping
                d = np.linalg.norm(centers[i] - centers[j])
                assert d >= radii[i] + radii[j] - 1e-3


def test_closest_surface_points():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    pos = jnp.asarray([[2.0, 0.0, 0.0], [0.0, -8.0, 0.0], [3.0, 3.0, 0.0]])
    closest, dist = closest_surface_points(s, pos, B)
    closest, dist = np.asarray(closest), np.asarray(dist)
    r = np.linalg.norm(closest, axis=1)
    assert np.abs(r - 6.0).max() < 0.15
    expect_d = np.abs(np.linalg.norm(np.asarray(pos), axis=1) - 6.0)
    assert np.abs(dist - expect_d).max() < 0.15


# ---------------- fracture ----------------

def test_fracture():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    cut = box_sdf(None, B, (0, -B, -B), (B, B, B))
    frag, rest = fracture(s, cut)
    frag, rest = np.asarray(frag), np.asarray(rest)
    assert frag[B + 3, B, B] < 0 and frag[B - 3, B, B] > 0   # +x half
    assert rest[B - 3, B, B] < 0 and rest[B + 3, B, B] > 0   # -x half
    # fragment and residual tile the original interior: off the cutter's
    # zero set (a measure-zero plane of exact 0.0s here), every interior
    # cell belongs to exactly one piece and no cell to both
    inside = np.asarray(s) < 0
    off_cut = np.asarray(cut) != 0
    sel = inside & off_cut
    assert ((frag < 0) ^ (rest < 0))[sel].all()
    assert ((frag < 0) & (rest < 0)).sum() == 0
    assert ((frag < 0) | (rest < 0)).sum() == sel.sum()
