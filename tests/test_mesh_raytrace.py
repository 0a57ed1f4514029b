"""Mesh -> SDF (MeshToVolume) and level-set ray tracer oracles."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.mesh import (mesh_to_sdf, icosphere, box_mesh,
                                   point_triangle_distance, winding_number)
from fluidsim_tpu.ops.levelset import sphere_sdf, box_sdf
from fluidsim_tpu.ops.raytrace import raytrace_levelset

B = 12


def test_point_triangle_distance_regions():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    # face interior: distance is pure z offset
    d = point_triangle_distance(jnp.array([0.25, 0.25, 2.0]), a, b, c)
    np.testing.assert_allclose(float(d), 2.0, rtol=1e-6)
    # vertex region
    d = point_triangle_distance(jnp.array([-3.0, -4.0, 0.0]), a, b, c)
    np.testing.assert_allclose(float(d), 5.0, rtol=1e-6)
    # edge ab region
    d = point_triangle_distance(jnp.array([0.5, -2.0, 0.0]), a, b, c)
    np.testing.assert_allclose(float(d), 2.0, rtol=1e-6)
    # hypotenuse edge region
    d = point_triangle_distance(jnp.array([1.0, 1.0, 0.0]), a, b, c)
    np.testing.assert_allclose(float(d), np.sqrt(2) / 2, rtol=1e-5)


def test_winding_number_sphere():
    v, t = icosphere((0.0, 0.0, 0.0), 4.0, subdivisions=2)
    verts = jnp.asarray(v, jnp.float32)
    a, b, c = (verts[t[:, i]] for i in range(3))
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],       # inside
                     [8.0, 0.0, 0.0], [0.0, -9.0, 2.0]])     # outside
    w = np.asarray(winding_number(pts, a, b, c))
    assert np.all(w[:2] > 0.9), w
    assert np.all(np.abs(w[2:]) < 0.1), w


def test_mesh_to_sdf_matches_analytic_sphere():
    r = 6.0
    v, t = icosphere((0.0, 0.0, 0.0), r, subdivisions=3)
    sdf = np.asarray(mesh_to_sdf(v, t, B, chunk=4096))
    ana = np.asarray(sphere_sdf((2 * B + 1,) * 3, B, (0, 0, 0), r))
    # agreement within the faceting error of a level-3 icosphere — one-sided:
    # the inscribed polyhedron's surface bows inward, so mesh distance >= the
    # analytic one (measured max +0.092 sagitta, never more negative than 0)
    band = np.abs(ana) < 3.0
    err = (sdf - ana)[band]
    assert err.max() < 0.12, err.max()
    assert err.min() > -1e-4, err.min()
    # sign agrees everywhere away from the surface
    far = np.abs(ana) > 0.5
    assert np.all(np.sign(sdf[far]) == np.sign(ana[far]))


def test_mesh_to_sdf_matches_analytic_box():
    lo, hi = (-5.0, -4.0, -3.0), (2.0, 5.0, 6.0)
    v, t = box_mesh(lo, hi)
    sdf = np.asarray(mesh_to_sdf(v, t, B, chunk=4096))
    ana = np.asarray(box_sdf((2 * B + 1,) * 3, B, lo, hi))
    # box_sdf is exact outside; inside, both are negative distances to faces
    np.testing.assert_allclose(sdf, ana, atol=1e-4)


def test_raytrace_sphere_geometry():
    r = 5.0
    sdf = sphere_sdf((2 * B + 1,) * 3, B, (0, 0, 0), r)
    eye = (0.0, 0.0, -10.0)
    img, hit, depth = raytrace_levelset(sdf, B, eye, (0.0, 0.0, 0.0),
                                        width=64, height=64, fov_deg=60.0)
    img, hit, depth = map(np.asarray, (img, hit, depth))
    assert img.shape == (64, 64, 3) and img.min() >= 0 and img.max() <= 1
    # centre ray hits the front of the sphere at depth ~ 10 - r
    cy, cx = 32, 32
    assert hit[cy, cx]
    np.testing.assert_allclose(depth[cy, cx], 10.0 - r, atol=0.15)
    # corners miss (sphere subtends less than the fov)
    assert not hit[0, 0] and not hit[-1, -1]
    # silhouette: angular radius asin(5/10) = 30 deg = the fov half-angle,
    # so the disc spans the full image height -> hit fraction ~ pi/4
    frac = hit.mean()
    assert 0.6 < frac < 0.85, frac


def test_cli_raytrace_from_surface_vdb(tmp_path):
    import os
    from fluidsim_tpu.cli import main as cli_main
    out = str(tmp_path / "sim")
    cli_main(["fluid", "--scene", "water_cube_drop", "--bound", "10",
              "--density", "3", "--frames", "1", "--out", out, "--no-accum",
              "--surface", "--echo-every", "100"])
    png = str(tmp_path / "ray.png")
    rc = cli_main(["raytrace", os.path.join(out, "mygrids0.vdb"),
                   "-o", png, "--fog-half-width", "1.5",
                   "--size", "64", "64", "--eye", "0", "4", "-24"])
    assert rc == 0
    data = open(png, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 400


def test_raytrace_mesh_sdf_end_to_end():
    v, t = icosphere((0.0, 2.0, 0.0), 4.0, subdivisions=2)
    sdf = mesh_to_sdf(v, t, B, chunk=4096)
    img, hit, depth = raytrace_levelset(sdf, B, (0.0, 2.0, -9.0),
                                        (0.0, 2.0, 0.0), width=48, height=48)
    hit = np.asarray(hit)
    assert hit[24, 24]
    assert np.isfinite(np.asarray(depth)[24, 24])


def test_cli_view_turntable_and_sequence(tmp_path):
    # offline vdb_view analogue: orbit GIF + fixed-camera PNG sequence
    from fluidsim_tpu.cli import main as cli_main
    from fluidsim_tpu.io.vdb import VdbGrid, write_vdb
    n = 33
    ax = np.arange(n) - 16.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 9.0).astype(np.float32)
    vdb = str(tmp_path / "sphere.vdb")
    write_vdb(vdb, [VdbGrid(values=sdf, origin=(-16,) * 3, background=3.0)])

    gif = str(tmp_path / "turn.gif")
    assert cli_main(["view", vdb, "-o", gif, "--orbit", "3",
                     "--size", "64", "64"]) == 0
    from PIL import Image
    with Image.open(gif) as im:
        assert im.n_frames == 3 and im.size == (64, 64)

    seq = str(tmp_path / "seq.png")
    assert cli_main(["view", vdb, vdb, "-o", seq, "--size", "48", "48"]) == 0
    assert (tmp_path / "seq_0000.png").exists()
    assert (tmp_path / "seq_0001.png").exists()


def test_camera_film_options():
    """vdb_render camera/film parity (cmd/openvdb_render/main.cc:73-196):
    focal/aperture -> fov conversion, orthographic silhouette size,
    supersampling, near/far clipping."""
    import math

    from fluidsim_tpu.ops.raytrace import raytrace_levelset, focal_to_fov
    from fluidsim_tpu.ops.levelset import sphere_sdf

    # the reference's default 50 mm / 41.2136 mm -> its documented fov
    assert abs(focal_to_fov(50.0, 41.2136)
               - math.degrees(2 * math.atan2(41.2136, 100.0))) < 1e-9

    B = 16
    n = 2 * B + 1
    sdf = sphere_sdf((n, n, n), B, (0.0, 0.0, 0.0), 8.0)
    _, hit_o, _ = raytrace_levelset(sdf, B, (0, 0, -40), (0, 0, 0),
                                    width=64, height=64,
                                    camera="orthographic", frame=12.0)
    area = int(np.asarray(hit_o).sum())
    expected = math.pi * (8 / 12 * 32) ** 2          # analytic silhouette
    assert 0.8 < area / expected < 1.2, (area, expected)

    img_aa, _, _ = raytrace_levelset(sdf, B, (0, 0, -40), (0, 0, 0),
                                     width=32, height=32, samples=4)
    assert img_aa.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img_aa)).all()

    _, hit_clip, _ = raytrace_levelset(sdf, B, (0, 0, -40), (0, 0, 0),
                                       width=32, height=32, zfar=20.0)
    assert int(np.asarray(hit_clip).sum()) == 0      # far plane before sphere
