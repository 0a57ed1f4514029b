"""VolumeToMesh (dual-contouring iso-surface extraction) oracles: analytic
sphere/box fixtures, closed-manifold Euler check, outward orientation via
signed volume, and the MeshToVolume round trip."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.levelset import sphere_sdf, box_sdf, levelset_volume
from fluidsim_tpu.ops.mesh import mesh_to_sdf
from fluidsim_tpu.ops.volume_to_mesh import (
    volume_to_mesh, quads_to_triangles, mesh_area)

B = 12
R = 7.0


def _signed_volume(verts, quads):
    tris = quads_to_triangles(quads)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    return np.einsum("ij,ij->", a, np.cross(b, c)) / 6.0


def test_sphere_mesh_geometry():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), R)
    verts, quads = volume_to_mesh(s, bound=B)
    assert len(verts) > 100 and len(quads) > 100
    assert quads.min() >= 0 and quads.max() < len(verts)
    # every vertex sits on the sphere (surface-nets vertices stay inside
    # their dual cell, so within ~half a voxel diagonal of the surface)
    r = np.linalg.norm(verts, axis=1)
    assert np.abs(r - R).max() < 0.75
    assert np.abs(r - R).mean() < 0.2
    # area close to analytic
    assert np.isclose(mesh_area(verts, quads), 4 * np.pi * R * R, rtol=0.07)


def test_sphere_mesh_closed_and_oriented():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), R)
    verts, quads = volume_to_mesh(s, bound=B)
    # closed genus-0 quad mesh: E = 2F, so V - E + F = V - F = 2
    assert len(verts) - len(quads) == 2
    # every vertex is used
    assert len(np.unique(quads)) == len(verts)
    # each undirected edge appears exactly twice (manifold, consistently
    # wound: once in each direction)
    e = np.concatenate([quads[:, [i, (i + 1) % 4]] for i in range(4)])
    und = np.sort(e, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all()
    directed = set(map(tuple, e))
    assert len(directed) == len(e)  # no directed edge repeats
    # outward orientation: signed volume is +4/3 pi r^3
    sv = _signed_volume(verts, quads)
    assert np.isclose(sv, 4 / 3 * np.pi * R**3, rtol=0.05)
    # cross-check two independent estimators (each is O(dx)-accurate on
    # opposite sides of the analytic value, so allow their biases to add)
    assert np.isclose(sv, float(levelset_volume(s)), rtol=0.08)


def test_box_mesh_faces_snap():
    s = box_sdf(None, B, (-5, -5, -5), (5, 5, 5))
    verts, quads = volume_to_mesh(s, bound=B)
    # all vertices lie on the box surface: max |coordinate| == 5
    m = np.abs(verts).max(axis=1)
    assert np.allclose(m, 5.0, atol=0.51)
    assert len(verts) - len(quads) == 2
    sv = _signed_volume(verts, quads)
    assert np.isclose(sv, 10.0**3, rtol=0.05)


def test_iso_offset():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), R)
    verts, _ = volume_to_mesh(s, iso=-2.0, bound=B)
    r = np.linalg.norm(verts, axis=1)
    assert np.abs(r - (R - 2.0)).mean() < 0.2


def test_roundtrip_with_mesh_to_volume():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), R)
    verts, quads = volume_to_mesh(s, bound=B)
    tris = quads_to_triangles(quads)
    sdf = np.asarray(mesh_to_sdf(jnp.asarray(verts, jnp.float32), tris, B))
    shell = np.abs(np.asarray(s)) < 3.0
    err = np.abs(sdf - np.asarray(s))[shell]
    assert err.mean() < 0.15 and err.max() < 0.8
