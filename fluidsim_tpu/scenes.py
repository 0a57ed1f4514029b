"""Named scene registry.

The reference hardcodes every scene as (un)commented code blocks in ``main``
(``fluid.cc:1176-1216,1303-1345``; ``mpm.cc:1044-1165``) — swapping scenes
means editing C++.  Here every scene (including every commented-out variant)
is a named entry producing the same geometry, plus size-scalable versions of
the headline scene for benchmarking (64^3 / 128^3 / 256^3).

A scene bundles static geometry only (numpy, host-side); particle seeding is
separate (``seeding`` fast path / ``compat.scatter`` bit-parity path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import numpy as np

from fluidsim_tpu.core.gridspec import GridSpec


@dataclasses.dataclass(frozen=True)
class Scene:
    """Static scene geometry.

    Attributes:
      name: registry key.
      kind: "flip" or "mpm".
      spec: grid geometry.
      solid: (N,N,N) bool — walls plus obstacles.
      normals: (N,N,N,3) f32 wall normals (API parity; unused by dynamics,
        as in the reference).
      seed_mask: (N,N,N) bool — active voxels of the reference ``fluidGrid``
        used for particle scattering.
      density: particles per voxel for seeding (``fluid.cc:1349``: 10;
        ``mpm.cc:1280``: 400).
      gravity: body force (``fluid.cc:1357``; ``mpm.cc:1288``).
      initial_velocity: per-particle initial velocity (``mpm.cc:484``:
        (0,-50,0); FLIP: zeros).
    """

    name: str
    kind: str
    spec: GridSpec
    solid: np.ndarray
    normals: np.ndarray
    seed_mask: np.ndarray
    density: float
    gravity: tuple
    initial_velocity: tuple = (0.0, 0.0, 0.0)


REGISTRY: Dict[str, Callable[..., Scene]] = {}


def register(name):
    def deco(fn):
        REGISTRY[name] = fn
        return fn
    return deco


def get_scene(name: str, **kwargs) -> Scene:
    return REGISTRY[name](**kwargs)


def _box_mask(spec: GridSpec, lo, hi) -> np.ndarray:
    """Bool mask of the coordinate box [lo, hi] (inclusive), per axis."""
    c = spec.coords()
    m = np.ones(spec.shape, dtype=bool)
    for d in range(3):
        ax = (c >= lo[d]) & (c <= hi[d])
        shape = [1, 1, 1]
        shape[d] = spec.n
        m &= ax.reshape(shape)
    return m


def _flip_base(spec: GridSpec, seed_mask: np.ndarray, extra_solid=None,
               name="", density=10.0) -> Scene:
    solid = spec.wall_mask()
    if extra_solid is not None:
        solid = solid | extra_solid
    return Scene(name=name, kind="flip", spec=spec, solid=solid,
                 normals=spec.wall_normals(), seed_mask=seed_mask,
                 density=density, gravity=(0.0, -10.0, 0.0))


@register("water_cube_drop")
def water_cube_drop(bound: int = 60, density: float = 10.0) -> Scene:
    """Headline FLIP scene (``fluid.cc:1176``): fluid cube filling 1/3 of the
    box (-20..20 at bound 60), walls at ``|c| > bound - 2``.  ``bound`` scales
    the scene for benchmarks (64^3 -> bound 31 with cube bound//3, etc.)."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    cube = bound // 3
    seed = _box_mask(spec, (-cube,) * 3, (cube,) * 3)
    return _flip_base(spec, seed, name=f"water_cube_drop(b={bound})", density=density)


@register("pea_fluid")
def pea_fluid(bound: int = 60) -> Scene:
    """``fluid.cc:1178-1190``: 3^3 pea plus a 3x4x3 column above it."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-1, -1, -1), (1, 1, 1))
    seed |= _box_mask(spec, (-1, 6, -1), (1, 9, 1))
    return _flip_base(spec, seed, name="pea_fluid")


@register("side_fluid")
def side_fluid(bound: int = 60) -> Scene:
    """``fluid.cc:1192-1203``: corner block -57..57 x -57..-40 x -57..-40."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    w = spec.wall - 1
    seed = _box_mask(spec, (-w, -w, -w), (w, -40, -40))
    return _flip_base(spec, seed, name="side_fluid")


@register("stable_fluid")
def stable_fluid(bound: int = 60) -> Scene:
    """``fluid.cc:1205-1216``: thin resting pool at the floor."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    w = spec.wall - 1
    seed = _box_mask(spec, (-w, -w, -w), (w, -w + 2, w))
    return _flip_base(spec, seed, name="stable_fluid")


def _pillars(spec: GridSpec, xranges) -> np.ndarray:
    m = np.zeros(spec.shape, dtype=bool)
    for (x0, x1) in xranges:
        m |= _box_mask(spec, (x0, -58, -3), (x1, -8, 3))
    return m


@register("two_blocks")
def two_blocks(bound: int = 60) -> Scene:
    """``fluid.cc:1303-1314``: water cube over two solid pillars."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-20,) * 3, (20,) * 3)
    return _flip_base(spec, seed, extra_solid=_pillars(spec, [(-11, -6), (6, 11)]),
                      name="two_blocks")


@register("three_blocks")
def three_blocks(bound: int = 60) -> Scene:
    """``fluid.cc:1316-1327``: water cube over three solid pillars."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-20,) * 3, (20,) * 3)
    return _flip_base(spec, seed,
                      extra_solid=_pillars(spec, [(-11, -7), (-2, 2), (7, 11)]),
                      name="three_blocks")


@register("big_wall")
def big_wall(bound: int = 60) -> Scene:
    """``fluid.cc:1333-1345``: water cube with a low wall across the floor."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-20,) * 3, (20,) * 3)
    wall = _box_mask(spec, (-58, -58, -30), (58, -50, -25))
    return _flip_base(spec, seed, extra_solid=wall, name="big_wall")


# ----------------------------- MPM scenes --------------------------------

def _mpm_base(spec: GridSpec, seed_mask, name, density=400.0) -> Scene:
    return Scene(name=name, kind="mpm", spec=spec, solid=spec.wall_mask(),
                 normals=spec.wall_normals(), seed_mask=seed_mask,
                 density=density, gravity=(0.0, -10.0, 0.0),
                 initial_velocity=(0.0, -50.0, 0.0))


@register("mpm_cone")
def mpm_cone(bound: int = 15, density: float = 400.0) -> Scene:
    """Headline MPM scene (``mpm.cc:1061-1076``): a small cone whose radius
    grows with height, r = (j + 13) / 2 for j in [-13, -10].

    At the reference ``bound=15`` this is exactly the reference geometry
    (4 layers); larger bounds scale the cone height proportionally
    (``4 * bound / 15`` layers, same radius slope) so scaled benchmarks
    grow the workload instead of just the empty box.
    """
    spec = GridSpec(bound=bound, wall=bound - 2)
    c = spec.coords()
    seed = np.zeros(spec.shape, dtype=bool)
    lo = -(bound - 2)
    layers = max(4, round(4 * bound / 15))
    for j in range(lo, lo + layers):
        r = (j - lo) / 2.0
        disk = (c[:, None] ** 2 + c[None, :] ** 2) <= r * r
        seed[:, j + bound, :] |= disk
    return _mpm_base(spec, seed, name="mpm_cone", density=density)


@register("mpm_pea")
def mpm_pea(bound: int = 15, density: float = 400.0) -> Scene:
    """``mpm.cc:1047-1059``: small block near the floor."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-1, -13, -1), (2, -10, 2))
    return _mpm_base(spec, seed, name="mpm_pea", density=density)


@register("mpm_block_drop")
def mpm_block_drop(bound: int = 15, density: float = 400.0) -> Scene:
    """``mpm.cc:1045``: block filling -13..-10 (the "normal fluid" variant)."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    seed = _box_mask(spec, (-13, -13, -13), (-10, -10, -10))
    return _mpm_base(spec, seed, name="mpm_block_drop", density=density)


@register("mpm_double_balls")
def mpm_double_balls(bound: int = 15, density: float = 400.0) -> Scene:
    """``mpm.cc:1078-1107``: two radius-2 balls centred at y=-11 and y=-7."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    c = spec.coords()
    seed = np.zeros(spec.shape, dtype=bool)
    r2 = c[:, None, None] ** 2 + c[None, None, :] ** 2
    for yc in (-11, -7):
        seed |= (r2 + (c[None, :, None] - yc) ** 2) <= 4
    return _mpm_base(spec, seed, name="mpm_double_balls", density=density)


@register("mpm_sphere")
def mpm_sphere(bound: int = 15, density: float = 400.0) -> Scene:
    """``mpm.cc:1108-1123``: radius-3 ball centred at y=-10."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    c = spec.coords()
    seed = (c[:, None, None] ** 2 + (c[None, :, None] + 10) ** 2
            + c[None, None, :] ** 2) <= 9
    return _mpm_base(spec, seed, name="mpm_sphere", density=density)


@register("mpm_o")
def mpm_o(bound: int = 15, density: float = 400.0) -> Scene:
    """``mpm.cc:1124-1140``: a 2-D "O" (annulus 4 <= r <= 5) in the z=0 plane."""
    spec = GridSpec(bound=bound, wall=bound - 2)
    c = spec.coords()
    r2 = c[:, None] ** 2 + (c[None, :] + 8) ** 2
    ring = (r2 <= 25) & (r2 >= 16)
    seed = np.zeros(spec.shape, dtype=bool)
    seed[:, :, bound] = ring
    return _mpm_base(spec, seed, name="mpm_o", density=density)
