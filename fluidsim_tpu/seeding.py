"""Fast deterministic particle seeding (host-side, numpy).

Reproduces the *distribution* of ``openvdb::tools::UniformPointScatter``
(``openvdb/tools/PointScatter.h:139-186``): ``target = int(density *
voxel_volume) * active_voxel_count`` particles land in uniformly-random
active voxels, jittered uniformly inside the voxel (``addPoint``,
``PointScatter.h:421-429``: position = coord - 0.5 + u, u ~ U[0,1)^3), then
filtered to ``|p| < bound - 2`` per component (``PointList::add``,
``fluid.cc:841``).

Bit-exact reproduction of the reference's std::mt19937 streams (including
VDB tree iteration order) lives in ``fluidsim_tpu.compat.scatter``; this fast
path uses numpy's PCG64 and is the default for large scenes.
"""

from __future__ import annotations

import numpy as np

from fluidsim_tpu.scenes import Scene


def seed_particles(scene: Scene, seed: int = 0, dtype=np.float32):
    """Scatter particles into the scene's seed mask.

    Returns:
      pos: (P, 3) positions in index space, all inside ``|p| < bound - 2``.
      vel: (P, 3) initial velocities (scene.initial_velocity).
    """
    spec = scene.spec
    active = np.argwhere(scene.seed_mask)  # (V, 3) array indices
    if active.size == 0:
        raise ValueError(f"scene {scene.name} has an empty seed mask")
    coords = active - spec.bound  # grid coordinates
    vol = spec.dx ** 3
    target = int(int(scene.density * vol) * len(active))

    rng = np.random.default_rng(seed)
    which = rng.integers(0, len(active), size=target)
    jitter = rng.random((target, 3))
    pos = coords[which].astype(np.float64) - 0.5 + jitter

    keep = np.all(np.abs(pos) < spec.bound - 2, axis=1)
    pos = pos[keep].astype(dtype)
    vel = np.broadcast_to(np.asarray(scene.initial_velocity, dtype=dtype),
                          pos.shape).copy()
    return pos, vel
