"""Compare particle sort strategies on TPU: the production 7-operand
``jax.lax.sort`` vs a 2-operand (key, iota) sort + row gather.

Usage: python scripts/sweep_sort.py [--bound 64] [--density 25]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _ = float(jnp.asarray(fn(*args)).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=64)
    ap.add_argument("--density", type=float, default=25.0)
    args = ap.parse_args()

    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import pallas_shift as psh
    from fluidsim_tpu.core.splines import cround

    sim = FlipSim(get_scene("water_cube_drop", bound=args.bound,
                            density=args.density))
    for _ in range(3):
        sim.step()
    B = args.bound
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    st = sim.state
    print(f"grid {n}^3  particles {st.pos.shape[0]}")

    null = timeit(jax.jit(lambda x: jnp.sum(x[:128])), st.pos)
    print(f"null           {null:7.1f} ms")

    def sort7(pos, vel):
        p, v, f = tp.sort_by_cell_h(pos, vel, B, lay)
        return p[0, 0] + v[0, 0] + f[0].astype(jnp.float32)

    ms = timeit(jax.jit(sort7), st.pos, st.vel)
    print(f"7-operand sort {ms - null:7.1f} ms", flush=True)

    def sort2g(pos, vel):
        base = cround(pos).astype(jnp.int32)
        bc = jnp.clip(base + B, 0, n - 1)
        flat = ((bc[:, 0] + psh._XH) * lay.lwr
                + psh._LH + bc[:, 1] * n + bc[:, 2])
        idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
        fs, order = jax.lax.sort([flat, idx], num_keys=1)
        p = jnp.take(pos, order, axis=0)
        v = jnp.take(vel, order, axis=0)
        return p[0, 0] + v[0, 0] + fs[0].astype(jnp.float32)

    ms = timeit(jax.jit(sort2g), st.pos, st.vel)
    print(f"2-op sort+gath {ms - null:7.1f} ms", flush=True)

    def sort2g6(pos, vel):
        """Single fused (P, 6) row gather after the key sort."""
        base = cround(pos).astype(jnp.int32)
        bc = jnp.clip(base + B, 0, n - 1)
        flat = ((bc[:, 0] + psh._XH) * lay.lwr
                + psh._LH + bc[:, 1] * n + bc[:, 2])
        idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
        fs, order = jax.lax.sort([flat, idx], num_keys=1)
        pv = jnp.concatenate([pos, vel], axis=1)
        out = jnp.take(pv, order, axis=0)
        return out[0, 0] + fs[0].astype(jnp.float32)

    ms = timeit(jax.jit(sort2g6), st.pos, st.vel)
    print(f"2-op sort+g6   {ms - null:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
