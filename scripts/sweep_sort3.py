"""Sort-schedule sweep on the REAL chip: wide multi-operand ``lax.sort``
vs 2-operand key+iota sort + row-gather permutes, for the FLIP (7-col) and
APIC (16-col) particle states at bench scales.

Timing forces a host fetch of a value depending on every output column
(tunnel: ``block_until_ready`` unreliable; see bench.py).  Prints best-of-8
ms per variant.

Usage: python scripts/sweep_sort3.py [--p 2000000] [--bound 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
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
    ap.add_argument("--p", type=int, default=2_000_000)
    ap.add_argument("--bound", type=int, default=64)
    args = ap.parse_args()

    from fluidsim_tpu.ops import transfer_pallas as tp

    n = 2 * args.bound + 1
    lay = tp.HaloLayout(n)
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (args.p, 3), minval=-args.bound + 2,
                             maxval=args.bound - 2, dtype=jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), (args.p, 3), jnp.float32)
    aff = jax.random.normal(jax.random.PRNGKey(2), (args.p, 9), jnp.float32)

    from fluidsim_tpu.core.splines import cround
    from fluidsim_tpu.ops import pallas_shift as ps

    def flat_of(pos):
        base = cround(pos).astype(jnp.int32)
        bc = jnp.clip(base + args.bound, 0, n - 1)
        return ((bc[:, 0] + ps._XH) * lay.lwr
                + lay.lh + bc[:, 1] * n + bc[:, 2])

    @jax.jit
    def wide7(pos, vel):
        flat = flat_of(pos)
        out = jax.lax.sort([flat, pos[:, 0], pos[:, 1], pos[:, 2],
                            vel[:, 0], vel[:, 1], vel[:, 2]], num_keys=1)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    @jax.jit
    def keyiota7(pos, vel):
        flat = flat_of(pos)
        flat_s, perm = jax.lax.sort(
            [flat, jnp.arange(args.p, dtype=jnp.int32)], num_keys=1)
        ps_, vs_ = jnp.take(pos, perm, axis=0), jnp.take(vel, perm, axis=0)
        return (jnp.sum(ps_) + jnp.sum(vs_)
                + jnp.sum(flat_s.astype(jnp.float32)))

    @jax.jit
    def wide16(pos, vel, aff):
        flat = flat_of(pos)
        ops = [flat, pos[:, 0], pos[:, 1], pos[:, 2],
               vel[:, 0], vel[:, 1], vel[:, 2]]
        ops += [aff[:, i] for i in range(9)]
        out = jax.lax.sort(ops, num_keys=1)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    @jax.jit
    def keyiota16(pos, vel, aff):
        flat = flat_of(pos)
        flat_s, perm = jax.lax.sort(
            [flat, jnp.arange(args.p, dtype=jnp.int32)], num_keys=1)
        ps_ = jnp.take(pos, perm, axis=0)
        vs_ = jnp.take(vel, perm, axis=0)
        as_ = jnp.take(aff, perm, axis=0)
        return (jnp.sum(ps_) + jnp.sum(vs_) + jnp.sum(as_)
                + jnp.sum(flat_s.astype(jnp.float32)))

    print(f"P = {args.p}, grid {n}^3")
    print(f"wide7     {timeit(wide7, pos, vel):7.1f} ms")
    print(f"keyiota7  {timeit(keyiota7, pos, vel):7.1f} ms")
    print(f"wide16    {timeit(wide16, pos, vel, aff):7.1f} ms")
    print(f"keyiota16 {timeit(keyiota16, pos, vel, aff):7.1f} ms")


if __name__ == "__main__":
    main()
