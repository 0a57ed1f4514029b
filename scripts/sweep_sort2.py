"""Micro-bench: alternatives for the per-frame particle sort at 2M.

Compares (on the real TPU):
  a) 7-operand lax.sort (production FLIP path)
  b) 2-operand key+iota sort + 6 row-gathers (MPM-style)
  c) 2-operand key+iota sort alone (lower bound for b)
  d) segment-sum histogram + cumsum (counting-sort bookkeeping only)

Usage: python -m scripts.sweep_sort2 [--p 2000000]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=3, floor=0.0):
    """Best-of wall time (ms) minus ``floor`` (the measured no-op dispatch
    floor — see ``measure_floor``).  Synchronizes on EVERY output leaf via
    block_until_ready (fetching one element of the first leaf would let
    later leaves finish asynchronously)."""
    for _ in range(warmup):
        r = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        r = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1e3 - floor


def measure_floor(iters=10):
    """No-op dispatch+sync round-trip (ms): the additive tunnel/host floor
    every per-call measurement carries.  Subtracted so the printed numbers
    reproduce the docs' 'tunnel-floor-subtracted' figures."""
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    return timeit(f, x, iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1987675)
    args = ap.parse_args()
    p = args.p
    floor = measure_floor()
    print(f"# dispatch floor {floor:.2f} ms (subtracted from all rows)")
    key = jax.random.PRNGKey(0)
    flat = jax.random.randint(key, (p,), 0, 2_400_000, dtype=jnp.int32)
    cols = jax.random.normal(jax.random.PRNGKey(1), (6, p), dtype=jnp.float32)

    @jax.jit
    def sort7(flat, cols):
        ops = [flat] + [cols[i] for i in range(6)]
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=0)

    @jax.jit
    def sort2_gather(flat, cols):
        iota = jax.lax.iota(jnp.int32, flat.shape[0])
        flat_s, perm = jax.lax.sort([flat, iota], num_keys=1)
        return flat_s, cols[:, perm]

    @jax.jit
    def sort2(flat):
        iota = jax.lax.iota(jnp.int32, flat.shape[0])
        return jax.lax.sort([flat, iota], num_keys=1)

    @jax.jit
    def hist(flat):
        wid = flat >> 9
        counts = jax.ops.segment_sum(jnp.ones_like(wid), wid,
                                     num_segments=4700)
        return jnp.cumsum(counts)

    print(f"P = {p}")
    print(f"sort7            {timeit(sort7, flat, cols, floor=floor):7.2f} ms")
    print(f"sort2 + gather   {timeit(sort2_gather, flat, cols, floor=floor):7.2f} ms")
    print(f"sort2 alone      {timeit(sort2, flat, floor=floor):7.2f} ms")
    print(f"hist+cumsum      {timeit(hist, flat, floor=floor):7.2f} ms")


if __name__ == "__main__":
    main()
