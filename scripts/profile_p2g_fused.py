"""Time the PRODUCTION fused p2g/g2p composition (scatter_wv_cm /
gather_wv_cm with packed 32-lane rows) at bench scale, piece by piece.

The null-op dispatch overhead is measured first and subtracted.
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    from fluidsim_tpu.models.flip import FlipSim
    from fluidsim_tpu.scenes import get_scene
    from fluidsim_tpu.ops import transfer_pallas as tp
    from fluidsim_tpu.ops import pallas_transfer as pt
    from fluidsim_tpu.ops import pallas_shift as ps

    B = 64
    sim = FlipSim(get_scene("water_cube_drop", bound=B, density=25.0))
    for _ in range(3):
        sim.step()
    n = 2 * B + 1
    lay = tp.HaloLayout(n)
    solid = sim.solid
    pos, vel, flat = jax.jit(
        lambda p, v: tp.sort_by_cell_h(p, v, B, lay))(sim.state.pos,
                                                      sim.state.vel)
    w27 = jax.jit(lambda p_: tp.masked_weights(p_, B, "flip"))(pos)

    null = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"null {null:.1f} ms", flush=True)

    pack = jax.jit(lambda f, w, v: pt.pack_wv_rows(f, w, v, 2048)[0])
    ms = timeit(pack, flat, w27, vel)
    print(f"pack_wv_rows     {ms - null:7.1f} ms", flush=True)
    wv = pack(flat, w27, vel)

    sc = jax.jit(lambda u, f: pt.scatter_wv_cm(u, f, lay.ncells))
    ms = timeit(sc, wv, flat)
    print(f"scatter_wv_cm    {ms - null:7.1f} ms", flush=True)
    d_cm = sc(wv, flat)

    red = jax.jit(lambda d: ps.reduce_haloed(
        d.reshape(128, lay.xr, lay.lwr), n, bx=lay.bx, lblk=lay.lblk))
    ms = timeit(red, d_cm)
    print(f"reduce_haloed    {ms - null:7.1f} ms", flush=True)

    p2g = jax.jit(lambda p_, v_, f_, w_: tp.p2g_pallas(
        p_, v_, f_, solid, B, lay, "flip", w27=w_)[0])
    ms = timeit(p2g, pos, vel, flat, w27)
    print(f"p2g_pallas total {ms - null:7.1f} ms", flush=True)

    fields = jnp.zeros((n, n, n, 3), jnp.float32) + 1.0
    g2p = jax.jit(lambda p_, f_, fl_, w_: tp.g2p_pallas(
        p_, fl_, f_, B, B - 2, lay, "flip", wv_rows=w_)[0])
    wv_full, _ = jax.jit(lambda f, w, v: pt.pack_wv_rows(f, w, v, 2048))(
        flat, w27, vel)
    ms = timeit(g2p, pos, fields, flat, wv_full)
    print(f"g2p_pallas total {ms - null:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
