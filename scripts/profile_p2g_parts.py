"""Time the sub-parts of the Pallas p2g/g2p pipelines at bench scale."""

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
    p = pos.shape[0]
    w27 = jax.jit(lambda p_: tp.masked_weights(p_, B, "flip"))(pos)

    null = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"null {null:.1f} ms")

    def rowbuild(pos_s, vel_s, w):
        u = jnp.concatenate([w[..., None],
                             w[..., None] * vel_s[:, None, :]],
                            axis=-1).reshape(p, 108)
        u_p, _ = pt.pad_rows_with_ids(flat, u, 2048)
        return u_p
    ms = timeit(jax.jit(rowbuild), pos, vel, w27)
    print(f"row build        {ms - null:7.1f} ms")
    u_p = jax.jit(rowbuild)(pos, vel, w27)

    ms = timeit(jax.jit(lambda u: pt.scatter_rows_cm(
        u, flat, lay.ncells, precision="split3")), u_p)
    print(f"scatter_rows_cm  {ms - null:7.1f} ms")
    d_cm = jax.jit(lambda u: pt.scatter_rows_cm(
        u, flat, lay.ncells, precision="split3"))(u_p)

    ms = timeit(jax.jit(lambda d: ps.reduce_haloed(
        d.reshape(128, lay.xr, lay.lwr), n, bx=lay.bx, lblk=lay.lblk)), d_cm)
    print(f"reduce_haloed    {ms - null:7.1f} ms")

    # g2p side
    fields = jnp.zeros((n, n, n, 3), jnp.float32) + 1.0

    def fieldbuild(f):
        import numpy as np
        coords = np.abs(np.arange(-B, B + 1))
        ok = coords <= B - 2
        within = jnp.asarray(ok[:, None, None] & ok[None, :, None]
                             & ok[None, None, :])
        wf = within.astype(f.dtype)
        chans = [jnp.where(within, f[..., d], 0.0).reshape(n, n * n)
                 for d in range(3)]
        chans.append(wf.reshape(n, n * n))
        fm = jnp.stack(chans, axis=0)
        return jnp.pad(fm, ((0, 0), (ps._XH, lay.xr - n - ps._XH),
                            (ps._LH, lay.lwr - n * n - ps._LH)))
    ms = timeit(jax.jit(fieldbuild), fields)
    print(f"field build      {ms - null:7.1f} ms")
    fm_h = jax.jit(fieldbuild)(fields)

    ms = timeit(jax.jit(lambda f: ps.expand_haloed(
        f, n, bx=lay.bx, lblk=lay.lblk)), fm_h)
    print(f"expand_haloed    {ms - null:7.1f} ms")
    table = jax.jit(lambda f: ps.expand_haloed(f, n, bx=lay.bx,
                                               lblk=lay.lblk))(fm_h)

    ms = timeit(jax.jit(lambda t, u: pt.gather_rows_cm(
        t.reshape(128, lay.ncells), u, flat, precision="split3")), table, u_p)
    print(f"gather_rows_cm   {ms - null:7.1f} ms")


if __name__ == "__main__":
    main()
