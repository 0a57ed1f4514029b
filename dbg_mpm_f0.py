import numpy as np
import jax, jax.numpy as jnp
from fluidsim_tpu.models.mpm import MpmSim, hardening, det3
from fluidsim_tpu.parallel.flip_sharded import _slab_layout, W
from fluidsim_tpu.scenes import get_scene
from fluidsim_tpu.ops import mpm_pallas as mp
from fluidsim_tpu.ops import pallas_shift as ps
from fluidsim_tpu.ops import pallas_transfer as pt
from fluidsim_tpu.ops import transfer_pallas as tp
from fluidsim_tpu.ops.svd3 import piola_linearized, mm3
from fluidsim_tpu.core.splines import cround
from fluidsim_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

bound = 63
scene = get_scene("mpm_cone", bound=bound, density=400)
single = MpmSim(scene)
st = single.state
prm = single.params
B = bound; n = 2 * B + 1; nl = n
solid = jnp.asarray(np.asarray(scene.solid))
lay1 = tp.HaloLayout(n)
lay = _slab_layout(nl, n)
rows_x = nl + 2 * W
solid_ext_np = np.zeros((rows_x, n, n), bool)
solid_ext_np[W:W + n] = np.asarray(scene.solid)
solid_ext = jnp.asarray(solid_ext_np)
thr = prm.mass_threshold
hess = "spd"


@jax.jit
def single_f0(pos, vel, FE, FP, volume):
    pos, vel, fe, fp, vol, flat_h = mp.sort_mpm_h(pos, vel, FE, FP, volume,
                                                  B, lay1)
    rows = mp.pack_mpm_rows(flat_h, pos, vel, B)
    mass, mom = mp.p2g_mpm(rows, flat_h, solid, B, lay1)
    dens = mp.density(mass, rows, flat_h, solid, B, lay1)
    vol0 = 1.0 / jnp.where(dens > 0, dens, 1.0)
    active = (mass > thr) & (~solid)
    mu, lam = hardening(prm.mu0, prm.lam0, prm.hardening_eps, det3(fp),
                        exponent_cap=prm.hardening_max)
    f0_fn, dforce = mp.make_force_fns(pos, flat_h, rows, fe, vol0, mu, lam,
                                      active, solid, B, lay1, hessian=hess)
    n3 = n * n * n
    return f0_fn().reshape(n, n, n, 3), mass, active


@jax.jit
def sharded_f0(pos, vel, FE, FP, volume):
    p = pos.shape[0]
    base = cround(pos).astype(jnp.int32)
    lxb = jnp.clip(base[:, 0] + B + W, 0, rows_x - 1)
    gyb = jnp.clip(base[:, 1] + B, 0, n - 1)
    gzb = jnp.clip(base[:, 2] + B, 0, n - 1)
    flat = (lxb + ps._XH) * lay.lwr + lay.lh + gyb * n + gzb
    flat_h, perm = jax.lax.sort([flat, jnp.arange(p, dtype=jnp.int32)],
                                num_keys=1)
    pos2 = jnp.take(pos, perm, axis=0)
    vel2 = jnp.take(vel, perm, axis=0)
    fe_in = jnp.take(FE, perm, axis=0)
    fp_in = jnp.take(FP, perm, axis=0)
    prows = mp.pack_mpm_rows(flat_h, pos2, vel2, B)
    pcols = tp.cols_of(prows)
    d4 = pt.scatter_wv_fused(prows, flat_h, lay.xr, lay.lwr, n,
                             cols=pcols, lh=lay.lh)
    accn = d4[:, ps._XH:ps._XH + rows_x,
              2 * lay.lh:2 * lay.lh + n * n].reshape(4, rows_x, n, n)
    mass = jnp.where(~solid, accn[0][W:-W], 0.0)
    mass_ext = jnp.concatenate([jnp.zeros((W, n, n)), mass,
                                jnp.zeros((W, n, n))], axis=0)
    dens = mp.density(mass_ext, prows, flat_h, solid_ext, B, lay)
    vol0 = 1.0 / jnp.where(dens > 0, dens, 1.0)
    active = (mass > thr) & (~solid)
    mu, lam = hardening(prm.mu0, prm.lam0, prm.hardening_eps, det3(fp_in),
                        exponent_cap=prm.hardening_max)
    fe_t = jnp.swapaxes(fe_in, -1, -2)
    p0, dp = piola_linearized(fe_in, mu, lam, hess)
    valid = jnp.all(jnp.abs(cround(pos2)) <= B, axis=-1)
    scale = jnp.where(valid, -vol0, 0.0)
    not_solid_ext = ~solid_ext

    def scatter_sigma(sigma):
        m9t = scale[None, :] * sigma.reshape(p, 9).T
        prows_f = prows.at[pt._M0:pt._M0 + 9, :p].set(m9t)
        df4 = pt.scatter_wv_fused(prows_f, flat_h, lay.xr, lay.lwr, n,
                                  expand="fg", cols=pcols, lh=lay.lh)
        f = jnp.moveaxis(
            df4[:3, ps._XH:ps._XH + rows_x,
                2 * lay.lh:2 * lay.lh + n * n].reshape(3, rows_x, n, n),
            0, -1)
        return jnp.where(not_solid_ext[..., None], f, 0.0)

    f_slab = scatter_sigma(mm3(p0, fe_t))
    f0 = f_slab[W:-W]  # ndev=1 halo_reduce = drop zero halos... CHECK
    # proper halo_reduce at ndev=1: interior + halo contributions folded to
    # NOTHING (no neighbours) -> but halo rows hold contributions BEYOND the
    # domain that single-chip wraps; emulate halo_reduce: interior only,
    # halo rows are discarded (ppermute to nonexistent neighbours)
    return f0, mass, active


args = (st.pos, st.vel, st.FE, st.FP, st.volume)
f1, m1, a1 = map(np.asarray, single_f0(*args))
f2, m2, a2 = map(np.asarray, sharded_f0(*args))
print("mass diff:", np.abs(m1 - m2).max())
print("active diff:", (a1 != a2).sum())
d = np.abs(f1 - f2)
print("f0 max abs diff:", d.max(), "rel:", d.max() / max(np.abs(f1).max(), 1e-9))
bad = np.argwhere(d.max(axis=-1) > 1e-3 * np.abs(f1).max())
print("bad cells:", len(bad))
if len(bad):
    print("x uniq:", np.unique(bad[:, 0])[:20])
    print("y range:", bad[:, 1].min(), bad[:, 1].max(),
          "z range:", bad[:, 2].min(), bad[:, 2].max())
    print("sample:", bad[:5])
EOF
