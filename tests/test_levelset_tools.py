"""Level-set evolution tool oracles (LevelSetRebuild/Filter/Morph/Tracker/
Measure equivalents): analytic sphere fixtures, gradient-norm restoration,
zero-set preservation."""

import numpy as np
import jax.numpy as jnp

from fluidsim_tpu.ops.levelset import sphere_sdf, box_sdf, levelset_volume
from fluidsim_tpu.ops.levelset_tools import (
    redistance, rebuild_levelset, filter_mean, filter_gaussian,
    filter_median, filter_offset, morph_levelset, track_levelset,
    levelset_area)
from fluidsim_tpu.ops.gridops import gradient, magnitude

B = 12
N = 2 * B + 1


def _grad_norm_err(phi, shell):
    g = np.asarray(magnitude(gradient(jnp.asarray(phi))))
    return np.abs(g[shell] - 1.0).mean()


def _shell(phi, w=3.0):
    return np.abs(np.asarray(phi)) < w


def test_redistance_restores_unit_gradient():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    distorted = 3.0 * s  # same zero set, |grad| = 3
    out = redistance(distorted, iterations=40)
    shell = _shell(s, 4.0)
    # first-order Godunov relaxation: O(dx) accuracy; the distorted input
    # starts at |grad|-error 2.0, the relaxed field must be near 1
    assert _grad_norm_err(distorted, shell) > 1.9
    assert _grad_norm_err(out, shell) < 0.15
    # zero level set preserved: values on the original surface stay small
    x = np.arange(-B, B + 1)
    xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(xx**2 + yy**2 + zz**2)
    near = np.abs(r - 6.0) < 0.5
    assert np.abs(np.asarray(out)[near]).mean() < 0.6


def test_redistance_banded_freezes_far_field():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 5.0)
    distorted = 2.0 * s
    out = np.asarray(redistance(distorted, iterations=10, band=4.0))
    far = np.abs(np.asarray(distorted)) > 4.0
    assert np.array_equal(out[far], np.asarray(distorted)[far])


def test_rebuild_from_fog():
    # fog-style field: 1 inside radius 6, 0 outside -> rebuild SDF at iso 0.5
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    fog = (np.asarray(s) < 0).astype(np.float32)
    sdf = rebuild_levelset(jnp.asarray(fog), iso=0.5, half_width=3.0,
                           iterations=60, fog=True)
    out = np.asarray(sdf)
    # clamped narrow band
    assert out.max() <= 3.0 + 1e-5 and out.min() >= -3.0 - 1e-5
    # sign structure: negative inside, positive outside
    assert out[B, B, B] < 0
    assert out[0, 0, 0] > 0
    # zero crossing near radius 6 along the x axis
    line = out[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) >= 1 and abs(crossing[0] - 6) <= 1


def test_filters_denoise_and_preserve_radius():
    # Mean/Gaussian filtering of a curved SDF has an intrinsic smoothing
    # bias (it is a curvature-flow step — true of LevelSetFilter too), so
    # the oracle separates the two effects: the *noise* must be strongly
    # attenuated (filtered-noisy ~= filtered-clean) and the zero crossing
    # must stay within a voxel of the true surface.
    rng = np.random.default_rng(0)
    s = np.asarray(sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0))
    noise = rng.normal(0, 0.12, s.shape).astype(np.float32)
    noisy = jnp.asarray(s + noise)
    clean = jnp.asarray(s)
    shell = _shell(s, 4.0)
    for filt in (lambda p: filter_mean(p, 3),
                 lambda p: filter_gaussian(p, 3, iterations=2)):
        out = np.asarray(filt(noisy))
        base = np.asarray(filt(clean))
        residual_noise = np.abs(out - base)[shell].mean()
        assert residual_noise < 0.35 * np.abs(noise)[shell].mean(), filt
        # zero crossing along +x stays at radius 6 +- 1
        line = out[B:, B, B]
        crossing = np.where(np.diff(np.sign(line)) != 0)[0]
        assert len(crossing) >= 1 and abs(int(crossing[0]) - 6) <= 1, filt


def test_filter_median_rejects_outliers():
    # The defining property of the median filter (vs mean/gaussian) is
    # robustness to impulse ("fire fliers") noise: isolated huge spikes
    # vanish entirely instead of being smeared.  On a steep SDF, Gaussian
    # noise attenuation is NOT a median property (the 27 samples differ by
    # ~|grad|=1 per voxel, so the median just picks a neighbor) — that
    # matches LevelSetFilter::median too.
    rng = np.random.default_rng(1)
    s = np.asarray(sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0))
    spiky = s.copy()
    idx = rng.choice(s.size, size=60, replace=False)
    flat = spiky.reshape(-1)
    flat[idx] += rng.choice([-8.0, 8.0], size=60).astype(np.float32)
    out = np.asarray(filter_median(jnp.asarray(spiky)))
    # isolated spikes are fully rejected: result stays close to a median
    # of the clean field everywhere
    base = np.asarray(filter_median(jnp.asarray(s)))
    assert np.abs(out - base).max() < 1.0
    # zero crossing along +x stays at radius 6 +- 1
    line = out[B:, B, B]
    crossing = np.where(np.diff(np.sign(line)) != 0)[0]
    assert len(crossing) >= 1 and abs(int(crossing[0]) - 6) <= 1


def test_filter_offset_plain_and_masked():
    # tools::Filter::offset — constant add, alpha-blended under a mask
    # (openvdb/tools/Filter.h:166-168,419-433).
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    out = np.asarray(filter_offset(s, 2.5))
    assert np.allclose(out, np.asarray(s) + 2.5, atol=1e-6)
    # mask = 0 leaves voxels untouched; mask = 0.5 applies half the offset
    mask = jnp.zeros_like(s).at[B, B, B].set(0.5).at[0, 0, 0].set(1.0)
    out_m = np.asarray(filter_offset(s, 4.0, mask=mask))
    sn = np.asarray(s)
    assert out_m[1, 1, 1] == sn[1, 1, 1]
    assert np.isclose(out_m[B, B, B], sn[B, B, B] + 2.0, atol=1e-6)
    assert np.isclose(out_m[0, 0, 0], sn[0, 0, 0] + 4.0, atol=1e-6)


def test_filter_band_freezes_far_field():
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), 6.0)
    out = np.asarray(filter_mean(s, 3, band=2.0))
    far = np.abs(np.asarray(s)) > 2.0
    assert np.array_equal(out[far], np.asarray(s)[far])


def test_morph_sphere_to_box():
    src = sphere_sdf(None, B, (0.0, 0.0, 0.0), 4.0)
    tgt = box_sdf(None, B, (-6, -6, -6), (6, 6, 6))
    out = morph_levelset(src, tgt, iterations=40)
    shell = _shell(tgt, 3.0)
    before = np.abs(np.asarray(src) - np.asarray(tgt))[shell].mean()
    after = np.abs(np.asarray(out) - np.asarray(tgt))[shell].mean()
    assert after < 0.35 * before


def test_track_levelset_translation():
    s = sphere_sdf(None, B, (-3.0, 0.0, 0.0), 5.0)
    vc = jnp.zeros((N, N, N, 3), jnp.float32).at[..., 0].set(1.0)
    phi = s
    for _ in range(6):  # advect +6 voxels in x, one voxel per step
        phi = track_levelset(phi, vc, 1.0, B, redist_iterations=3)
    expect = np.asarray(sphere_sdf(None, B, (3.0, 0.0, 0.0), 5.0))
    shell = np.abs(expect) < 2.5
    err = np.abs(np.asarray(phi) - expect)[shell].mean()
    assert err < 0.5


def test_levelset_area_and_volume_sphere():
    r = 7.0
    s = sphere_sdf(None, B, (0.0, 0.0, 0.0), r)
    a = float(levelset_area(s))
    assert np.isclose(a, 4 * np.pi * r * r, rtol=0.05)
    v = float(levelset_volume(s))
    assert np.isclose(v, 4 / 3 * np.pi * r**3, rtol=0.05)


def test_levelset_avg_curvature_sphere():
    # levelSetMeasure's avgCurvature: a radius-r sphere has mean
    # curvature (k1+k2)/2 = 1/r everywhere on the surface
    from fluidsim_tpu.ops.levelset_tools import levelset_avg_curvature
    for r in (6.0, 9.0):
        s = sphere_sdf(None, B, (0.0, 0.0, 0.0), r)
        k = float(levelset_avg_curvature(s))
        assert abs(k - 1.0 / r) < 0.15 / r, (r, k)
