import jax.numpy as jnp
import numpy as np

from unitex_tpu.texture.envmap import (
    direction_to_equirect,
    equirect_dirs,
    karis_brdf_lut,
    prefilter_specular_levels,
    sample_envmap,
    sample_prefiltered,
    sh_irradiance,
    sh_project_irradiance,
    shade_split_sum,
)


def test_equirect_dirs_unit_and_convention():
    d = np.asarray(equirect_dirs(16, 32))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # top row points up (+z)
    assert d[0, :, 2].mean() > 0.95


def test_direction_lookup_roundtrip():
    H, W = 32, 64
    env = np.zeros((H, W, 3), np.float32)
    env[0, :, 0] = 1.0  # red at the top (up)
    up = jnp.asarray([[0.0, 0.0, 1.0]])
    down = jnp.asarray([[0.0, 0.0, -1.0]])
    assert float(sample_envmap(jnp.asarray(env), up)[0, 0]) > 0.5
    assert float(sample_envmap(jnp.asarray(env), down)[0, 0]) < 0.1


def test_sh_constant_env_gives_flat_irradiance():
    env = jnp.ones((16, 32, 3))
    coeffs = sh_project_irradiance(env)
    n = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    irr = np.asarray(sh_irradiance(coeffs, n))
    # constant unit radiance -> irradiance/pi = 1 for every normal
    np.testing.assert_allclose(irr, 1.0, atol=0.02)


def test_sh_directional_env():
    """A bright top hemisphere lights +z normals more than -z."""
    H, W = 32, 64
    env = np.zeros((H, W, 3), np.float32)
    env[: H // 2] = 1.0
    coeffs = sh_project_irradiance(jnp.asarray(env))
    up = np.asarray(sh_irradiance(coeffs, jnp.asarray([[0.0, 0.0, 1.0]])))
    dn = np.asarray(sh_irradiance(coeffs, jnp.asarray([[0.0, 0.0, -1.0]])))
    assert up[0, 0] > 3 * dn[0, 0]


def test_prefilter_levels_blur_monotonic():
    rng = np.random.default_rng(0)
    env = jnp.asarray(rng.uniform(0, 1, (32, 64, 3)).astype(np.float32))
    levels = prefilter_specular_levels(env, 4)
    stds = [float(lv.std()) for lv in levels]
    assert stds[0] >= stds[1] >= stds[-1]
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    r0 = sample_prefiltered(levels, d, jnp.asarray([0.0]))
    r1 = sample_prefiltered(levels, d, jnp.asarray([1.0]))
    assert r0.shape == r1.shape == (1, 3)


def test_karis_lut_range():
    nv = jnp.asarray([0.1, 0.5, 0.9])
    r = jnp.asarray([0.1, 0.5, 0.9])
    lut = np.asarray(karis_brdf_lut(nv, r))
    assert lut.shape == (3, 2)
    assert (lut[:, 0] >= 0).all() and (lut[:, 0] <= 1.2).all()


def test_shade_split_sum_runs():
    rng = np.random.default_rng(1)
    env = jnp.asarray(rng.uniform(0, 2, (16, 32, 3)).astype(np.float32))
    n = 8
    kd = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    arm = jnp.asarray(rng.uniform(0.2, 1, (n, 3)).astype(np.float32))
    nrm = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32))
    wo = jnp.asarray(np.tile([[0.0, 0.6, 0.8]], (n, 1)).astype(np.float32))
    out = shade_split_sum(kd, arm, nrm, wo, env)
    assert out.shape == (n, 3)
    assert (np.asarray(out) >= 0).all() and np.isfinite(np.asarray(out)).all()
