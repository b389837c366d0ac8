"""Environment-map prefiltering and lookup for split-sum PBR shading.

Capability of the nvdiffrec cubemap CUDA kernels the reference vendors
(/root/reference/TextureTools/texturetools/texture/pbr/renderutils/c_src/cubemap.cu:
diffuse_cubemap / specular_cubemap) and of the split-sum LUT path
(texture/pbr/pbr.py + envmaps/bsdf_256_256.bin).  TPU formulation:

* equirectangular [H, W, 3] maps instead of cubemaps (no face-seam special
  cases, plain bilinear gathers);
* diffuse irradiance via 9-coefficient spherical harmonics (the standard
  Ramamoorthi-Hanrahan projection — exact for the cosine lobe, one small
  matmul per shaded point);
* specular prefiltering via progressive gaussian blurs per roughness level
  (GGX lobe approximated by its angular variance), linearly interpolated;
* the analytic Karis split-sum BRDF approximation replacing the baked
  256x256 LUT.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample
from ..ops.image_ops import gaussian_blur


def direction_to_equirect(d: jnp.ndarray) -> jnp.ndarray:
    """Unit directions [., 3] -> equirect grid coords [., 2] in [-1, 1].
    Convention: +z up, atan2(y, x) longitude."""
    lon = jnp.arctan2(d[..., 1], d[..., 0])            # [-pi, pi]
    lat = jnp.arcsin(jnp.clip(d[..., 2], -1.0, 1.0))   # [-pi/2, pi/2]
    u = lon / jnp.pi
    v = -lat / (jnp.pi / 2)                            # +z maps to top row
    return jnp.stack([u, v], axis=-1)


def equirect_dirs(H: int, W: int) -> jnp.ndarray:
    """Per-texel unit directions of an equirect map [H, W, 3]."""
    v = (jnp.arange(H) + 0.5) / H
    u = (jnp.arange(W) + 0.5) / W
    lat = (0.5 - v) * jnp.pi                           # +pi/2 at top
    lon = (u * 2.0 - 1.0) * jnp.pi
    gl, gn = jnp.meshgrid(lat, lon, indexing="ij")
    return jnp.stack(
        [jnp.cos(gl) * jnp.cos(gn), jnp.cos(gl) * jnp.sin(gn), jnp.sin(gl)],
        axis=-1,
    )


def sample_envmap(env: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return grid_sample(env, direction_to_equirect(d), padding_mode="border")


def sh_project_irradiance(env: jnp.ndarray) -> jnp.ndarray:
    """Project an equirect radiance map to the 9 SH irradiance coefficients
    (per channel) with the cosine-lobe convolution weights baked in.
    Returns [9, 3]."""
    H, W = env.shape[:2]
    d = equirect_dirs(H, W)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    basis = jnp.stack(
        [
            jnp.full_like(x, 0.282095),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )                                                   # [H, W, 9]
    # solid angle of each texel: sin(colatitude) * dtheta * dphi
    v = (jnp.arange(H) + 0.5) / H
    sin_col = jnp.sin(v * jnp.pi)[:, None]
    dw = sin_col * (jnp.pi / H) * (2 * jnp.pi / W)
    coeffs = jnp.einsum("hwn,hwc->nc", basis * dw[..., None], env)
    # cosine-lobe convolution factors A_l
    A = jnp.asarray([3.141593, 2.094395, 2.094395, 2.094395,
                     0.785398, 0.785398, 0.785398, 0.785398, 0.785398])
    return coeffs * A[:, None]


def sh_irradiance(coeffs: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Evaluate irradiance/pi (the lambertian diffuse light) at normals
    [., 3] from [9, 3] coefficients."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    basis = jnp.stack(
        [
            jnp.full_like(x, 0.282095),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )
    return jnp.clip(basis @ coeffs, 0.0, None) / jnp.pi


def prefilter_specular_levels(
    env: jnp.ndarray, n_levels: int = 5
) -> Tuple[jnp.ndarray, ...]:
    """Progressively blurred radiance maps approximating GGX prefiltering
    at increasing roughness (specular_cubemap's purpose).  Level r uses a
    blur kernel sized to the GGX lobe's angular spread."""
    H = env.shape[0]
    levels = [env]
    cur = env
    for i in range(1, n_levels):
        rough = i / (n_levels - 1)
        # lobe half-angle ~ rough^2 * pi/2 -> kernel in texels
        k = max(3, int(rough * rough * H * 0.5) | 1)
        cur = gaussian_blur(env, min(k, H // 2 * 2 - 1))
        levels.append(cur)
    return tuple(levels)


def sample_prefiltered(
    levels: Tuple[jnp.ndarray, ...], d: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Roughness-interpolated lookup across prefiltered levels."""
    n = len(levels)
    r = jnp.clip(roughness[..., 0] if roughness.ndim == d.ndim else roughness, 0, 1)
    f = r * (n - 1)
    lo = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = (f - lo.astype(f.dtype))[..., None]
    stack = jnp.stack([sample_envmap(lv, d) for lv in levels], axis=0)  # [L, ..., 3]
    lo_val = jnp.take_along_axis(stack, lo[None, ..., None], axis=0)[0]
    hi_val = jnp.take_along_axis(stack, hi[None, ..., None], axis=0)[0]
    return lo_val * (1 - w) + hi_val * w


def karis_brdf_lut(n_dot_v: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Analytic approximation of the split-sum BRDF integration LUT
    (Karis 2014 mobile approximation) -> [., 2] (scale, bias)."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04])
    nv = jnp.asarray(n_dot_v)
    r = jnp.asarray(roughness)
    if nv.ndim and nv.shape[-1] == 1:
        nv = nv[..., 0]
    if r.ndim and r.shape[-1] == 1:
        r = r[..., 0]
    rv = r[..., None] * c0 + c1
    a004 = (
        jnp.minimum(rv[..., 0] * rv[..., 0], jnp.exp2(-9.28 * nv)) * rv[..., 0]
        + rv[..., 1]
    )
    scale = a004 * -1.04 + rv[..., 2]
    bias = a004 * 1.04 + rv[..., 3]
    return jnp.stack([scale, bias], axis=-1)


def shade_split_sum(
    kd: jnp.ndarray,
    arm: jnp.ndarray,
    nrm: jnp.ndarray,
    wo: jnp.ndarray,
    env: jnp.ndarray,
    n_levels: int = 5,
) -> jnp.ndarray:
    """Complete split-sum environment shading against an equirect map —
    the NVDiffRendererPBR.render_pbr capability (renderer_pbr.py:12-96)."""
    from .pbr import split_sum_shading

    coeffs = sh_project_irradiance(env)
    levels = prefilter_specular_levels(env, n_levels)
    return split_sum_shading(
        kd, arm, nrm, wo,
        diffuse_env_fn=lambda n: sh_irradiance(coeffs, n),
        specular_env_fn=lambda d, r: sample_prefiltered(levels, d, r),
        brdf_lut_fn=karis_brdf_lut,
    )
