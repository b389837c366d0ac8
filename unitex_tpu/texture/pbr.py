"""Physically-based shading ops in jnp.

Equivalents of the nvdiffrec renderutils CUDA kernels the reference vendors
(/root/reference/TextureTools/texturetools/texture/pbr/renderutils/ops.py:96-561,
c_src/bsdf.cu) — Schlick Fresnel, GGX NDF, Smith masking, Lambert and
Frostbite diffuse, the combined pbr_specular / pbr_bsdf, and shading-normal
preparation.  The reference ships pure-PyTorch references next to its CUDA
kernels for testing (bsdf.py); these jnp versions serve as both the
implementation (XLA fuses them fine — they are pure elementwise math, no
custom kernel needed on TPU) and the parity surface.

Conventions follow nvdiffrec: all vectors [., 3] in world space, ``nrm``
unit, ``wo`` view direction (surface->eye), ``wi`` light direction
(surface->light), ``min_roughness`` clamps GGX alpha.
"""

from __future__ import annotations

import jax.numpy as jnp

SPECULAR_EPSILON = 1e-4


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _safe_normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def fresnel_schlick(f0, f90, cos_theta):
    """Schlick's approximation (bsdf.cu fresnelSchlick)."""
    scale = jnp.power(
        jnp.clip(1.0 - cos_theta, SPECULAR_EPSILON, 1.0), 5.0
    )
    return f0 * (1.0 - scale) + f90 * scale


def ndf_ggx(alpha_sqr, cos_theta):
    """GGX/Trowbridge-Reitz normal distribution."""
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * jnp.pi)


def lambda_ggx(alpha_sqr, cos_theta):
    """Smith lambda term."""
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    cs = c * c
    tan_sqr = (1.0 - cs) / cs
    return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * tan_sqr) - 1.0)


def masking_smith(alpha_sqr, cos_theta_i, cos_theta_o):
    """Height-correlated Smith masking-shadowing."""
    li = lambda_ggx(alpha_sqr, cos_theta_i)
    lo = lambda_ggx(alpha_sqr, cos_theta_o)
    return 1.0 / (1.0 + li + lo)


def lambert(nrm, wi):
    """Lambert diffuse kernel (bsdf.cu lambert): max(dot)/pi."""
    return jnp.clip(_dot(nrm, wi), 0.0, None) / jnp.pi


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    """Frostbite's normalized Disney diffuse (bsdf.cu frostbiteDiffuse)."""
    wi_dot_n = _dot(wi, nrm)
    wo_dot_n = _dot(wo, nrm)
    h = _safe_normalize(wo + wi)
    wi_dot_h = _dot(wi, h)
    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wi_dot_h * wi_dot_h * linear_roughness
    f0 = 1.0
    light_scatter = fresnel_schlick(f0, f90, wi_dot_n)
    view_scatter = fresnel_schlick(f0, f90, wo_dot_n)
    mask = (wi_dot_n > 0) & (wo_dot_n > 0)
    val = light_scatter * view_scatter * energy_factor * jnp.clip(wi_dot_n, 0.0, None) / jnp.pi
    return jnp.where(mask, val, 0.0)


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness=0.08):
    """Cook-Torrance GGX specular (bsdf.cu pbrSpecular)."""
    _alpha = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    alpha_sqr = _alpha * _alpha
    h = _safe_normalize(wo + wi)
    wo_dot_n = _dot(wo, nrm)
    wi_dot_n = _dot(wi, nrm)
    wo_dot_h = _dot(wo, h)
    n_dot_h = _dot(nrm, h)
    d = ndf_ggx(alpha_sqr, n_dot_h)
    g = masking_smith(alpha_sqr, wo_dot_n, wi_dot_n)
    f = fresnel_schlick(col, 1.0, wo_dot_h)
    w = f * d * g * 0.25 / jnp.clip(wo_dot_n, SPECULAR_EPSILON, None)
    frontfacing = (wo_dot_n > SPECULAR_EPSILON) & (wi_dot_n > SPECULAR_EPSILON)
    return jnp.where(frontfacing, w, 0.0)


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness=0.08, bsdf="lambert"):
    """Full PBR BSDF (bsdf.cu pbrBSDF): kd albedo, arm = (ao, roughness,
    metallic), point lighting."""
    wo = _safe_normalize(view_pos - pos)
    wi = _safe_normalize(light_pos - pos)
    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1.0 - spec_str)
    kd_diff = kd * (1.0 - metallic)
    if bsdf == "lambert":
        diffuse = kd_diff * lambert(nrm, wi)
    else:
        diffuse = kd_diff * frostbite_diffuse(nrm, wi, wo, roughness)
    specular = pbr_specular(ks, nrm, wo, wi, roughness * roughness, min_roughness)
    return diffuse + specular


def prepare_shading_normal(
    pos, view_pos, perturbed_nrm, smooth_nrm, smooth_tng, geom_nrm,
    two_sided_shading=True, opengl=True,
):
    """Tangent-space normal mapping + two-sided flip (normal.cu
    prepareShadingNormal)."""
    smooth_nrm = _safe_normalize(smooth_nrm)
    smooth_tng = _safe_normalize(smooth_tng)
    smooth_bitng = _safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    if opengl:
        shading_nrm = (
            smooth_tng * perturbed_nrm[..., 0:1]
            - smooth_bitng * perturbed_nrm[..., 1:2]
            + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], 0.0, None)
        )
    else:
        shading_nrm = (
            smooth_tng * perturbed_nrm[..., 0:1]
            + smooth_bitng * perturbed_nrm[..., 1:2]
            + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], 0.0, None)
        )
    shading_nrm = _safe_normalize(shading_nrm)
    if two_sided_shading:
        wo = view_pos - pos
        flip = _dot(geom_nrm, wo) < 0
        shading_nrm = jnp.where(flip, -shading_nrm, shading_nrm)
    return shading_nrm


# ---------------------------------------------------- split-sum shading


def reflect(wo, nrm):
    return 2.0 * _dot(nrm, wo) * nrm - wo


def split_sum_shading(
    kd, arm, nrm, wo, diffuse_env_fn, specular_env_fn, brdf_lut_fn
):
    """Split-sum environment shading (renderer_pbr.py:12-96 capability):
    diffuse irradiance lookup + prefiltered specular with the BRDF LUT.

    diffuse_env_fn(dir [., 3]) -> [., 3];
    specular_env_fn(dir, roughness) -> [., 3];
    brdf_lut_fn(n_dot_v, roughness) -> [., 2] (scale, bias).
    """
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    kd_diff = kd * (1.0 - metallic)
    ks = 0.04 * (1.0 - metallic) + kd * metallic
    n_dot_v = jnp.clip(_dot(nrm, wo), SPECULAR_EPSILON, 1.0)
    refl = reflect(wo, nrm)
    diffuse = kd_diff * diffuse_env_fn(nrm)
    lut = brdf_lut_fn(n_dot_v, roughness)
    spec_col = ks * lut[..., 0:1] + lut[..., 1:2]
    specular = spec_col * specular_env_fn(refl, roughness)
    return diffuse + specular


# -------------------------------------------------------- image losses


def image_loss(img, target, loss: str = "l1", tonemapper: str = "log_srgb"):
    """nvdiffrec's tonemapped image loss (loss.cu imgLoss)."""

    def tonemap(x):
        if tonemapper == "log_srgb":
            x = jnp.log(jnp.clip(x, 0.0, 65535.0) + 1.0)
            srgb = jnp.where(
                x > 0.0031308,
                jnp.power(jnp.clip(x, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
                12.92 * x,
            )
            return srgb
        return x

    a = tonemap(img)
    b = tonemap(target)
    err = jnp.abs(a - b) if loss == "l1" else (a - b) ** 2
    return err.mean()
