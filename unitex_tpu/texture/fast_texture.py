"""FastTexture: diffusion-based texture-space enhancement helpers.

Capability of the reference's reprojection toolkit ``FastTexture``
(/root/reference/TextureTools/texturetools/texture/reprojection/fast_texture.py:58-277),
which wraps diffusers FLUX inpaint / upscaler pipelines to repair invalid
UV regions and upscale baked textures.  Here both run on the in-repo FLUX
MMDiT via ``run_flux_inpaint`` (models/flux/pipeline.py) — no external
pipelines, one jitted scan per call.

Textures are [H, W, 3] float in [0, 1]; masks are [H, W] bool/float with
True/1 = texel needs (re)generation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.flux.config import FluxConfig
from ..models.flux.pipeline import run_flux_inpaint
from ..models.flux.vae import VAEConfig


def inpaint_texture(
    transformer_params,
    flux_cfg: FluxConfig,
    vae_params,
    vae_cfg: VAEConfig,
    key: jax.Array,
    texture: jnp.ndarray,
    invalid_mask: jnp.ndarray,
    strength: float = 1.0,
    num_inference_steps: int = 28,
    guidance_scale: float = 3.5,
    prompt_embeds: Optional[jnp.ndarray] = None,
    pooled_embeds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Regenerate the invalid texels of a baked texture, keeping the valid
    region pinned (ImageInpaintingModel, fast_texture.py:58-150)."""
    out = run_flux_inpaint(
        transformer_params, flux_cfg, vae_params, vae_cfg, key,
        texture, mask=jnp.asarray(invalid_mask, jnp.float32),
        strength=strength, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        prompt_embeds=prompt_embeds, pooled_embeds=pooled_embeds,
    )
    # hard-keep the valid texels at full resolution (the latent-space pin is
    # token-granular; valid pixels must survive exactly)
    keep = jnp.asarray(invalid_mask, jnp.float32).reshape(
        texture.shape[0], texture.shape[1], 1
    )
    return out * keep + texture * (1.0 - keep)


def upscale_texture(
    transformer_params,
    flux_cfg: FluxConfig,
    vae_params,
    vae_cfg: VAEConfig,
    key: jax.Array,
    texture: jnp.ndarray,
    scale: int = 2,
    strength: float = 0.3,
    num_inference_steps: int = 28,
    guidance_scale: float = 3.5,
    prompt_embeds: Optional[jnp.ndarray] = None,
    pooled_embeds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Upscale a texture xN: bicubic upsample then a low-strength img2img
    refinement pass (ImageUpscalerModel, fast_texture.py:153-277; the
    reference runs a FLUX controlnet-upscaler — same contract: HxW in,
    sH x sW out, detail re-synthesized by the diffusion prior)."""
    H, W, C = texture.shape
    up = jax.image.resize(texture, (H * scale, W * scale, C), "cubic")
    up = jnp.clip(up, 0.0, 1.0)
    return run_flux_inpaint(
        transformer_params, flux_cfg, vae_params, vae_cfg, key,
        up, mask=None, strength=strength,
        num_inference_steps=num_inference_steps, guidance_scale=guidance_scale,
        prompt_embeds=prompt_embeds, pooled_embeds=pooled_embeds,
    )
