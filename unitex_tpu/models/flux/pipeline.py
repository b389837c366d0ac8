"""PBR FLUX pipeline: multi-image latent-token conditioned generation.

TPU-native equivalent of ``PBRFluxPipeline``
(/root/reference/flux_piplines/texturing/pipeline.py:406-700): packs noise
latents with a 2x2 pixel shuffle into 64-channel tokens, VAE-encodes the
control (geometry grid) and dual (reference) images into extra token streams
with offset RoPE position ids (control at y+HL/2; dual at x+WL/2, y+HL/2 —
pipeline.py:363-402), concatenates [noise ‖ control ‖ dual] into one
sequence, and runs the flow-match Euler loop re-pinning the condition tokens
each step (:644-645) — here as a single ``lax.scan`` jitted end-to-end.

Inference uses null text conditioning: zero CLIP-pooled [B, 768] and zero T5
[B, 512, 4096] embeddings (:538-543), so no text encoders are required on
the main path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FluxConfig
from .model import flux_forward
from .scheduler import FlowMatchEulerScheduler
from .vae import VAEConfig, vae_decode_jit, vae_encode_jit, vae_encode_sample_jit


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2*W/2, C*4] 2x2 pixel shuffle
    (_pack_latents, texturing/pipeline.py:240-249).  Channel order matches
    the torch NCHW reference: token = [c0p00..cNp00? -> actually
    (C, 2, 2) flattened C-major: channel varies slowest]."""
    B, H, W, C = latents.shape
    x = latents.reshape(B, H // 2, 2, W // 2, 2, C)
    # -> [B, H/2, W/2, C, 2, 2] so the flattened last dim is (C, ph, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (H // 2) * (W // 2), C * 4)


def unpack_latents(packed: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[B, H/2*W/2, C*4] -> [B, H, W, C]."""
    B, S, C4 = packed.shape
    C = C4 // 4
    x = packed.reshape(B, H // 2, W // 2, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H, W, C)


def latent_image_ids(
    h_tokens: int, w_tokens: int, offset_x: int = 0, offset_y: int = 0, offset_z: int = 0
) -> jnp.ndarray:
    """[h*w, 3] (z, y, x) position ids (_prepare_latent_image_ids,
    texturing/pipeline.py:267-276)."""
    ys = jnp.arange(offset_y, offset_y + h_tokens, dtype=jnp.float32)
    xs = jnp.arange(offset_x, offset_x + w_tokens, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gz = jnp.full_like(gy, float(offset_z))
    return jnp.stack([gz, gy, gx], axis=-1).reshape(-1, 3)


@dataclasses.dataclass(frozen=True)
class FluxPipelineConfig:
    height: int = 512
    width: int = 3072
    num_inference_steps: int = 28
    guidance_scale: float = 3.5
    max_sequence_length: int = 512
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096
    base_shift: float = 0.5
    max_shift: float = 1.15
    # number of denoise steps served by sigma-linear velocity extrapolation
    # instead of a transformer evaluation (training-free acceleration; see
    # denoise()/make_reuse_mask).  0 = exact reference schedule.
    velocity_reuse: int = 0


def denoise(
    transformer_params,
    flux_cfg: FluxConfig,
    noise: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt_ids: jnp.ndarray,
    prompt_embeds: jnp.ndarray,
    pooled_embeds: jnp.ndarray,
    scheduler: FlowMatchEulerScheduler,
    guidance_scale: float,
    condition_latents: Optional[jnp.ndarray] = None,
    t_start: int = 0,
    known_tokens: Optional[jnp.ndarray] = None,
    inpaint_mask: Optional[jnp.ndarray] = None,
    fixed_noise: Optional[jnp.ndarray] = None,
    reuse_mask: Optional[jnp.ndarray] = None,
    forward_fn=None,
) -> jnp.ndarray:
    """Flow-match Euler denoise loop over the packed sequence as a
    ``lax.scan``.  noise [B, S_noise, C]; condition_latents [B, S_cond, C]
    appended and re-pinned every step.  Returns denoised noise-tokens.

    ``t_start`` > 0 runs only the trailing steps (img2img — the caller
    pre-noises the input to sigma[t_start]).  ``known_tokens`` [B, S_noise,
    C] + ``inpaint_mask`` [S_noise, 1] (1 = generate, 0 = keep) +
    ``fixed_noise`` enable inpainting: after every Euler step the kept
    region is re-pinned to the clean tokens noised to the NEXT sigma, as in
    diffusers' FluxInpaintPipeline (fast_texture.py's backbone,
    /root/reference/TextureTools/texturetools/texture/reprojection/fast_texture.py:24,105-112).

    ``reuse_mask`` [num_steps] bool: training-free step skipping — on a
    masked step the transformer is NOT evaluated; the velocity is
    extrapolated linearly in sigma from the previous two computed steps,
    v ≈ v₁ + (σᵢ − σᵢ₋₁)/(σᵢ₋₁ − σᵢ₋₂)·(v₁ − v₂) (VDE / TeaCache-style
    rectified-flow acceleration; the flow-match velocity field is smooth
    along the sampling trajectory).  Both scan branches compile once; a
    masked step costs ~0 device time.  Use :func:`make_reuse_mask` — it
    never masks the first two or the last step and never two in a row.

    ``forward_fn`` swaps the velocity model (default
    :func:`~unitex_tpu.models.flux.model.flux_forward`) for a parallel
    variant with the same call signature — e.g.
    ``partial(flux_forward_pp, mesh=mesh, n_micro=1)`` serves the bf16 12B
    model with its weights stage-sharded at rest
    (:func:`~unitex_tpu.models.flux.pp.prepare_flux_params_pp`), or
    ``partial(flux_forward_sp, mesh=mesh, seq_axis=...)`` for
    sequence-parallel long-grid denoising."""
    fwd = flux_forward if forward_fn is None else forward_fn
    B, S_noise, C = noise.shape
    guidance = (
        jnp.full((B,), guidance_scale, jnp.float32)
        if flux_cfg.guidance_embeds
        else None
    )

    if condition_latents is not None:
        latents0 = jnp.concatenate([noise, condition_latents], axis=1)
    else:
        latents0 = noise

    if reuse_mask is not None and t_start > 0:
        # img2img starts mid-schedule: the extrapolator needs two computed
        # velocities first, so clear the first two *executed* steps
        reuse_mask = reuse_mask.at[t_start : t_start + 2].set(False)

    def body(carry, i):
        latents, v1, v2 = carry
        if condition_latents is not None:
            latents = jnp.concatenate(
                [latents[:, :S_noise], condition_latents], axis=1
            )
        t = scheduler.timesteps[i]
        timestep = jnp.full((B,), t / 1000.0, jnp.float32)

        def compute(lat):
            return fwd(
                transformer_params,
                flux_cfg,
                lat,
                prompt_embeds,
                timestep,
                pooled_embeds,
                img_ids,
                txt_ids,
                guidance=guidance,
            )

        if reuse_mask is None:
            v = compute(latents)
        else:
            def extrapolate(lat):
                # v1/v2 were computed at steps i-1 / i-2 (the mask never
                # sets two consecutive steps)
                r = (scheduler.sigmas[i] - scheduler.sigmas[i - 1]) / (
                    scheduler.sigmas[i - 1] - scheduler.sigmas[i - 2]
                )
                return (v1 + r * (v1 - v2)).astype(lat.dtype)

            v = jax.lax.cond(reuse_mask[i], extrapolate, compute, latents)
        latents = scheduler.step(v, i, latents)
        if known_tokens is not None:
            pinned = scheduler.scale_noise(known_tokens, i + 1, fixed_noise)
            gen = latents[:, :S_noise]
            repin = jnp.where(inpaint_mask, gen, pinned) if inpaint_mask is not None else pinned
            latents = jnp.concatenate([repin, latents[:, S_noise:]], axis=1)
        return (latents, v, v1), None

    v0 = jnp.zeros_like(latents0)
    (latents, _, _), _ = jax.lax.scan(
        body, (latents0, v0, v0), jnp.arange(t_start, scheduler.num_steps)
    )
    return latents[:, :S_noise]


def make_reuse_mask(
    num_steps: int, num_reuse: int, start_frac: float = 0.35
) -> Optional[jnp.ndarray]:
    """[num_steps] bool mask with ``num_reuse`` skipped (velocity-reuse)
    steps spread evenly over [start_frac·T, T-1): never the first two
    steps (the extrapolator needs two computed velocities), never the last
    step (it sets the final image), never two in a row."""
    if num_reuse <= 0:
        return None
    mask = np.zeros(num_steps, bool)
    lo = max(2, int(round(start_frac * num_steps)))
    candidates = list(range(lo, num_steps - 1))
    num_reuse = min(num_reuse, (len(candidates) + 1) // 2)
    # even spread, then push off collisions with the no-two-in-a-row rule
    idx = np.linspace(0, len(candidates) - 1, num_reuse)
    for j in np.round(idx).astype(int):
        k = candidates[j]
        while k < num_steps - 1 and (mask[k] or mask[k - 1] or mask[k + 1]):
            k += 1
        if k < num_steps - 1:
            mask[k] = True
    return jnp.asarray(mask)


def run_flux_pipeline(
    transformer_params,
    flux_cfg: FluxConfig,
    vae_params,
    vae_cfg: VAEConfig,
    key: jax.Array,
    pipe_cfg: FluxPipelineConfig,
    control_image: Optional[jnp.ndarray] = None,
    dual_image: Optional[jnp.ndarray] = None,
    prompt_embeds: Optional[jnp.ndarray] = None,
    pooled_embeds: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    control_eps: Optional[jnp.ndarray] = None,
    dual_eps: Optional[jnp.ndarray] = None,
    forward_fn=None,
) -> jnp.ndarray:
    """Full text-free conditioned generation.

    control_image / dual_image: [H, W, 3] / [Hd, Wd, 3] in [0, 1].
    ``noise`` [HL, WL, C] or [1, HL, WL, C] overrides the initial latent
    noise; ``control_eps`` / ``dual_eps`` supply the VAE posterior draws for
    the conditioning encodes (the reference SAMPLES its condition latents,
    _encode_vae_image -> latent_dist.sample(generator),
    texturing/pipeline.py:74-77,318,367).  Together these replay the CUDA
    reference's torch.Generator stream exactly — produce all three with
    :func:`torch_reference_rng` for seed-parity comparison, or dump the
    reference's tensors (golden injection).  Without eps the condition
    encode is the deterministic mode.
    Returns the generated image [H, W, 3] in [0, 1].
    """
    H, W = pipe_cfg.height, pipe_cfg.width
    vs = vae_cfg.downscale
    HL, WL = 2 * (H // (vs * 2)), 2 * (W // (vs * 2))
    C_lat = vae_cfg.latent_channels
    B = 1

    k_noise, k_vae = jax.random.split(key)
    if noise is not None:
        noise = jnp.asarray(noise, jnp.float32)
        if noise.ndim == 3:
            noise = noise[None]
        assert noise.shape == (B, HL, WL, C_lat), noise.shape
    else:
        noise = jax.random.normal(k_noise, (B, HL, WL, C_lat), jnp.float32)
    noise_tokens = pack_latents(noise)
    noise_ids = latent_image_ids(HL // 2, WL // 2)

    cond_tokens = []
    cond_ids = []
    def _encode_cond(img, eps):
        if eps is not None:
            eps = jnp.asarray(eps, jnp.float32)
            if eps.ndim == 3:
                eps = eps[None]
            return vae_encode_sample_jit(vae_params, vae_cfg, img, eps)
        return vae_encode_jit(vae_params, vae_cfg, img)

    if control_image is not None:
        ctrl = control_image[None] * 2.0 - 1.0
        lat = _encode_cond(ctrl, control_eps)
        cond_tokens.append(pack_latents(lat))
        cond_ids.append(
            latent_image_ids(lat.shape[1] // 2, lat.shape[2] // 2, offset_y=HL // 2)
        )
    if dual_image is not None:
        dual = dual_image[None] * 2.0 - 1.0
        lat = _encode_cond(dual, dual_eps)
        cond_tokens.append(pack_latents(lat))
        cond_ids.append(
            latent_image_ids(
                lat.shape[1] // 2, lat.shape[2] // 2,
                offset_x=WL // 2, offset_y=HL // 2,
            )
        )
    condition_latents = (
        jnp.concatenate(cond_tokens, axis=1) if cond_tokens else None
    )
    img_ids = jnp.concatenate([noise_ids] + cond_ids, axis=0)

    if prompt_embeds is None:
        prompt_embeds = jnp.zeros(
            (B, pipe_cfg.max_sequence_length, flux_cfg.joint_attention_dim),
            jnp.float32,
        )
    if pooled_embeds is None:
        pooled_embeds = jnp.zeros((B, flux_cfg.pooled_projection_dim), jnp.float32)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.float32)

    scheduler = FlowMatchEulerScheduler.create(
        pipe_cfg.num_inference_steps,
        noise_tokens.shape[1],
        pipe_cfg.base_image_seq_len,
        pipe_cfg.max_image_seq_len,
        pipe_cfg.base_shift,
        pipe_cfg.max_shift,
    )

    out_tokens = denoise(
        transformer_params,
        flux_cfg,
        noise_tokens,
        img_ids,
        txt_ids,
        prompt_embeds,
        pooled_embeds,
        scheduler,
        pipe_cfg.guidance_scale,
        condition_latents,
        reuse_mask=make_reuse_mask(
            pipe_cfg.num_inference_steps, pipe_cfg.velocity_reuse
        ),
        forward_fn=forward_fn,
    )
    latents = unpack_latents(out_tokens, HL, WL)
    image = vae_decode_jit(vae_params, vae_cfg, latents)[0]
    return jnp.clip(image * 0.5 + 0.5, 0.0, 1.0)


def run_flux_inpaint(
    transformer_params,
    flux_cfg: FluxConfig,
    vae_params,
    vae_cfg: VAEConfig,
    key: jax.Array,
    image: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    strength: float = 1.0,
    num_inference_steps: int = 28,
    guidance_scale: float = 3.5,
    max_sequence_length: int = 512,
    prompt_embeds: Optional[jnp.ndarray] = None,
    pooled_embeds: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """FLUX img2img / inpaint (diffusers FluxInpaintPipeline semantics —
    the backbone of the reference's FastTexture texture-space enhancement,
    fast_texture.py:24, :404-520): encode ``image`` [H, W, 3] in [0, 1],
    noise it to sigma[t_start] with t_start = steps·(1 − strength), run the
    trailing flow-match steps, re-pinning the region where ``mask`` == 0
    after every step.  ``mask`` [H, W] (or [H, W, 1]) with 1 = regenerate,
    0 = keep; ``mask=None`` = plain img2img.  Returns [H, W, 3] in [0, 1].
    """
    H, W = int(image.shape[0]), int(image.shape[1])
    vs = vae_cfg.downscale
    HL, WL = 2 * (H // (vs * 2)), 2 * (W // (vs * 2))
    C_lat = vae_cfg.latent_channels
    B = 1

    x0 = vae_encode_jit(vae_params, vae_cfg, image[None] * 2.0 - 1.0)
    x0_tokens = pack_latents(x0)
    S = x0_tokens.shape[1]

    if noise is None:
        noise = jax.random.normal(key, (B, HL, WL, C_lat), jnp.float32)
    elif noise.ndim == 3:
        noise = noise[None]
    noise_tokens = pack_latents(noise)

    token_mask = None
    if mask is not None:
        m = mask.reshape(H, W)[None, :, :, None].astype(jnp.float32)
        # latent-resolution max-pool (any masked pixel masks the token), then
        # the 2x2 pack makes one mask entry per token
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, vs * 2, vs * 2, 1), (1, vs * 2, vs * 2, 1),
            "VALID",
        )
        token_mask = (m.reshape(-1, 1) > 0.5)

    scheduler = FlowMatchEulerScheduler.create(num_inference_steps, S)
    t_start = min(
        num_inference_steps,
        num_inference_steps - int(round(num_inference_steps * strength)),
    )
    latents0 = scheduler.scale_noise(x0_tokens, jnp.asarray(t_start), noise_tokens)

    img_ids = latent_image_ids(HL // 2, WL // 2)
    if prompt_embeds is None:
        prompt_embeds = jnp.zeros(
            (B, max_sequence_length, flux_cfg.joint_attention_dim), jnp.float32
        )
    if pooled_embeds is None:
        pooled_embeds = jnp.zeros((B, flux_cfg.pooled_projection_dim), jnp.float32)
    txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.float32)

    out_tokens = denoise(
        transformer_params, flux_cfg, latents0, img_ids, txt_ids,
        prompt_embeds, pooled_embeds, scheduler, guidance_scale,
        t_start=t_start,
        known_tokens=x0_tokens if mask is not None else None,
        inpaint_mask=token_mask,
        fixed_noise=noise_tokens if mask is not None else None,
    )
    latents = unpack_latents(out_tokens, HL, WL)
    out = vae_decode_jit(vae_params, vae_cfg, latents)[0]
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)


def torch_reference_rng(
    seed: int,
    noise_hw,
    dual_hw=None,
    control_hw=None,
    latent_channels: int = 16,
    dtype: str = "bfloat16",
):
    """Replay the CUDA reference's torch CPU RNG stream for one FLUX pass.

    The reference seeds ONE ``torch.Generator().manual_seed(seed)``
    (pipeline.py:152) and consumes it in a fixed order inside
    ``prepare_latents_and_image_ids`` (texturing/pipeline.py): the initial
    noise latents (:294), then the DUAL image's VAE posterior draw (:318),
    then the CONTROL image's (:367) — diffusers' randn_tensor draws on the
    generator's (CPU) device in the model dtype and only then moves to
    device, so the exact same values are reproducible here with host torch.

    Args are latent-grid shapes: ``noise_hw``/(``dual_hw``/``control_hw``)
    as (HL, WL) — i.e. image H/8, W/8.  Returns a dict with NHWC float32
    arrays: ``noise`` [1, HL, WL, C] for run_flux_pipeline(noise=...),
    ``dual_eps`` / ``control_eps`` for its eps params (None where the shape
    was not given).  Numeric deviation from the reference is then bounded
    by kernel arithmetic (bf16 matmul order), not by randomness.
    """
    import numpy as np
    import torch

    td = getattr(torch, dtype)
    if isinstance(seed, torch.Generator):
        # thread one generator across passes, like the reference's single
        # self.generator reused by the texture and delight calls
        gen = seed
    else:
        gen = torch.Generator().manual_seed(int(seed))

    def draw(hw):
        HL, WL = hw
        x = torch.randn((1, latent_channels, HL, WL), generator=gen, dtype=td)
        return np.transpose(x.float().numpy(), (0, 2, 3, 1))

    out = {"noise": draw(noise_hw), "dual_eps": None, "control_eps": None}
    if dual_hw is not None:
        out["dual_eps"] = draw(dual_hw)
    if control_hw is not None:
        out["control_eps"] = draw(control_hw)
    return out
