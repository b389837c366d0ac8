"""FLUX/SD AutoencoderKL in functional JAX.

The conv VAE both FLUX (16 latent channels, scaling 0.3611, shift 0.1159)
and SD3 (same topology) use; the reference calls it for encoding
control/dual condition images and decoding the denoised latents
(/root/reference/flux_piplines/texturing/pipeline.py:330-402, 683-692).

Standard SD encoder/decoder: conv stem, ``len(block_out_channels)`` levels
of ResnetBlock2D pairs with stride-2 downsampling, a mid block with single-
head self-attention, symmetric decoder with nearest-neighbor x2 upsampling.
NHWC layout throughout (TPU-native conv layout).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159

    @classmethod
    def flux(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sd3(cls) -> "VAEConfig":
        return cls(scaling_factor=1.5305, shift_factor=0.0609)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(
            latent_channels=4,
            block_out_channels=(8, 16),
            layers_per_block=1,
            norm_num_groups=4,
            scaling_factor=1.0,
            shift_factor=0.0,
        )

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


# ------------------------------------------------------------ primitives


def conv_init(key, k: int, c_in: int, c_out: int) -> Params:
    fan_in = k * k * c_in
    scale = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(key, (k, k, c_in, c_out), jnp.float32, -scale, scale),
        "bias": jnp.zeros((c_out,), jnp.float32),
    }


def conv(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def group_norm(x: jnp.ndarray, p: Params, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """Statistics in f32 (tiny [N, groups] reductions), normalization
    applied in the INPUT dtype: upcasting the whole tensor to f32 would
    double the HBM peak of a bf16 decode (the decode activations are the
    SR stage's memory ceiling — 128² latent -> 1024² x 512-ch tiles)."""
    N, H, W, C = x.shape
    xg = x.reshape(N, H, W, groups, C // groups)
    mean = xg.astype(jnp.float32).mean(axis=(1, 2, 4), keepdims=True)
    # Two-pass variance: E[(x-mean)^2], not E[x^2]-E[x]^2 — the one-pass
    # form is ill-conditioned when |mean| >> std and measurably amplifies
    # TP-induced latent noise through the deep decode stack.
    var = jnp.square(xg.astype(jnp.float32) - mean).mean(
        axis=(1, 2, 4), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    scale = rstd.astype(x.dtype)
    shift = (-mean * rstd).astype(x.dtype)
    y = (xg * scale + shift).reshape(N, H, W, C)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def gn_init(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _resnet_init(key, c_in: int, c_out: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": gn_init(c_in),
        "conv1": conv_init(k1, 3, c_in, c_out),
        "norm2": gn_init(c_out),
        "conv2": conv_init(k2, 3, c_out, c_out),
    }
    if c_in != c_out:
        p["shortcut"] = conv_init(k3, 1, c_in, c_out)
    return p


def _resnet(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = conv(p["conv1"], jax.nn.silu(group_norm(x, p["norm1"], groups)))
    h = conv(p["conv2"], jax.nn.silu(group_norm(h, p["norm2"], groups)))
    if "shortcut" in p:
        x = conv(p["shortcut"], x)
    return x + h


def _attn_init(key, c: int) -> Params:
    ks = jax.random.split(key, 4)
    def lin(k):
        s = 1.0 / math.sqrt(c)
        return {
            "kernel": jax.random.uniform(k, (c, c), jnp.float32, -s, s),
            "bias": jnp.zeros((c,), jnp.float32),
        }
    return {"norm": gn_init(c), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "o": lin(ks[3])}


def _attn(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    N, H, W, C = x.shape
    h = group_norm(x, p["norm"], groups).reshape(N, H * W, C)
    q = h @ p["q"]["kernel"].astype(h.dtype) + p["q"]["bias"].astype(h.dtype)
    k = h @ p["k"]["kernel"].astype(h.dtype) + p["k"]["bias"].astype(h.dtype)
    v = h @ p["v"]["kernel"].astype(h.dtype) + p["v"]["bias"].astype(h.dtype)
    attn = jax.nn.softmax(
        (q @ jnp.swapaxes(k, -1, -2)).astype(jnp.float32) / math.sqrt(C), axis=-1
    ).astype(h.dtype)
    out = attn @ v
    out = out @ p["o"]["kernel"].astype(h.dtype) + p["o"]["bias"].astype(h.dtype)
    return x + out.reshape(N, H, W, C)


# ------------------------------------------------------------- networks


def init_vae_params(key, cfg: VAEConfig) -> Params:
    ch = cfg.block_out_channels
    n_levels = len(ch)
    keys = iter(jax.random.split(key, 1024))

    enc: Params = {"conv_in": conv_init(next(keys), 3, cfg.in_channels, ch[0])}
    blocks = []
    c_prev = ch[0]
    for lvl in range(n_levels):
        level = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            level["resnets"].append(_resnet_init(next(keys), c_prev, ch[lvl]))
            c_prev = ch[lvl]
        if lvl < n_levels - 1:
            level["downsample"] = conv_init(next(keys), 3, c_prev, c_prev)
        blocks.append(level)
    enc["down"] = blocks
    enc["mid"] = {
        "res1": _resnet_init(next(keys), c_prev, c_prev),
        "attn": _attn_init(next(keys), c_prev),
        "res2": _resnet_init(next(keys), c_prev, c_prev),
    }
    enc["norm_out"] = gn_init(c_prev)
    enc["conv_out"] = conv_init(next(keys), 3, c_prev, 2 * cfg.latent_channels)

    dec: Params = {"conv_in": conv_init(next(keys), 3, cfg.latent_channels, ch[-1])}
    dec["mid"] = {
        "res1": _resnet_init(next(keys), ch[-1], ch[-1]),
        "attn": _attn_init(next(keys), ch[-1]),
        "res2": _resnet_init(next(keys), ch[-1], ch[-1]),
    }
    blocks = []
    c_prev = ch[-1]
    for lvl in reversed(range(n_levels)):
        level = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            level["resnets"].append(_resnet_init(next(keys), c_prev, ch[lvl]))
            c_prev = ch[lvl]
        if lvl > 0:
            level["upsample"] = conv_init(next(keys), 3, c_prev, c_prev)
        blocks.append(level)
    dec["up"] = blocks
    dec["norm_out"] = gn_init(c_prev)
    dec["conv_out"] = conv_init(next(keys), 3, c_prev, cfg.in_channels)
    return {"encoder": enc, "decoder": dec}


def vae_encode(
    params: Params,
    cfg: VAEConfig,
    images: jnp.ndarray,
    sample_key=None,
    sample_eps=None,
) -> jnp.ndarray:
    """images [N, H, W, 3] in [-1, 1] -> scaled latents
    [N, H/8, W/8, latent_channels].  Deterministic (mode) unless a PRNG key
    is given (then samples from the posterior, matching VAE .sample()) or
    ``sample_eps`` supplies the standard-normal draw explicitly (mean-shaped;
    used to replay the reference's torch.Generator posterior stream —
    pipeline.torch_reference_rng)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    x = conv(enc["conv_in"], images)
    for lvl, level in enumerate(enc["down"]):
        for rp in level["resnets"]:
            x = _resnet(rp, x, g)
        if "downsample" in level:
            # diffusers pads (0,1,0,1) then convs stride 2 VALID
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv(level["downsample"], x, stride=2, padding="VALID")
    x = _resnet(enc["mid"]["res1"], x, g)
    x = _attn(enc["mid"]["attn"], x, g)
    x = _resnet(enc["mid"]["res2"], x, g)
    x = conv(enc["conv_out"], jax.nn.silu(group_norm(x, enc["norm_out"], g)))
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample_eps is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jnp.asarray(sample_eps, mean.dtype)
    elif sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(sample_key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def vae_decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled latents -> images [N, H, W, 3] in [-1, 1] (unclamped)."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    z = latents / cfg.scaling_factor + cfg.shift_factor
    x = conv(dec["conv_in"], z)
    x = _resnet(dec["mid"]["res1"], x, g)
    x = _attn(dec["mid"]["attn"], x, g)
    x = _resnet(dec["mid"]["res2"], x, g)
    for level in dec["up"]:
        for rp in level["resnets"]:
            x = _resnet(rp, x, g)
        if "upsample" in level:
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method="nearest")
            x = conv(level["upsample"], x)
    return conv(dec["conv_out"], jax.nn.silu(group_norm(x, dec["norm_out"], g)))


@functools.partial(jax.jit, static_argnames=("cfg",))
def vae_encode_jit(params: Params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Jitted :func:`vae_encode` — one fused device program instead of an
    eager per-conv dispatch chain (each eager op pays scheduling overhead;
    through the remote-exec tunnel that dominated the tiled-VAE SR stage)."""
    return vae_encode(params, cfg, images)


@functools.partial(jax.jit, static_argnames=("cfg",))
def vae_encode_sample_jit(
    params: Params, cfg: VAEConfig, images: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """Jitted posterior-sampling encode with an explicit standard-normal
    draw — the reference's ``latent_dist.sample(generator)`` with the
    generator's stream replayed (texturing/pipeline.py:74-77)."""
    return vae_encode(params, cfg, images, sample_eps=eps)


@functools.partial(jax.jit, static_argnames=("cfg",))
def vae_decode_jit(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Jitted :func:`vae_decode` (see :func:`vae_encode_jit`)."""
    return vae_decode(params, cfg, latents)
