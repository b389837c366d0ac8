"""SwinIR — shifted-window transformer for image restoration.

The BasicSR zoo's transformer SR arch (TSD_SR/basicsr/archs/swinir_arch.py:
window attention with relative position bias, alternating shifted windows,
residual Swin transformer blocks (RSTB) with a trailing conv, pixel-shuffle
reconstruction, mean-shift by img_range).  Functional jnp, repo
conventions: per-group STL layers stacked [L, ...] and lax.scan-ed; window
attention is batched [nW, w², C] matmuls (MXU-friendly); shift masks and
relative-position indices are trace-time numpy constants.

Dropout/drop-path are inference-time no-ops upstream and omitted.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sr_archs import _conv, _conv_init, _upsample_ps, _upsample_ps_init, pixel_shuffle

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SwinIRConfig:
    in_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: int = 6
    window_size: int = 8
    mlp_ratio: float = 4.0
    scale: int = 4
    num_feat: int = 64  # reconstruction width
    img_range: float = 1.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)

    @classmethod
    def tiny(cls) -> "SwinIRConfig":
        return cls(embed_dim=16, depths=(2, 2), num_heads=2, window_size=4,
                   mlp_ratio=2.0, scale=2, num_feat=16)


def _dense_init(key, d_in, d_out):
    std = 1.0 / math.sqrt(d_in)
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _ln_init(c):
    return {"g": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _stl_init(key, cfg: SwinIRConfig):
    C = cfg.embed_dim
    w = cfg.window_size
    ks = jax.random.split(key, 5)
    return {
        "norm1": _ln_init(C),
        "qkv": _dense_init(ks[0], C, 3 * C),
        "proj": _dense_init(ks[1], C, C),
        # truncated-normal(0.02) table in the reference; plain normal is fine
        "rel_bias": 0.02 * jax.random.normal(
            ks[2], ((2 * w - 1) ** 2, cfg.num_heads), jnp.float32),
        "norm2": _ln_init(C),
        "fc1": _dense_init(ks[3], C, int(C * cfg.mlp_ratio)),
        "fc2": _dense_init(ks[4], int(C * cfg.mlp_ratio), C),
    }


def init_swinir_params(key, cfg: SwinIRConfig) -> Params:
    from .flux.model import stack_blocks

    C = cfg.embed_dim
    n_groups = len(cfg.depths)
    ks = jax.random.split(key, 6 + n_groups)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, C),
        "norm": _ln_init(C),
        "conv_after_body": _conv_init(ks[1], 3, C, C),
        "conv_before_upsample": _conv_init(ks[2], 3, C, cfg.num_feat),
        "upsample": _upsample_ps_init(ks[3], cfg.scale, cfg.num_feat),
        "conv_last": _conv_init(ks[4], 3, cfg.num_feat, cfg.in_channels),
    }
    groups = []
    for gi, depth in enumerate(cfg.depths):
        gks = jax.random.split(ks[6 + gi], depth + 1)
        groups.append({
            "layers": stack_blocks([_stl_init(gks[i], cfg) for i in range(depth)]),
            "conv": _conv_init(gks[-1], 3, C, C),
        })
    p["groups"] = groups  # python list: group count is small and static
    return p


def _rel_position_index(w: int) -> np.ndarray:
    """[w*w, w*w] indices into the (2w-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(H: int, W: int, w: int, s: int) -> np.ndarray:
    """[nW, w², w²] additive attention mask (0 / -100) for shift s."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_attention(p, cfg: SwinIRConfig, x: jnp.ndarray, mask) -> jnp.ndarray:
    """x [B, H, W, C]; mask [nW, w², w²] or None."""
    B, H, W, C = x.shape
    w = cfg.window_size
    nh = cfg.num_heads
    hd = C // nh
    nw = (H // w) * (W // w)
    xw = x.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nw, w * w, C)
    qkv = _dense(p["qkv"], xw).reshape(B * nw, w * w, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [Bn, w², nh, hd]
    q = q.transpose(0, 2, 1, 3) * (hd ** -0.5)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    idx = jnp.asarray(_rel_position_index(w))
    bias = p["rel_bias"][idx]                            # [w², w², nh]
    attn = attn + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        attn = attn.reshape(B, nw, nh, w * w, w * w) + mask[None, :, None]
        attn = attn.reshape(B * nw, nh, w * w, w * w)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B * nw, w * w, C)
    out = _dense(p["proj"], out)
    out = out.reshape(B, H // w, W // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)


def _stl(p, cfg: SwinIRConfig, x: jnp.ndarray, shift: jnp.ndarray, mask) -> jnp.ndarray:
    """One Swin transformer layer; ``shift`` is a traced 0/s scalar — the
    roll is applied unconditionally (roll by 0 is the identity) so the
    scanned body stays shape-stable, and the mask is selected by where."""
    B, H, W, C = x.shape
    shortcut = x
    h = _ln(p["norm1"], x)
    h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    masked = _window_attention(p, cfg, h, mask)
    unmasked = _window_attention(p, cfg, h, None)
    h = jnp.where(shift > 0, masked, unmasked)
    h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h
    return x + _dense(p["fc2"], jax.nn.gelu(_dense(p["fc1"], _ln(p["norm2"], x))))


def swinir_forward(params: Params, cfg: SwinIRConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, H, W, C] in [0, 1] -> [N, H*scale, W*scale, C].

    H and W must be multiples of window_size (pad with reflect beforehand —
    the reference pads inside forward, check_image_size)."""
    N, H, W, _ = x.shape
    w = cfg.window_size
    assert H % w == 0 and W % w == 0, "pad inputs to a window multiple"
    s = w // 2
    mean = jnp.asarray(cfg.rgb_mean, x.dtype)[None, None, None, :]
    xs = (x - mean) * cfg.img_range
    feat = _conv(params["conv_first"], xs)

    mask = jnp.asarray(_shift_mask(H, W, w, s))
    body = feat
    if "patch_norm" in params:
        # official SwinIR patch_norm=True: LayerNorm on the embedded tokens
        # before the first RSTB (patch_embed.norm in the torch checkpoint)
        body = _ln(params["patch_norm"], body)
    for group in params["groups"]:
        g_in = body
        depth = jax.tree.leaves(group["layers"])[0].shape[0]
        shifts = jnp.asarray([0 if i % 2 == 0 else s for i in range(depth)])

        def stl_body(h, layer_and_shift):
            layer, sh = layer_and_shift
            return _stl(layer, cfg, h, sh, mask), None

        body, _ = jax.lax.scan(stl_body, g_in, (group["layers"], shifts))
        body = g_in + _conv(group["conv"], body)

    body = _ln(params["norm"], body)
    feat = feat + _conv(params["conv_after_body"], body)
    feat = jax.nn.leaky_relu(_conv(params["conv_before_upsample"], feat), 0.01)
    feat = _upsample_ps(params["upsample"], feat, cfg.scale)
    out = _conv(params["conv_last"], feat)
    return out / cfg.img_range + mean
