"""StyleGAN2 generator/discriminator (BasicSR zoo capability).

The vendored BasicSR carries StyleGAN2 (basicsr/archs/stylegan2_arch.py)
as the backbone of its face-restoration / GAN-prior models, driving the
three native CUDA ops (upfirdn2d, fused_act) that ops/basicsr_ops.py
re-expresses in jnp.  This module provides both networks functionally:

* ``StyleGAN2Generator`` — 8-layer style MLP (equalized linears with
  lr_mul), constant 4x4 input, per-resolution pairs of modulated style
  convs with noise injection + skip to-RGB accumulation
  (stylegan2_arch.py:394-586).
* ``StyleGAN2Discriminator`` — equalized convs, residual downsample
  blocks with 1/sqrt(2) skip scaling, minibatch-stddev feature, final
  equalized linears (stylegan2_arch.py:733-799).

TPU shape: the reference's per-sample weight modulation uses grouped
convs with batch-folded weights (stylegan2_arch.py:259-277); here the
mathematically identical input-scale / output-demod form is used instead
(scale x by the style per in-channel, conv with the SHARED kernel, scale
the output by the demod factor) — no grouped conv, one big MXU matmul per
layer, identical numerics because the op is linear.  Layout NHWC; params
nested dicts of f32 leaves.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basicsr_ops import fused_leaky_relu, make_resample_kernel, upfirdn2d

Params = Dict[str, Any]


def _channels(channel_multiplier: int, narrow: float) -> Dict[int, int]:
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


@dataclasses.dataclass(frozen=True)
class StyleGAN2Config:
    out_size: int = 256
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0
    stddev_group: int = 4     # discriminator minibatch-stddev group

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def channels(self) -> Dict[int, int]:
        return _channels(self.channel_multiplier, self.narrow)

    @classmethod
    def tiny(cls) -> "StyleGAN2Config":
        return cls(out_size=16, num_style_feat=16, num_mlp=2, narrow=1 / 32)


# ------------------------------------------------------------- equalized ops


def _eq_linear_init(key, cin, cout, lr_mul=1.0, bias_init=0.0):
    return {"weight": jax.random.normal(key, (cin, cout)) / lr_mul,
            "bias": jnp.full((cout,), bias_init, jnp.float32)}


def _eq_linear(p, x, lr_mul=1.0, activation=False):
    """EqualLinear (stylegan2_arch.py:134-175): runtime weight scale
    1/sqrt(cin)*lr_mul, bias*lr_mul, optional fused lrelu."""
    scale = lr_mul / math.sqrt(p["weight"].shape[0])
    out = x @ (p["weight"] * scale)
    bias = p["bias"] * lr_mul
    if activation:
        return fused_leaky_relu(out, bias)
    return out + bias


def style_mlp(params: List[Params], cfg: StyleGAN2Config, z: jnp.ndarray):
    """z [B, num_style_feat] -> w latent (NormStyleCode + num_mlp equalized
    linears with fused lrelu)."""
    x = z * jax.lax.rsqrt(jnp.mean(z**2, axis=1, keepdims=True) + 1e-8)
    for p in params:
        x = _eq_linear(p, x, lr_mul=cfg.lr_mlp, activation=True)
    return x


# ------------------------------------------------------------ modulated conv


def _mod_conv_init(key, cin, cout, k, num_style_feat):
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.normal(k1, (k, k, cin, cout)),
        "modulation": _eq_linear_init(k2, num_style_feat, cin, bias_init=1.0),
    }


def _mod_conv(p, x, style, demodulate=True, up=False, smooth_kernel=None,
              eps=1e-8):
    """ModulatedConv2d (stylegan2_arch.py:239-279) in input-scale /
    output-demod form.  x [B,H,W,C], style [B,num_style_feat]."""
    w = p["weight"]
    kh, kw, cin, cout = w.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    s = _eq_linear(p["modulation"], style)              # [B, cin]
    if demodulate:
        # demod uses the fully modulated weight (w * s) per sample
        w2 = (scale * w[None]) * s[:, None, None, :, None]   # [B,kh,kw,ci,co]
        demod = jax.lax.rsqrt(jnp.sum(w2**2, axis=(1, 2, 3)) + eps)  # [B,co]
    xs = x * s[:, None, None, :] * scale
    if up:
        # conv_transpose stride 2 pad 0 == lhs-dilated conv with flipped
        # kernel and full padding (output (H-1)*2 + k), then FIR smooth
        out = jax.lax.conv_general_dilated(
            xs, jnp.flip(w, (0, 1)), (1, 1),
            ((kh - 1, kh - 1), (kw - 1, kw - 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        pad = (len(smooth_kernel) - 2) - (kh - 1)
        out = upfirdn2d(
            out, make_resample_kernel(smooth_kernel) * 4.0,
            pad=((pad + 1) // 2 + 1, pad // 2 + 1))
    else:
        out = jax.lax.conv_general_dilated(
            xs, w, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if demodulate:
        out = out * demod[:, None, None, :]
    return out


def _style_conv_init(key, cin, cout, k, num_style_feat):
    return {
        "conv": _mod_conv_init(key, cin, cout, k, num_style_feat),
        "noise_weight": jnp.zeros((), jnp.float32),
        "act_bias": jnp.zeros((cout,), jnp.float32),
    }


def _style_conv(p, cfg, x, style, noise, up=False):
    out = _mod_conv(p["conv"], x, style, demodulate=True, up=up,
                    smooth_kernel=cfg.resample_kernel)
    out = out + p["noise_weight"] * noise
    return fused_leaky_relu(out, p["act_bias"])


def _to_rgb_init(key, cin, num_style_feat):
    return {
        "conv": _mod_conv_init(key, cin, 3, 1, num_style_feat),
        "bias": jnp.zeros((3,), jnp.float32),
    }


def _to_rgb(p, cfg, x, style, skip=None):
    out = _mod_conv(p["conv"], x, style, demodulate=False) + p["bias"]
    if skip is not None:
        k = make_resample_kernel(cfg.resample_kernel) * 4.0
        pad = len(cfg.resample_kernel) - 2
        skip = upfirdn2d(skip, k, up=2, pad=((pad + 1) // 2 + 1, pad // 2))
        out = out + skip
    return out


# ---------------------------------------------------------------- generator


def init_stylegan2_generator_params(key, cfg: StyleGAN2Config) -> Params:
    ch = cfg.channels
    nsf = cfg.num_style_feat
    ks = jax.random.split(key, 4 + 3 * cfg.log_size)
    p: Params = {
        "style_mlp": [
            _eq_linear_init(jax.random.fold_in(ks[0], i), nsf, nsf,
                            lr_mul=cfg.lr_mlp)
            for i in range(cfg.num_mlp)
        ],
        "constant_input": jax.random.normal(ks[1], (4, 4, ch[4])),
        "style_conv1": _style_conv_init(ks[2], ch[4], ch[4], 3, nsf),
        "to_rgb1": _to_rgb_init(ks[3], ch[4], nsf),
        "style_convs": [],
        "to_rgbs": [],
    }
    cin = ch[4]
    for i in range(3, cfg.log_size + 1):
        cout = ch[2**i]
        p["style_convs"].append(
            _style_conv_init(ks[3 * i - 5], cin, cout, 3, nsf))
        p["style_convs"].append(
            _style_conv_init(ks[3 * i - 4], cout, cout, 3, nsf))
        p["to_rgbs"].append(_to_rgb_init(ks[3 * i - 3], cout, nsf))
        cin = cout
    return p


def stylegan2_generator(
    params: Params,
    cfg: StyleGAN2Config,
    styles: Sequence[jnp.ndarray],
    *,
    input_is_latent: bool = False,
    noise: Optional[List[jnp.ndarray]] = None,
    noise_key: Optional[jax.Array] = None,
    truncation: float = 1.0,
    truncation_latent: Optional[jnp.ndarray] = None,
    inject_index: Optional[int] = None,
) -> jnp.ndarray:
    """styles: list of [B, num_style_feat] codes (1 = plain, 2 = mixing at
    inject_index) -> image [B, out_size, out_size, 3]
    (stylegan2_arch.py:512-586).  Noise: explicit per-layer list, or
    derived from noise_key, or zeros."""
    if not input_is_latent:
        styles = [style_mlp(params["style_mlp"], cfg, s) for s in styles]
    if truncation < 1.0:
        styles = [truncation_latent + truncation * (s - truncation_latent)
                  for s in styles]
    B = styles[0].shape[0]
    if len(styles) == 1:
        if styles[0].ndim == 3:
            latent = styles[0]
        else:
            latent = jnp.tile(styles[0][:, None], (1, cfg.num_latent, 1))
    else:
        idx = inject_index if inject_index is not None else cfg.num_latent // 2
        latent = jnp.concatenate([
            jnp.tile(styles[0][:, None], (1, idx, 1)),
            jnp.tile(styles[1][:, None], (1, cfg.num_latent - idx, 1)),
        ], axis=1)

    if noise is None:
        noise = []
        for li in range(cfg.num_layers):
            res = 2 ** ((li + 5) // 2)
            if noise_key is not None:
                noise.append(jax.random.normal(
                    jax.random.fold_in(noise_key, li), (B, res, res, 1)))
            else:
                noise.append(jnp.zeros((B, res, res, 1)))

    out = jnp.tile(params["constant_input"][None], (B, 1, 1, 1))
    out = _style_conv(params["style_conv1"], cfg, out, latent[:, 0], noise[0])
    skip = _to_rgb(params["to_rgb1"], cfg, out, latent[:, 1])

    i = 1
    for g in range(len(params["to_rgbs"])):
        out = _style_conv(params["style_convs"][2 * g], cfg, out,
                          latent[:, i], noise[2 * g + 1], up=True)
        out = _style_conv(params["style_convs"][2 * g + 1], cfg, out,
                          latent[:, i + 1], noise[2 * g + 2])
        skip = _to_rgb(params["to_rgbs"][g], cfg, out, latent[:, i + 2], skip)
        i += 2
    return skip


# ------------------------------------------------------------- discriminator


def _eq_conv_init(key, cin, cout, k, bias=True):
    p = {"weight": jax.random.normal(key, (k, k, cin, cout))}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _eq_conv(p, x, stride=1, padding=0):
    kh, kw, cin, _ = p["weight"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    out = jax.lax.conv_general_dilated(
        x, p["weight"] * scale, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"]
    return out


def _conv_layer_init(key, cin, cout, k, downsample=False, bias=True,
                     activate=True):
    p = {"conv": _eq_conv_init(key, cin, cout, k,
                               bias=bias and not activate)}
    if activate and bias:
        p["act_bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _conv_layer(p, cfg, x, k, downsample=False, activate=True):
    if downsample:
        fir = make_resample_kernel(cfg.resample_kernel)
        pad = (len(cfg.resample_kernel) - 2) + (k - 1)
        x = upfirdn2d(x, fir, pad=((pad + 1) // 2, pad // 2))
        out = _eq_conv(p["conv"], x, stride=2, padding=0)
    else:
        out = _eq_conv(p["conv"], x, stride=1, padding=k // 2)
    if activate:
        if "act_bias" in p:
            out = fused_leaky_relu(out, p["act_bias"])
        else:
            out = jnp.where(out >= 0, out, 0.2 * out) * math.sqrt(2)
    return out


def init_stylegan2_discriminator_params(key, cfg: StyleGAN2Config) -> Params:
    ch = cfg.channels
    ks = jax.random.split(key, cfg.log_size + 5)
    p: Params = {
        "conv_first": _conv_layer_init(ks[0], 3, ch[cfg.out_size], 1),
        "blocks": [],
        "final_linear1": _eq_linear_init(ks[2], ch[4] * 16, ch[4]),
        "final_linear2": _eq_linear_init(ks[3], ch[4], 1),
    }
    cin = ch[cfg.out_size]
    for i in range(cfg.log_size, 2, -1):
        cout = ch[2 ** (i - 1)]
        kk = jax.random.fold_in(ks[4], i)
        p["blocks"].append({
            "conv1": _conv_layer_init(jax.random.fold_in(kk, 0), cin, cin, 3),
            "conv2": _conv_layer_init(jax.random.fold_in(kk, 1), cin, cout, 3,
                                      downsample=True),
            "skip": _conv_layer_init(jax.random.fold_in(kk, 2), cin, cout, 1,
                                     downsample=True, bias=False,
                                     activate=False),
        })
        cin = cout
    p["final_conv"] = _conv_layer_init(ks[1], cin + 1, ch[4], 3)
    return p


def stylegan2_discriminator(params: Params, cfg: StyleGAN2Config,
                            x: jnp.ndarray) -> jnp.ndarray:
    """x [B, out_size, out_size, 3] -> logits [B, 1]
    (stylegan2_arch.py:783-799)."""
    out = _conv_layer(params["conv_first"], cfg, x, 1)
    for blk in params["blocks"]:
        h = _conv_layer(blk["conv1"], cfg, out, 3)
        h = _conv_layer(blk["conv2"], cfg, h, 3, downsample=True)
        s = _conv_layer(blk["skip"], cfg, out, 1, downsample=True,
                        activate=False)
        out = (h + s) / math.sqrt(2)

    B, H, W, C = out.shape
    group = min(B, cfg.stddev_group)
    std = out.reshape(group, B // group, H, W, 1, C)
    std = jnp.sqrt(jnp.var(std, axis=0) + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)[..., 0]  # [B/g,1,1,1]
    std = jnp.tile(std, (group, H, W, 1))
    out = jnp.concatenate([out, std], axis=-1)

    out = _conv_layer(params["final_conv"], cfg, out, 3)
    out = out.reshape(B, -1)
    out = _eq_linear(params["final_linear1"], out, activation=True)
    return _eq_linear(params["final_linear2"], out)
