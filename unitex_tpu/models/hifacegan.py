"""HiFaceGAN face renovation network (basicsr/archs/hifacegan_arch.py,
hifacegan_util.py).

A SPADE generator whose "segmentation map" is the degraded input image
itself, fed through a Local-Importance-Pooling (LIP) encoder, plus the
pix2pixHD-style multiscale PatchGAN discriminator:

* ``SPADE`` — instance-normalize, then scale/shift with gamma/beta convs
  of the nearest-resized guidance map (hifacegan_util.py:12-54; the
  'syncbatch' config falls back to instance norm in the reference too).
* ``SPADEResnetBlock`` — norm->lrelu->conv twice + (learned) shortcut
  (hifacegan_util.py:57-110).
* ``LIPEncoder`` — conv+IN+relu head, then 5 LIP downsamples: learned
  logits gate a ratio of average pools (lip2d, hifacegan_util.py:154-214).
* ``HiFaceGANDiscriminator`` — num_d PatchGAN discriminators over
  progressively downsampled inputs, each returning intermediate features
  for the feature-matching loss (hifacegan_arch.py:167-259).

Spectral normalization is resolved at conversion time: the torch
checkpoints store (weight_orig, weight_u, weight_v) and the converter
divides by sigma = u^T W v once — serving then uses plain convs (the
power iteration is a training-time constraint, not an inference op).
Layout NHWC; params nested dicts of f32 leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _conv_init(key, k, cin, cout, bias=True):
    fan_in = k * k * cin
    p = {"kernel": jax.random.normal(key, (k, k, cin, cout)) / np.sqrt(fan_in)}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _conv(p, x, stride=1, pad=None):
    k = p["kernel"].shape[0]
    if pad is None:
        pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _instance_norm(x, eps=1e-5, scale=None, offset=None):
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + offset
    return y


def _resize_nearest(x, h, w):
    N, _, _, C = x.shape
    return jax.image.resize(x, (N, h, w, C), "nearest")


# --------------------------------------------------------------------- SPADE


def _spade_init(key, norm_nc, label_nc=3, ks=3):
    nhidden = 128 if norm_nc > 128 else norm_nc
    ks_ = jax.random.split(key, 3)
    return {
        "mlp_shared": _conv_init(ks_[0], ks, label_nc, nhidden),
        "mlp_gamma": _conv_init(ks_[1], ks, nhidden, norm_nc, bias=False),
        "mlp_beta": _conv_init(ks_[2], ks, nhidden, norm_nc, bias=False),
    }


def _spade(p, x, seg):
    normalized = _instance_norm(x)
    seg = _resize_nearest(seg, x.shape[1], x.shape[2])
    actv = jax.nn.relu(_conv(p["mlp_shared"], seg))
    return normalized * _conv(p["mlp_gamma"], actv) + _conv(p["mlp_beta"], actv)


def _spade_resblock_init(key, fin, fout):
    fmid = min(fin, fout)
    ks = jax.random.split(key, 6)
    p = {
        "conv_0": _conv_init(ks[0], 3, fin, fmid),
        "conv_1": _conv_init(ks[1], 3, fmid, fout),
        "norm_0": _spade_init(ks[2], fin),
        "norm_1": _spade_init(ks[3], fmid),
    }
    if fin != fout:
        p["conv_s"] = _conv_init(ks[4], 1, fin, fout, bias=False)
        p["norm_s"] = _spade_init(ks[5], fin)
    return p


def _spade_resblock(p, x, seg):
    if "conv_s" in p:
        x_s = _conv(p["conv_s"], _spade(p["norm_s"], x, seg))
    else:
        x_s = x
    dx = _conv(p["conv_0"], _lrelu(_spade(p["norm_0"], x, seg)))
    dx = _conv(p["conv_1"], _lrelu(_spade(p["norm_1"], dx, seg)))
    return x_s + dx


# --------------------------------------------------------------- LIP encoder


def _lip_pool(x, logit_p):
    """SimplifiedLIP (hifacegan_util.py:154-179): ratio of average pools
    weighted by exp(12*sigmoid(IN(conv(x))))."""
    logit = _conv(logit_p["conv"], x)
    logit = _instance_norm(logit, scale=logit_p["in_scale"],
                           offset=logit_p["in_offset"])
    w = jnp.exp(jax.nn.sigmoid(logit) * 12.0)

    def pool(v):
        return jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    return pool(x * w) / (pool(w) + 1e-12)


def _lip_encoder_init(key, input_nc, ngf, n_2xdown=5, max_ratio=16):
    ks = jax.random.split(key, 2 * n_2xdown + 2)
    p: Params = {"head": _conv_init(ks[0], 3, input_nc, ngf, bias=False)}
    cur = 1
    downs = []
    for i in range(n_2xdown):
        nxt = min(cur * 2, max_ratio)
        downs.append({
            "lip": {
                "conv": _conv_init(ks[2 * i + 1], 3, ngf * cur, ngf * cur,
                                   bias=False),
                "in_scale": jnp.ones((ngf * cur,), jnp.float32),
                "in_offset": jnp.zeros((ngf * cur,), jnp.float32),
            },
            "conv": _conv_init(ks[2 * i + 2], 3, ngf * cur, ngf * nxt),
        })
        cur = nxt
    p["downs"] = downs
    return p


def _lip_encoder(p, x):
    h = jax.nn.relu(_instance_norm(_conv(p["head"], x)))
    n = len(p["downs"])
    for i, d in enumerate(p["downs"]):
        h = _lip_pool(h, d["lip"])
        h = _instance_norm(_conv(d["conv"], h))
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


# ----------------------------------------------------------------- generator


@dataclasses.dataclass(frozen=True)
class HiFaceGANConfig:
    num_in_ch: int = 3
    num_feat: int = 64
    num_d: int = 2          # discriminator count (multiscale)
    n_layers_d: int = 4

    @classmethod
    def tiny(cls) -> "HiFaceGANConfig":
        return cls(num_feat=4, num_d=2, n_layers_d=2)


def init_hifacegan_params(key, cfg: HiFaceGANConfig) -> Params:
    nf = cfg.num_feat
    ks = jax.random.split(key, 12)
    return {
        "lip_encoder": _lip_encoder_init(ks[0], cfg.num_in_ch, nf),
        "head_0": _spade_resblock_init(ks[1], 16 * nf, 16 * nf),
        "g_middle_0": _spade_resblock_init(ks[2], 16 * nf, 16 * nf),
        "g_middle_1": _spade_resblock_init(ks[3], 16 * nf, 16 * nf),
        "ups": [
            _spade_resblock_init(ks[4], 16 * nf, 8 * nf),
            _spade_resblock_init(ks[5], 8 * nf, 4 * nf),
            _spade_resblock_init(ks[6], 4 * nf, 2 * nf),
            _spade_resblock_init(ks[7], 2 * nf, nf),
        ],
        "to_rgb": _conv_init(ks[8], 3, nf, 3),   # only the last is used at
        # inference (hifacegan_arch.py:85-91: phase = len(to_rgbs))
    }


def _up2(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, 2 * H, 2 * W, C), "nearest")


def hifacegan_generator(params: Params, cfg: HiFaceGANConfig,
                        x: jnp.ndarray) -> jnp.ndarray:
    """x [N, S, S, 3] (S a multiple of 32) -> renovated [N, S, S, 3] in
    [-1, 1] (hifacegan_arch.py:71-94 with the LIP encoder, inference
    phase)."""
    seg = x
    h = _lip_encoder(params["lip_encoder"], x)       # [N, S/32, S/32, 16nf]
    h = _spade_resblock(params["head_0"], h, seg)
    h = _up2(h)
    h = _spade_resblock(params["g_middle_0"], h, seg)
    h = _spade_resblock(params["g_middle_1"], h, seg)
    for blk in params["ups"]:
        h = _up2(h)
        h = _spade_resblock(blk, h, seg)
    return jnp.tanh(_conv(params["to_rgb"], _lrelu(h)))


# ------------------------------------------------------------- discriminator


def init_hifacegan_discriminator_params(key, cfg: HiFaceGANConfig,
                                        conditional: bool = True) -> Params:
    input_nc = cfg.num_in_ch + (3 if conditional else 0)
    ds = []
    for d in range(cfg.num_d):
        kk = jax.random.fold_in(key, d)
        nf = cfg.num_feat
        layers = [{"conv": _conv_init(jax.random.fold_in(kk, 0), 4,
                                      input_nc, nf)}]
        for n in range(1, cfg.n_layers_d):
            nf_prev, nf = nf, min(nf * 2, 512)
            layers.append({
                "conv": _conv_init(jax.random.fold_in(kk, n), 4, nf_prev, nf,
                                   bias=False),
                "in": jnp.zeros((0,), jnp.float32),
            })
        layers.append({"conv": _conv_init(jax.random.fold_in(kk, 99), 4,
                                          nf, 1)})
        ds.append(layers)
    return {"discriminators": ds}


def _avg_pool3s2_exclude(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def hifacegan_discriminator(params: Params, cfg: HiFaceGANConfig,
                            x: jnp.ndarray) -> List[List[jnp.ndarray]]:
    """x [N, S, S, C] -> per-scale lists of intermediate features (the
    multiscale PatchGAN with keep_features, hifacegan_arch.py:203-259);
    result[d][-1] is scale d's patch logit map."""
    result = []
    for layers in params["discriminators"]:
        feats = []
        h = x
        for li, layer in enumerate(layers):
            last = li == len(layers) - 1
            penult = li == len(layers) - 2
            stride = 1 if (last or penult) else 2
            if li == 0:
                stride = 2
            h = _conv(layer["conv"], h, stride=stride, pad=2)
            if "in" in layer:
                h = _instance_norm(h)
            if not last:
                h = _lrelu(h)
            feats.append(h)
        result.append(feats)
        x = _avg_pool3s2_exclude(x)
    return result
