"""Classic SR architectures (the BasicSR model-zoo capability).

The vendored BasicSR carries 20+ SR archs (TSD_SR/basicsr/archs); the
production single-image family is provided here in functional jnp:

- RRDBNet (ESRGAN backbone) — basicsr/archs/rrdbnet_arch.py semantics
  (residual-in-residual dense blocks, nearest+conv upsampling).
- MSRResNet — basicsr/archs/srresnet_arch.py (no-BN residual blocks,
  pixel-shuffle upsampling, bilinear global skip).
- EDSR — basicsr/archs/edsr_arch.py (mean-shift by img_range, residual
  trunk + conv_after_body skip, pixel-shuffle upsample).
- SRVGGNetCompact (Real-ESRGAN's compact model) — basicsr/archs/
  srvgg_arch.py (plain conv+PReLU body, HR work deferred to one
  pixel-shuffle, nearest global skip).
- RCAN — basicsr/archs/rcan_arch.py (residual groups of channel-attention
  blocks).
- VGGStyleDiscriminator — basicsr/archs/discriminator_arch.py (SRGAN/
  ESRGAN adversarial training head; batch-statistic norm kept functional).

Deep trunks are stacked [L, ...] and lax.scan-ed (depth-constant compile,
the repo-wide convention). Params are nested dicts of f32 leaves.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RRDBConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4

    @classmethod
    def tiny(cls) -> "RRDBConfig":
        return cls(num_feat=16, num_block=2, num_grow_ch=8, scale=2)


def _conv_init(key, k, cin, cout, gain=1.0):
    fan_in = k * k * cin
    std = gain / math.sqrt(fan_in)
    return {
        "kernel": jax.random.normal(key, (k, k, cin, cout), jnp.float32) * std,
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb_init(key, nf, gc):
    ks = jax.random.split(key, 5)
    # basicsr scales the residual-dense convs by 0.1 at init
    return {
        f"conv{i+1}": _conv_init(ks[i], 3, nf + i * gc, gc if i < 4 else nf, gain=0.1)
        for i in range(5)
    }


def _rdb(p, x):
    c1 = _lrelu(_conv(p["conv1"], x))
    c2 = _lrelu(_conv(p["conv2"], jnp.concatenate([x, c1], -1)))
    c3 = _lrelu(_conv(p["conv3"], jnp.concatenate([x, c1, c2], -1)))
    c4 = _lrelu(_conv(p["conv4"], jnp.concatenate([x, c1, c2, c3], -1)))
    c5 = _conv(p["conv5"], jnp.concatenate([x, c1, c2, c3, c4], -1))
    return c5 * 0.2 + x


def _rrdb_init(key, nf, gc):
    ks = jax.random.split(key, 3)
    return {"rdb1": _rdb_init(ks[0], nf, gc), "rdb2": _rdb_init(ks[1], nf, gc),
            "rdb3": _rdb_init(ks[2], nf, gc)}


def _rrdb(p, x):
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return out * 0.2 + x


def init_rrdbnet_params(key, cfg: RRDBConfig) -> Params:
    ks = jax.random.split(key, 6 + cfg.num_block)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, cfg.num_feat),
        "conv_body": _conv_init(ks[1], 3, cfg.num_feat, cfg.num_feat),
        "conv_up1": _conv_init(ks[2], 3, cfg.num_feat, cfg.num_feat),
        "conv_up2": _conv_init(ks[3], 3, cfg.num_feat, cfg.num_feat),
        "conv_hr": _conv_init(ks[4], 3, cfg.num_feat, cfg.num_feat),
        "conv_last": _conv_init(ks[5], 3, cfg.num_feat, cfg.out_channels),
    }
    from .flux.model import stack_blocks

    p["body"] = stack_blocks(
        [_rrdb_init(ks[6 + i], cfg.num_feat, cfg.num_grow_ch) for i in range(cfg.num_block)]
    )
    return p


def rrdbnet_forward(params: Params, cfg: RRDBConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, H, W, C] in [0, 1] -> [N, H*scale, W*scale, C]."""
    feat = _conv(params["conv_first"], x)

    def body(h, blk):
        return _rrdb(blk, h), None

    body_feat, _ = jax.lax.scan(body, feat, params["body"])
    feat = feat + _conv(params["conv_body"], body_feat)

    def up(h):
        N, H, W, C = h.shape
        return jax.image.resize(h, (N, H * 2, W * 2, C), "nearest")

    if cfg.scale >= 2:
        feat = _lrelu(_conv(params["conv_up1"], up(feat)))
    if cfg.scale >= 4:
        feat = _lrelu(_conv(params["conv_up2"], up(feat)))
    out = _conv(params["conv_last"], _lrelu(_conv(params["conv_hr"], feat)))
    return out


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[N, H, W, C*r^2] -> [N, H*r, W*r, C] (torch PixelShuffle channel order:
    channel index = c*r*r + dy*r + dx)."""
    N, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(N, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, r(dy), W, r(dx), C
    return x.reshape(N, H * r, W * r, C)


def _lrelu01(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _resblock_nobn_init(key, nf, gain=0.1):
    k1, k2 = jax.random.split(key)
    return {"conv1": _conv_init(k1, 3, nf, nf, gain=gain),
            "conv2": _conv_init(k2, 3, nf, nf, gain=gain)}


def _resblock_nobn(p, x, res_scale=1.0):
    res = _conv(p["conv2"], jax.nn.relu(_conv(p["conv1"], x)))
    return x + res * res_scale


def _upsample_ps_init(key, scale, nf):
    """basicsr arch_util.Upsample: log2(scale) x [conv nf->4nf, ps(2)] or
    one [conv nf->9nf, ps(3)]."""
    if scale == 3:
        return {"up0": _conv_init(key, 3, nf, 9 * nf)}
    n = int(math.log2(scale))
    if 2**n != scale:
        raise ValueError(f"upsample scale must be 3 or a power of 2, got {scale}")
    ks = jax.random.split(key, n)
    return {f"up{i}": _conv_init(ks[i], 3, nf, 4 * nf) for i in range(n)}


def _upsample_ps(p, x, scale):
    if scale == 3:
        return pixel_shuffle(_conv(p["up0"], x), 3)
    for i in range(int(math.log2(scale))):
        x = pixel_shuffle(_conv(p[f"up{i}"], x), 2)
    return x


def _resize(x, scale, method):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * scale, W * scale, C), method)


# ---------------------------------------------------------------------------
# MSRResNet (srresnet_arch.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MSRResNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_block: int = 16
    scale: int = 4  # 2, 3 or 4

    @classmethod
    def tiny(cls) -> "MSRResNetConfig":
        return cls(num_feat=16, num_block=2, scale=2)


def init_msrresnet_params(key, cfg: MSRResNetConfig) -> Params:
    if cfg.scale not in (2, 3, 4):
        raise ValueError(f"MSRResNet supports scale 2/3/4, got {cfg.scale}")
    ks = jax.random.split(key, 5 + cfg.num_block)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, cfg.num_feat, gain=0.1),
        "conv_hr": _conv_init(ks[1], 3, cfg.num_feat, cfg.num_feat, gain=0.1),
        "conv_last": _conv_init(ks[2], 3, cfg.num_feat, cfg.out_channels, gain=0.1),
    }
    if cfg.scale == 4:
        p["upconv1"] = _conv_init(ks[3], 3, cfg.num_feat, 4 * cfg.num_feat, gain=0.1)
        p["upconv2"] = _conv_init(ks[4], 3, cfg.num_feat, 4 * cfg.num_feat, gain=0.1)
    else:
        p["upconv1"] = _conv_init(
            ks[3], 3, cfg.num_feat, cfg.scale * cfg.scale * cfg.num_feat, gain=0.1)
    from .flux.model import stack_blocks

    p["body"] = stack_blocks(
        [_resblock_nobn_init(ks[5 + i], cfg.num_feat, gain=1.0)
         for i in range(cfg.num_block)])
    return p


def msrresnet_forward(params: Params, cfg: MSRResNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, H, W, C] -> [N, H*scale, W*scale, C]; bilinear global skip."""
    feat = _lrelu01(_conv(params["conv_first"], x))

    def body(h, blk):
        return _resblock_nobn(blk, h), None

    out, _ = jax.lax.scan(body, feat, params["body"])
    if cfg.scale == 4:
        out = _lrelu01(pixel_shuffle(_conv(params["upconv1"], out), 2))
        out = _lrelu01(pixel_shuffle(_conv(params["upconv2"], out), 2))
    else:
        out = _lrelu01(pixel_shuffle(_conv(params["upconv1"], out), cfg.scale))
    out = _conv(params["conv_last"], _lrelu01(_conv(params["conv_hr"], out)))
    return out + _resize(x, cfg.scale, "bilinear")


# ---------------------------------------------------------------------------
# EDSR (edsr_arch.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EDSRConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_block: int = 16
    scale: int = 4  # 2^n or 3
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)  # DIV2K

    @classmethod
    def tiny(cls) -> "EDSRConfig":
        return cls(num_feat=16, num_block=2, scale=2)


def init_edsr_params(key, cfg: EDSRConfig) -> Params:
    ks = jax.random.split(key, 4 + cfg.num_block)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, cfg.num_feat),
        "conv_after_body": _conv_init(ks[1], 3, cfg.num_feat, cfg.num_feat),
        "upsample": _upsample_ps_init(ks[2], cfg.scale, cfg.num_feat),
        "conv_last": _conv_init(ks[3], 3, cfg.num_feat, cfg.out_channels),
    }
    from .flux.model import stack_blocks

    p["body"] = stack_blocks(
        [_resblock_nobn_init(ks[4 + i], cfg.num_feat, gain=1.0)
         for i in range(cfg.num_block)])
    return p


def edsr_forward(params: Params, cfg: EDSRConfig, x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.rgb_mean, x.dtype)[None, None, None, :]
    h = (x - mean) * cfg.img_range
    h = _conv(params["conv_first"], h)

    def body(f, blk):
        return _resblock_nobn(blk, f, cfg.res_scale), None

    res, _ = jax.lax.scan(body, h, params["body"])
    res = h + _conv(params["conv_after_body"], res)
    out = _conv(params["conv_last"], _upsample_ps(params["upsample"], res, cfg.scale))
    return out / cfg.img_range + mean


# ---------------------------------------------------------------------------
# SRVGGNetCompact (srvgg_arch.py, the Real-ESRGAN "compact" model)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SRVGGConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_conv: int = 16
    scale: int = 4

    @classmethod
    def tiny(cls) -> "SRVGGConfig":
        return cls(num_feat=16, num_conv=2, scale=2)


def init_srvgg_params(key, cfg: SRVGGConfig) -> Params:
    ks = jax.random.split(key, 2 + cfg.num_conv)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, cfg.num_feat),
        "prelu_first": 0.25 * jnp.ones((cfg.num_feat,), jnp.float32),
        "conv_last": _conv_init(
            ks[1], 3, cfg.num_feat, cfg.out_channels * cfg.scale * cfg.scale),
    }
    from .flux.model import stack_blocks

    blocks = []
    for i in range(cfg.num_conv):
        blk = _conv_init(ks[2 + i], 3, cfg.num_feat, cfg.num_feat)
        blk["prelu"] = 0.25 * jnp.ones((cfg.num_feat,), jnp.float32)
        blocks.append(blk)
    p["body"] = stack_blocks(blocks)
    return p


def _prelu(x, slope):
    return jnp.maximum(x, 0) + slope.astype(x.dtype) * jnp.minimum(x, 0)


def srvgg_forward(params: Params, cfg: SRVGGConfig, x: jnp.ndarray) -> jnp.ndarray:
    out = _prelu(_conv(params["conv_first"], x), params["prelu_first"])

    def body(h, blk):
        return _prelu(_conv(blk, h), blk["prelu"]), None

    out, _ = jax.lax.scan(body, out, params["body"])
    out = pixel_shuffle(_conv(params["conv_last"], out), cfg.scale)
    return out + _resize(x, cfg.scale, "nearest")


# ---------------------------------------------------------------------------
# RCAN (rcan_arch.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RCANConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 20
    squeeze_factor: int = 16
    scale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)

    @classmethod
    def tiny(cls) -> "RCANConfig":
        return cls(num_feat=16, num_group=2, num_block=2, squeeze_factor=4, scale=2)


def _rcab_init(key, nf, squeeze):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": _conv_init(k1, 3, nf, nf),
        "conv2": _conv_init(k2, 3, nf, nf),
        "att_down": _conv_init(k3, 1, nf, nf // squeeze),
        "att_up": _conv_init(k4, 1, nf // squeeze, nf),
    }


def _rcab(p, x, res_scale):
    res = _conv(p["conv2"], jax.nn.relu(_conv(p["conv1"], x)))
    # channel attention: global average pool -> squeeze -> excite -> sigmoid
    y = jnp.mean(res, axis=(1, 2), keepdims=True)
    y = jax.nn.sigmoid(_conv(p["att_up"], jax.nn.relu(_conv(p["att_down"], y))))
    return x + res * y * res_scale


def _residual_group_init(key, cfg: RCANConfig):
    ks = jax.random.split(key, cfg.num_block + 1)
    from .flux.model import stack_blocks

    return {
        "blocks": stack_blocks(
            [_rcab_init(ks[i], cfg.num_feat, cfg.squeeze_factor)
             for i in range(cfg.num_block)]),
        "conv": _conv_init(ks[-1], 3, cfg.num_feat, cfg.num_feat),
    }


def _residual_group(p, x, cfg: RCANConfig):
    def body(h, blk):
        return _rcab(blk, h, cfg.res_scale), None

    res, _ = jax.lax.scan(body, x, p["blocks"])
    return x + _conv(p["conv"], res)


def init_rcan_params(key, cfg: RCANConfig) -> Params:
    ks = jax.random.split(key, 4 + cfg.num_group)
    p: Params = {
        "conv_first": _conv_init(ks[0], 3, cfg.in_channels, cfg.num_feat),
        "conv_after_body": _conv_init(ks[1], 3, cfg.num_feat, cfg.num_feat),
        "upsample": _upsample_ps_init(ks[2], cfg.scale, cfg.num_feat),
        "conv_last": _conv_init(ks[3], 3, cfg.num_feat, cfg.out_channels),
    }
    from .flux.model import stack_blocks

    p["groups"] = stack_blocks(
        [_residual_group_init(ks[4 + i], cfg) for i in range(cfg.num_group)])
    return p


def rcan_forward(params: Params, cfg: RCANConfig, x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.rgb_mean, x.dtype)[None, None, None, :]
    h = (x - mean) * cfg.img_range
    h = _conv(params["conv_first"], h)

    def body(f, grp):
        return _residual_group(grp, f, cfg), None

    res, _ = jax.lax.scan(body, h, params["groups"])
    res = h + _conv(params["conv_after_body"], res)
    out = _conv(params["conv_last"], _upsample_ps(params["upsample"], res, cfg.scale))
    return out / cfg.img_range + mean


# ---------------------------------------------------------------------------
# VGGStyleDiscriminator (discriminator_arch.py) — SRGAN/ESRGAN adversary
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VGGDiscriminatorConfig:
    in_channels: int = 3
    num_feat: int = 64
    input_size: int = 128  # 128 or 256

    @classmethod
    def tiny(cls) -> "VGGDiscriminatorConfig":
        return cls(num_feat=8, input_size=128)


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "offset": jnp.zeros((c,), jnp.float32)}


def _bn(p, x, eps=1e-5):
    """Batch-statistic normalization (training-mode BatchNorm kept pure;
    the discriminator only ever runs in training mode in SRGAN/ESRGAN)."""
    mu = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"].astype(x.dtype) + p["offset"].astype(x.dtype)


def _lrelu02(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def init_vgg_discriminator_params(key, cfg: VGGDiscriminatorConfig) -> Params:
    nf = cfg.num_feat
    n_stage = 5 if cfg.input_size == 128 else 6
    widths = [nf, 2 * nf, 4 * nf, 8 * nf, 8 * nf, 8 * nf][:n_stage]
    ks = jax.random.split(key, 2 * n_stage + 3)
    p: Params = {"conv0_0": _conv_init(ks[0], 3, cfg.in_channels, nf)}
    cin = nf
    for i, w in enumerate(widths):
        if i > 0:
            p[f"conv{i}_0"] = _conv_init(ks[2 * i], 3, cin, w)
            p[f"bn{i}_0"] = _bn_init(w)
        # stride-2 4x4 conv halves the spatial size
        p[f"conv{i}_1"] = _conv_init(ks[2 * i + 1], 4, w, w)
        p[f"bn{i}_1"] = _bn_init(w)
        cin = w
    feat_dim = widths[-1] * 4 * 4
    std1 = 1.0 / math.sqrt(feat_dim)
    p["linear1"] = {
        "kernel": jax.random.normal(ks[-2], (feat_dim, 100), jnp.float32) * std1,
        "bias": jnp.zeros((100,), jnp.float32)}
    p["linear2"] = {
        "kernel": jax.random.normal(ks[-1], (100, 1), jnp.float32) * 0.1,
        "bias": jnp.zeros((1,), jnp.float32)}
    return p


def vgg_discriminator_forward(
    params: Params, cfg: VGGDiscriminatorConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """x [N, input_size, input_size, C] -> logits [N, 1]."""
    assert x.shape[1] == x.shape[2] == cfg.input_size
    n_stage = 5 if cfg.input_size == 128 else 6
    feat = _lrelu02(_conv(params["conv0_0"], x))
    for i in range(n_stage):
        if i > 0:
            feat = _lrelu02(_bn(params[f"bn{i}_0"], _conv(params[f"conv{i}_0"], feat)))
        feat = _lrelu02(_bn(params[f"bn{i}_1"], _conv(params[f"conv{i}_1"], feat, stride=2)))
    feat = feat.reshape(feat.shape[0], -1)
    h = _lrelu02(feat @ params["linear1"]["kernel"] + params["linear1"]["bias"])
    return h @ params["linear2"]["kernel"] + params["linear2"]["bias"]
