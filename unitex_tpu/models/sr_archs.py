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
- ECBSR — basicsr/archs/ecbsr_arch.py (re-parameterizable edge-oriented
  blocks; ``ecbsr_reparameterize`` collapses each block into one 3x3 conv
  for serving — the TPU-ideal inference form).
- RIDNet — basicsr/archs/ridnet_arch.py (real-image denoising: merge-and-
  run dilated branches + enhancement attention modules).

Deep trunks are stacked [L, ...] and lax.scan-ed (depth-constant compile,
the repo-wide convention). Params are nested dicts of f32 leaves.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------------------
# ECBSR (ecbsr_arch.py) — re-parameterizable edge-oriented blocks
# ---------------------------------------------------------------------------
#
# Training form: each block is conv3x3 + (1x1->3x3) + three (1x1->fixed edge
# filter) branches summed (+ optional identity), PReLU between blocks
# (basicsr/archs/ecbsr_arch.py:155-231).  Serving form: every block collapses
# EXACTLY into one zero-padded 3x3 conv (ecbsr_reparameterize) — the branch
# composition is linear because the reference pads the intermediate 1x1
# output with its own bias (ecbsr_arch.py:104-128), which equals composing
# zero-padded convs.  On TPU we re-param once at load and serve a scanned
# stack of plain convs.

_SOBEL_X = np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]],
                    np.float32)
_SOBEL_Y = _SOBEL_X.T.copy()
_LAPLACIAN = np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]],
                      np.float32)
_ECB_MASKS = {"sbx": _SOBEL_X, "sby": _SOBEL_Y, "lpl": _LAPLACIAN}


@dataclasses.dataclass(frozen=True)
class ECBSRConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_block: int = 4       # trunk blocks between the head/tail ECBs
    num_channel: int = 16
    with_idt: bool = False
    act_type: str = "prelu"  # prelu | relu | linear (trunk; tail is linear)
    scale: int = 2
    depth_multiplier: float = 2.0

    @classmethod
    def tiny(cls) -> "ECBSRConfig":
        return cls(num_block=1, num_channel=8, scale=2)


def _ecb_init(key, cin, cout, mult, act_type):
    ks = jax.random.split(key, 9)
    mid = int(cout * mult)
    p = {
        "conv3x3": _conv_init(ks[0], 3, cin, cout),
        "c13_k0": _conv_init(ks[1], 1, cin, mid),
        "c13_k1": _conv_init(ks[2], 3, mid, cout),
    }
    for bi, br in enumerate(("sbx", "sby", "lpl")):
        p[f"{br}_k0"] = _conv_init(ks[3 + bi], 1, cin, cout)
        p[f"{br}_scale"] = jax.random.normal(ks[6], (cout,)) * 1e-3
        p[f"{br}_bias"] = jax.random.normal(ks[7], (cout,)) * 1e-3
    if act_type == "prelu":
        p["prelu"] = jnp.full((cout,), 0.25, jnp.float32)
    return p


def _conv_valid(kernel, x):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ecb_branches(p, x, with_idt):
    """Structural (training-form) ECB forward: five branches summed.
    The 1x1 intermediates are padded with their bias (= zero-pad the
    biasless output, then add b0 everywhere including the ring)."""
    cout = p["conv3x3"]["kernel"].shape[-1]
    y = _conv(p["conv3x3"], x)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    y0 = jnp.pad(_conv_valid(p["c13_k0"]["kernel"], x), pad) + p["c13_k0"]["bias"]
    y = y + _conv_valid(p["c13_k1"]["kernel"], y0) + p["c13_k1"]["bias"]
    for br, mask in _ECB_MASKS.items():
        y0 = jnp.pad(_conv_valid(p[f"{br}_k0"]["kernel"], x), pad) \
            + p[f"{br}_k0"]["bias"]
        dw = (jnp.asarray(mask)[:, :, None, None]
              * p[f"{br}_scale"][None, None, None, :])  # [3,3,1,cout]
        y = y + jax.lax.conv_general_dilated(
            y0, dw, (1, 1), "VALID", feature_group_count=cout,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[f"{br}_bias"]
    # identity only when shapes allow (ecbsr_arch.py:177-180)
    if with_idt and x.shape[-1] == cout:
        y = y + x
    return y


def _ecb_rep(p, with_idt):
    """Collapse one ECB's branches into a single 3x3 conv (rep_params,
    ecbsr_arch.py:213-231), in HWIO layout."""
    k = p["conv3x3"]["kernel"]
    b = p["conv3x3"]["bias"]
    # conv1x1 -> conv3x3
    k0, b0 = p["c13_k0"]["kernel"][0, 0], p["c13_k0"]["bias"]
    k1, b1 = p["c13_k1"]["kernel"], p["c13_k1"]["bias"]
    k = k + jnp.einsum("cm,hwmo->hwco", k0, k1)
    b = b + jnp.einsum("hwmo,m->o", k1, b0) + b1
    # conv1x1 -> fixed depthwise edge filter
    for br, mask in _ECB_MASKS.items():
        k0, b0 = p[f"{br}_k0"]["kernel"][0, 0], p[f"{br}_k0"]["bias"]
        dw = jnp.asarray(mask)[:, :, None] * p[f"{br}_scale"]  # [3,3,cout]
        k = k + jnp.einsum("co,hwo->hwco", k0, dw)
        b = b + jnp.sum(dw, axis=(0, 1)) * b0 + p[f"{br}_bias"]
    if with_idt and k.shape[-2] == k.shape[-1]:
        k = k.at[1, 1].add(jnp.eye(k.shape[-1], dtype=k.dtype))
    out = {"kernel": k, "bias": b}
    if "prelu" in p:
        out["prelu"] = p["prelu"]
    return out


def init_ecbsr_params(key, cfg: ECBSRConfig) -> Params:
    ks = jax.random.split(key, cfg.num_block + 2)
    nc, m = cfg.num_channel, cfg.depth_multiplier
    return {
        "head": _ecb_init(ks[0], cfg.num_in_ch, nc, m, cfg.act_type),
        "body": jax.tree.map(lambda *xs: jnp.stack(xs), *[
            _ecb_init(ks[1 + i], nc, nc, m, cfg.act_type)
            for i in range(cfg.num_block)
        ]) if cfg.num_block else None,
        "tail": _ecb_init(ks[-1], nc, cfg.num_out_ch * cfg.scale**2, m,
                          "linear"),
    }


def _ecb_act(p, x, act_type):
    if act_type == "prelu":
        return _prelu(x, p["prelu"])
    if act_type == "relu":
        return jax.nn.relu(x)
    return x


def ecbsr_forward(params: Params, cfg: ECBSRConfig, x: jnp.ndarray):
    """Structural forward (training): x [N,H,W,C] in [0,1] ->
    [N,sH,sW,C] (ecbsr_arch.py:267-274; global nearest-up skip via
    channel-repeat + pixel shuffle)."""
    y = _ecb_act(params["head"], _ecb_branches(params["head"], x,
                                               cfg.with_idt), cfg.act_type)
    if params["body"] is not None:
        def body(h, blk):
            return _ecb_act(blk, _ecb_branches(blk, h, cfg.with_idt),
                            cfg.act_type), None
        y, _ = jax.lax.scan(body, y, params["body"])
    y = _ecb_branches(params["tail"], y, cfg.with_idt)
    shortcut = jnp.repeat(x, cfg.scale**2, axis=-1) if cfg.num_in_ch > 1 else x
    return pixel_shuffle(y + shortcut, cfg.scale)


def ecbsr_reparameterize(params: Params, cfg: ECBSRConfig) -> Params:
    """Collapse every block to one conv; run with ecbsr_forward_rep."""
    return {
        "head": _ecb_rep(params["head"], cfg.with_idt),
        "body": jax.vmap(lambda p: _ecb_rep(p, cfg.with_idt))(params["body"])
        if params["body"] is not None else None,
        "tail": _ecb_rep(params["tail"], cfg.with_idt),
    }


def ecbsr_forward_rep(params: Params, cfg: ECBSRConfig, x: jnp.ndarray):
    """Serving forward over re-parameterized single-conv blocks."""
    y = _ecb_act(params["head"], _conv(params["head"], x), cfg.act_type)
    if params["body"] is not None:
        def body(h, blk):
            return _ecb_act(blk, _conv(blk, h), cfg.act_type), None
        y, _ = jax.lax.scan(body, y, params["body"])
    y = _conv(params["tail"], y)
    shortcut = jnp.repeat(x, cfg.scale**2, axis=-1) if cfg.num_in_ch > 1 else x
    return pixel_shuffle(y + shortcut, cfg.scale)


# ---------------------------------------------------------------------------
# RIDNet (ridnet_arch.py) — real image denoising with feature attention
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RIDNetConfig:
    in_channels: int = 3
    mid_channels: int = 64
    out_channels: int = 3
    num_block: int = 4
    img_range: float = 255.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)
    rgb_std: tuple = (1.0, 1.0, 1.0)
    squeeze_factor: int = 16

    @classmethod
    def tiny(cls) -> "RIDNetConfig":
        return cls(mid_channels=16, num_block=2, squeeze_factor=4)


def _mean_shift_params(cfg: RIDNetConfig, sign: int) -> Params:
    """MeanShift 1x1 conv (ridnet_arch.py:8-28): eye/std kernel,
    sign*range*mean/std bias.  Stored as a conv (the torch module's weights
    land in checkpoints) so converted checkpoints override it."""
    std = np.asarray(cfg.rgb_std, np.float32)
    kernel = (np.eye(3, dtype=np.float32) / std[:, None]).T[None, None]
    bias = sign * cfg.img_range * np.asarray(cfg.rgb_mean, np.float32) / std
    return {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}


def _conv_dil(p, x, d):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _eam_init(key, nf, squeeze):
    ks = jax.random.split(key, 12)
    return {
        "merge": {
            "d1a": _conv_init(ks[0], 3, nf, nf),
            "d1b": _conv_init(ks[1], 3, nf, nf),
            "d2a": _conv_init(ks[2], 3, nf, nf),
            "d2b": _conv_init(ks[3], 3, nf, nf),
            "agg": _conv_init(ks[4], 3, 2 * nf, nf),
        },
        "block1": {"conv1": _conv_init(ks[5], 3, nf, nf),
                   "conv2": _conv_init(ks[6], 3, nf, nf)},
        "block2": {"conv1": _conv_init(ks[7], 3, nf, nf),
                   "conv2": _conv_init(ks[8], 3, nf, nf),
                   "conv3": _conv_init(ks[9], 1, nf, nf)},
        "ca": {"down": _conv_init(ks[10], 1, nf, nf // squeeze),
               "up": _conv_init(ks[11], 1, nf // squeeze, nf)},
    }


def _eam(p, x):
    """Enhancement attention module (ridnet_arch.py:110-138): merge-and-run
    (two dilated branches), residual block (+relu), enhanced residual block,
    channel attention."""
    m = p["merge"]
    d1 = jax.nn.relu(_conv_dil(m["d1b"], jax.nn.relu(_conv(m["d1a"], x)), 2))
    d2 = jax.nn.relu(_conv_dil(m["d2b"],
                               jax.nn.relu(_conv_dil(m["d2a"], x, 3)), 4))
    out = jax.nn.relu(_conv(m["agg"], jnp.concatenate([d1, d2], -1))) + x
    out = jax.nn.relu(_resblock_nobn(p["block1"], out))
    b2 = p["block2"]
    r = _conv(b2["conv3"], jax.nn.relu(
        _conv(b2["conv2"], jax.nn.relu(_conv(b2["conv1"], out)))))
    out = jax.nn.relu(r + out)
    att = jnp.mean(out, axis=(1, 2), keepdims=True)
    att = jax.nn.sigmoid(
        _conv(p["ca"]["up"], jax.nn.relu(_conv(p["ca"]["down"], att))))
    return out * att


def init_ridnet_params(key, cfg: RIDNetConfig) -> Params:
    ks = jax.random.split(key, cfg.num_block + 2)
    return {
        "sub_mean": _mean_shift_params(cfg, -1),
        "add_mean": _mean_shift_params(cfg, 1),
        "head": _conv_init(ks[0], 3, cfg.in_channels, cfg.mid_channels),
        "body": jax.tree.map(lambda *xs: jnp.stack(xs), *[
            _eam_init(ks[1 + i], cfg.mid_channels, cfg.squeeze_factor)
            for i in range(cfg.num_block)
        ]),
        "tail": _conv_init(ks[-1], 3, cfg.mid_channels, cfg.out_channels),
    }


def ridnet_forward(params: Params, cfg: RIDNetConfig, x: jnp.ndarray):
    """x [N,H,W,3] (in the checkpoint's img_range scale) -> denoised
    (ridnet_arch.py:178-184: global residual around mean-shifted trunk)."""
    res = _conv(params["sub_mean"], x)
    res = jax.nn.relu(_conv(params["head"], res))
    def body(h, blk):
        return _eam(blk, h), None
    res, _ = jax.lax.scan(body, res, params["body"])
    res = _conv(params["tail"], res)
    res = _conv(params["add_mean"], res)
    return x + res


# ---------------------------------------------------------------------------
# UNetDiscriminatorSN — Real-ESRGAN's discriminator
# (discriminator_arch.py:91-151)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UNetDiscriminatorConfig:
    in_channels: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @classmethod
    def tiny(cls) -> "UNetDiscriminatorConfig":
        return cls(num_feat=8)


def _sn_conv_init(key, k, cin, cout):
    fan_in = k * k * cin
    return {
        "kernel": jax.random.normal(key, (k, k, cin, cout), jnp.float32)
        / math.sqrt(fan_in),
        "u": jax.random.normal(jax.random.fold_in(key, 1), (cout,),
                               jnp.float32),
    }


def spectral_normalize(kernel: jnp.ndarray, u: jnp.ndarray,
                       n_power_iterations: int = 1, eps: float = 1e-12):
    """torch.nn.utils.spectral_norm semantics: power-iterate u/v under
    stop_gradient (torch does it in no_grad), divide the weight by
    sigma = u^T W v (gradient flows through W).  Weight rows follow the
    torch [cout, cin*kh*kw] flattening so converted u vectors line up.
    Returns (normalized kernel, updated u)."""
    cout = kernel.shape[-1]
    w = kernel.transpose(3, 2, 0, 1).reshape(cout, -1)

    def l2(v):
        return v / (jnp.linalg.norm(v) + eps)

    for _ in range(n_power_iterations):
        v = l2(w.T @ u)
        u = l2(w @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w @ v)
    return kernel / sigma, u


def init_unet_discriminator_params(key,
                                   cfg: UNetDiscriminatorConfig) -> Params:
    nf = cfg.num_feat
    ks = jax.random.split(key, 10)
    chans = [(nf, nf * 2), (nf * 2, nf * 4), (nf * 4, nf * 8),   # down 4x4/s2
             (nf * 8, nf * 4), (nf * 4, nf * 2), (nf * 2, nf),   # up 3x3
             (nf, nf), (nf, nf)]                                 # extra 3x3
    p = {"conv0": _conv_init(ks[0], 3, cfg.in_channels, nf)}
    for i, (cin, cout) in enumerate(chans, start=1):
        k = 4 if i <= 3 else 3
        p[f"conv{i}"] = _sn_conv_init(ks[i], k, cin, cout)
    p["conv9"] = _conv_init(ks[9], 3, nf, 1)
    return p


def _up2_bilinear(x):
    from ..image.matlab import interpolate
    return interpolate(x, (x.shape[1] * 2, x.shape[2] * 2), "bilinear")


def unet_discriminator_forward(params: Params, cfg: UNetDiscriminatorConfig,
                               x: jnp.ndarray,
                               update_u: bool = False):
    """x [N,H,W,C] -> patch logits [N,H,W,1]
    (discriminator_arch.py:121-151).  With ``update_u`` also returns the
    params with power-iterated u buffers (torch updates them every
    training forward, so its single iteration converges across steps).
    Without buffer threading (the generic functional train steps) we run
    enough iterations per forward that sigma is converged from the fixed
    stored u — same constraint, no state to carry."""
    new = dict(params)
    n_iter = 1 if update_u else 10

    def sn(name, h, stride=1):
        kern, u = spectral_normalize(params[name]["kernel"],
                                     params[name]["u"],
                                     n_power_iterations=n_iter)
        if update_u:
            new[name] = {"kernel": params[name]["kernel"], "u": u}
        pad = ((1, 1), (1, 1)) if kern.shape[0] == 4 else "SAME"
        return jax.lax.conv_general_dilated(
            h, kern.astype(h.dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x0 = _lrelu(_conv(params["conv0"], x))
    x1 = _lrelu(sn("conv1", x0, 2))
    x2 = _lrelu(sn("conv2", x1, 2))
    x3 = _lrelu(sn("conv3", x2, 2))
    x3 = _up2_bilinear(x3)
    x4 = _lrelu(sn("conv4", x3))
    if cfg.skip_connection:
        x4 = x4 + x2
    x4 = _up2_bilinear(x4)
    x5 = _lrelu(sn("conv5", x4))
    if cfg.skip_connection:
        x5 = x5 + x1
    x5 = _up2_bilinear(x5)
    x6 = _lrelu(sn("conv6", x5))
    if cfg.skip_connection:
        x6 = x6 + x0
    out = _lrelu(sn("conv7", x6))
    out = _lrelu(sn("conv8", out))
    out = _conv(params["conv9"], out)
    if update_u:
        return out, new
    return out
