"""Classic SR architectures (the BasicSR model-zoo capability).

The vendored BasicSR carries 20+ SR archs (TSD_SR/basicsr/archs); RRDBNet
(ESRGAN's backbone, the most-used one and the template the others follow)
is provided here in functional jnp — residual-in-residual dense blocks +
pixel-shuffle-free nearest-conv upsampling, matching basicsr/archs/
rrdbnet_arch.py semantics.
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
