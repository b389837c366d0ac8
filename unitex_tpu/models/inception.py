"""FID InceptionV3 feature extractor (basicsr/archs/inception.py parity).

The reference computes FID with pytorch-fid's patched InceptionV3
(/root/reference/TSD_SR/basicsr/archs/inception.py): torchvision's
Inception-v3 trunk with TF-compat patches — average pools that exclude
padding from the denominator (FIDInceptionA/C/E_1) and a max pool in the
last InceptionE (FIDInceptionE_2) — loaded from the
pt_inception-2015-12-05 checkpoint (1008 classes, fc unused for
features).  This module provides that network functionally in jnp,
returning the standard FID feature blocks:

  0: after maxpool1 (64ch)    1: after maxpool2 (192ch)
  2: pre-aux (768ch)          3: final average pool (2048ch)

``convert_fid_inception`` maps the pytorch-fid checkpoint onto the init
tree; ``utils.metrics.frechet_distance`` consumes the block-3 features.
Layout NHWC; BasicConv2d = bias-free conv + BN(eps 1e-3, eval stats) +
relu.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ------------------------------------------------------------ basic pieces


def _bconv_init(key, cin, cout, kh, kw):
    fan_in = kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout)) / np.sqrt(fan_in),
        "bn_scale": jnp.ones((cout,), jnp.float32),
        "bn_offset": jnp.zeros((cout,), jnp.float32),
        "bn_mean": jnp.zeros((cout,), jnp.float32),
        "bn_var": jnp.ones((cout,), jnp.float32),
    }


def _bconv(p, x, stride=1, pad=(0, 0)):
    """BasicConv2d: conv(bias=False) + BatchNorm(eps=1e-3, eval) + relu."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    inv = jax.lax.rsqrt(p["bn_var"] + 1e-3)
    return jax.nn.relu((y - p["bn_mean"]) * inv * p["bn_scale"]
                       + p["bn_offset"])


def _max_pool(x, k=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avg_pool3_exclude(x):
    """3x3 stride-1 pad-1 average pool with padding EXCLUDED from the
    denominator (the TF-compat FID patch, inception.py:205-208)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


# -------------------------------------------------------- inception blocks


def _incep_a_init(key, cin, pool_features):
    ks = jax.random.split(key, 7)
    return {
        "branch1x1": _bconv_init(ks[0], cin, 64, 1, 1),
        "branch5x5_1": _bconv_init(ks[1], cin, 48, 1, 1),
        "branch5x5_2": _bconv_init(ks[2], 48, 64, 5, 5),
        "branch3x3dbl_1": _bconv_init(ks[3], cin, 64, 1, 1),
        "branch3x3dbl_2": _bconv_init(ks[4], 64, 96, 3, 3),
        "branch3x3dbl_3": _bconv_init(ks[5], 96, 96, 3, 3),
        "branch_pool": _bconv_init(ks[6], cin, pool_features, 1, 1),
    }


def _incep_a(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x), pad=(2, 2))
    b3 = _bconv(p["branch3x3dbl_1"], x)
    b3 = _bconv(p["branch3x3dbl_2"], b3, pad=(1, 1))
    b3 = _bconv(p["branch3x3dbl_3"], b3, pad=(1, 1))
    bp = _bconv(p["branch_pool"], _avg_pool3_exclude(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _incep_b_init(key, cin):
    ks = jax.random.split(key, 4)
    return {
        "branch3x3": _bconv_init(ks[0], cin, 384, 3, 3),
        "branch3x3dbl_1": _bconv_init(ks[1], cin, 64, 1, 1),
        "branch3x3dbl_2": _bconv_init(ks[2], 64, 96, 3, 3),
        "branch3x3dbl_3": _bconv_init(ks[3], 96, 96, 3, 3),
    }


def _incep_b(p, x):
    b3 = _bconv(p["branch3x3"], x, stride=2)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=(1, 1))
    bd = _bconv(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _incep_c_init(key, cin, c7):
    ks = jax.random.split(key, 10)
    return {
        "branch1x1": _bconv_init(ks[0], cin, 192, 1, 1),
        "branch7x7_1": _bconv_init(ks[1], cin, c7, 1, 1),
        "branch7x7_2": _bconv_init(ks[2], c7, c7, 1, 7),
        "branch7x7_3": _bconv_init(ks[3], c7, 192, 7, 1),
        "branch7x7dbl_1": _bconv_init(ks[4], cin, c7, 1, 1),
        "branch7x7dbl_2": _bconv_init(ks[5], c7, c7, 7, 1),
        "branch7x7dbl_3": _bconv_init(ks[6], c7, c7, 1, 7),
        "branch7x7dbl_4": _bconv_init(ks[7], c7, c7, 7, 1),
        "branch7x7dbl_5": _bconv_init(ks[8], c7, 192, 1, 7),
        "branch_pool": _bconv_init(ks[9], cin, 192, 1, 1),
    }


def _incep_c(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_1"], x)
    b7 = _bconv(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_1"], x)
    bd = _bconv(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _bconv(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _bconv(p["branch_pool"], _avg_pool3_exclude(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _incep_d_init(key, cin):
    ks = jax.random.split(key, 6)
    return {
        "branch3x3_1": _bconv_init(ks[0], cin, 192, 1, 1),
        "branch3x3_2": _bconv_init(ks[1], 192, 320, 3, 3),
        "branch7x7x3_1": _bconv_init(ks[2], cin, 192, 1, 1),
        "branch7x7x3_2": _bconv_init(ks[3], 192, 192, 1, 7),
        "branch7x7x3_3": _bconv_init(ks[4], 192, 192, 7, 1),
        "branch7x7x3_4": _bconv_init(ks[5], 192, 192, 3, 3),
    }


def _incep_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x), stride=2)
    b7 = _bconv(p["branch7x7x3_1"], x)
    b7 = _bconv(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _bconv(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _incep_e_init(key, cin):
    ks = jax.random.split(key, 9)
    return {
        "branch1x1": _bconv_init(ks[0], cin, 320, 1, 1),
        "branch3x3_1": _bconv_init(ks[1], cin, 384, 1, 1),
        "branch3x3_2a": _bconv_init(ks[2], 384, 384, 1, 3),
        "branch3x3_2b": _bconv_init(ks[3], 384, 384, 3, 1),
        "branch3x3dbl_1": _bconv_init(ks[4], cin, 448, 1, 1),
        "branch3x3dbl_2": _bconv_init(ks[5], 448, 384, 3, 3),
        "branch3x3dbl_3a": _bconv_init(ks[6], 384, 384, 1, 3),
        "branch3x3dbl_3b": _bconv_init(ks[7], 384, 384, 3, 1),
        "branch_pool": _bconv_init(ks[8], cin, 192, 1, 1),
    }


def _incep_e(p, x, use_max_pool):
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _bconv(p["branch3x3_2a"], b3, pad=(0, 1)),
        _bconv(p["branch3x3_2b"], b3, pad=(1, 0)),
    ], axis=-1)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=(1, 1))
    bd = jnp.concatenate([
        _bconv(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
        _bconv(p["branch3x3dbl_3b"], bd, pad=(1, 0)),
    ], axis=-1)
    # FIDInceptionE_2 uses a MAX pool here (inception.py:299-304); E_1 the
    # count-excluding average pool
    bp = _max_pool(x, stride=1, pad=1) if use_max_pool \
        else _avg_pool3_exclude(x)
    bp = _bconv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ------------------------------------------------------------- full network


def init_fid_inception_params(key: jax.Array) -> Params:
    ks = jax.random.split(key, 24)
    return {
        "Conv2d_1a_3x3": _bconv_init(ks[0], 3, 32, 3, 3),
        "Conv2d_2a_3x3": _bconv_init(ks[1], 32, 32, 3, 3),
        "Conv2d_2b_3x3": _bconv_init(ks[2], 32, 64, 3, 3),
        "Conv2d_3b_1x1": _bconv_init(ks[3], 64, 80, 1, 1),
        "Conv2d_4a_3x3": _bconv_init(ks[4], 80, 192, 3, 3),
        "Mixed_5b": _incep_a_init(ks[5], 192, 32),
        "Mixed_5c": _incep_a_init(ks[6], 256, 64),
        "Mixed_5d": _incep_a_init(ks[7], 288, 64),
        "Mixed_6a": _incep_b_init(ks[8], 288),
        "Mixed_6b": _incep_c_init(ks[9], 768, 128),
        "Mixed_6c": _incep_c_init(ks[10], 768, 160),
        "Mixed_6d": _incep_c_init(ks[11], 768, 160),
        "Mixed_6e": _incep_c_init(ks[12], 768, 192),
        "Mixed_7a": _incep_d_init(ks[13], 768),
        "Mixed_7b": _incep_e_init(ks[14], 1280),
        "Mixed_7c": _incep_e_init(ks[15], 2048),
    }


def fid_inception_features(
    params: Params,
    x: jnp.ndarray,
    output_blocks: Sequence[int] = (3,),
    resize_input: bool = True,
    normalize_input: bool = True,
) -> List[jnp.ndarray]:
    """x [N, H, W, 3] in [0, 1] -> list of feature maps for the requested
    blocks (inception.py:124-152).  Block 3 is the [N, 1, 1, 2048] FID
    feature (flatten for activation_statistics)."""
    last = max(output_blocks)
    if resize_input:
        N, _, _, C = x.shape
        x = jax.image.resize(x, (N, 299, 299, C), "bilinear")
    if normalize_input:
        x = 2.0 * x - 1.0

    out = []
    x = _bconv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _bconv(params["Conv2d_2a_3x3"], x)
    x = _bconv(params["Conv2d_2b_3x3"], x, pad=(1, 1))
    x = _max_pool(x)
    if 0 in output_blocks:
        out.append(x)
    if last == 0:
        return out

    x = _bconv(params["Conv2d_3b_1x1"], x)
    x = _bconv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    if 1 in output_blocks:
        out.append(x)
    if last == 1:
        return out

    x = _incep_a(params["Mixed_5b"], x)
    x = _incep_a(params["Mixed_5c"], x)
    x = _incep_a(params["Mixed_5d"], x)
    x = _incep_b(params["Mixed_6a"], x)
    x = _incep_c(params["Mixed_6b"], x)
    x = _incep_c(params["Mixed_6c"], x)
    x = _incep_c(params["Mixed_6d"], x)
    x = _incep_c(params["Mixed_6e"], x)
    if 2 in output_blocks:
        out.append(x)
    if last == 2:
        return out

    x = _incep_d(params["Mixed_7a"], x)
    x = _incep_e(params["Mixed_7b"], x, use_max_pool=False)
    x = _incep_e(params["Mixed_7c"], x, use_max_pool=True)
    x = jnp.mean(x, axis=(1, 2), keepdims=True)     # adaptive avg pool (1,1)
    out.append(x)
    return out


def convert_fid_inception(sd: Dict[str, np.ndarray]) -> Params:
    """Map the pytorch-fid pt_inception-2015-12-05 checkpoint (torchvision
    key names: <block>.<branch>.conv.weight / .bn.{weight,bias,
    running_mean,running_var}) onto the init tree.  fc/AuxLogits weights
    are ignored (feature extraction only)."""
    def bconv(name):
        return {
            "kernel": jnp.asarray(np.transpose(
                sd[f"{name}.conv.weight"], (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(sd[f"{name}.bn.weight"]),
            "bn_offset": jnp.asarray(sd[f"{name}.bn.bias"]),
            "bn_mean": jnp.asarray(sd[f"{name}.bn.running_mean"]),
            "bn_var": jnp.asarray(sd[f"{name}.bn.running_var"]),
        }

    p: Params = {}
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        p[name] = bconv(name)
    for mixed in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                  "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                  "Mixed_7c"):
        sub = sorted({k.split(".")[1] for k in sd
                      if k.startswith(f"{mixed}.") and k.endswith(".conv.weight")})
        p[mixed] = {br: bconv(f"{mixed}.{br}") for br in sub}
    return p
