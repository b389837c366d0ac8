"""MATLAB-parity resize + BT.601 YCbCr conversions, and torch-parity
``interpolate`` (basicsr/utils/matlab_functions.py, color_util.py;
torch F.interpolate semantics used by the Real-ESRGAN degradation
pipeline, basicsr/models/realesrgan_model.py:95,126).

Every resize here is a separable weighted gather: the (weights, indices)
matrices are computed once on the host per (in_len, out_len, mode) — the
shapes are static — and applied on device as two gather+tensordot
contractions, so a fixed-size resize jits cleanly and rides the MXU.

Conventions: images are [..., H, W, C] float in [0, 1] (the repo's NHWC
layout); `imresize` matches MATLAB bicubic (a=-0.5 kernel, antialiased
when downscaling, symmetric edge padding); `interpolate` matches torch
``F.interpolate(align_corners=False, antialias=False)`` for
bilinear/bicubic (a=-0.75, border-replicate) and ``area``
(adaptive average pooling).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ kernels


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic kernel; a=-0.5 is MATLAB/Catmull-Rom, a=-0.75 is torch."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax <= 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )


def _linear(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


# -------------------------------------------------- MATLAB imresize weights


@lru_cache(maxsize=256)
def _matlab_weights(in_len: int, out_len: int, scale: float,
                    antialiasing: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(weights [out,P], 0-based indices [out,P] into the *unpadded* axis,
    possibly out of range — the caller symmetric-pads).  Matches MATLAB's
    bicubic contribution table (matlab_functions.py:16-82 semantics)."""
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width /= scale
    # output pixel i (0-based) samples input coordinate u (0-based):
    u = (np.arange(out_len, dtype=np.float64) + 0.5) / scale - 0.5
    left = np.floor(u - kernel_width / 2).astype(np.int64)
    p = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale, -0.5)
    else:
        weights = _cubic(dist, -0.5)
    weights = weights / weights.sum(axis=1, keepdims=True)
    # drop an all-zero first/last column (MATLAB's trim)
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(float(zero_cols[0]), 0, rel_tol=1e-6):
        indices, weights = indices[:, 1:], weights[:, 1:]
    if not math.isclose(float(zero_cols[-1]), 0, rel_tol=1e-6):
        indices, weights = indices[:, :-1], weights[:, :-1]
    return weights.astype(np.float32), indices


def _apply_axis_symmetric(img: jnp.ndarray, weights: np.ndarray,
                          indices: np.ndarray, axis: int) -> jnp.ndarray:
    """Weighted gather along `axis` with symmetric (whole-sample mirror)
    edge handling."""
    n = img.shape[axis]
    pad_lo = max(0, int(-indices.min()))
    pad_hi = max(0, int(indices.max()) - (n - 1))
    if pad_lo or pad_hi:
        cfg = [(0, 0)] * img.ndim
        cfg[axis] = (pad_lo, pad_hi)
        img = jnp.pad(img, cfg, mode="symmetric")
    gathered = jnp.take(img, jnp.asarray(indices + pad_lo), axis=axis)
    # gathered has shape [..., out, P, ...] with (out, P) at `axis`
    w = jnp.asarray(weights)
    a = axis % img.ndim
    return jnp.einsum(
        gathered, [*range(a), img.ndim, img.ndim + 1,
                   *range(a + 1, img.ndim)],
        w, [img.ndim, img.ndim + 1],
        [*range(a), img.ndim, *range(a + 1, img.ndim)])


def imresize(img, scale: float, antialiasing: bool = True):
    """MATLAB-compatible bicubic resize of [..., H, W, C] in [0, 1]
    (matlab_functions.py:86-178: a=-0.5 kernel, antialiased downscale,
    symmetric padding, out = ceil(in*scale))."""
    arr = jnp.asarray(img, jnp.float32)
    h, w = arr.shape[-3], arr.shape[-2]
    out_h, out_w = math.ceil(h * scale), math.ceil(w * scale)
    wh, ih = _matlab_weights(h, out_h, scale, antialiasing)
    ww, iw = _matlab_weights(w, out_w, scale, antialiasing)
    arr = _apply_axis_symmetric(arr, wh, ih, arr.ndim - 3)
    arr = _apply_axis_symmetric(arr, ww, iw, arr.ndim - 2)
    if isinstance(img, np.ndarray):
        return np.asarray(arr)
    return arr


# ------------------------------------------------ torch-style interpolate


@lru_cache(maxsize=512)
def _torch_weights(in_len: int, out_len: int,
                   mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """(weights, clamped indices) for torch F.interpolate semantics:
    align_corners=False, antialias=False, border replicate via index
    clamping; 'area' = adaptive average pooling."""
    if mode == "area":
        p = int(math.ceil(in_len / out_len)) + 1
        starts = (np.arange(out_len) * in_len) // out_len
        ends = -(-(np.arange(1, out_len + 1) * in_len) // out_len)  # ceil
        indices = starts[:, None] + np.arange(p)[None, :]
        weights = ((indices < ends[:, None]).astype(np.float64)
                   / (ends - starts)[:, None])
        indices = np.minimum(indices, in_len - 1)
        return weights.astype(np.float32), indices
    scale = out_len / in_len
    u = (np.arange(out_len, dtype=np.float64) + 0.5) / scale - 0.5
    if mode == "bilinear":
        width, kern = 2.0, _linear
    elif mode == "bicubic":
        width, kern = 4.0, lambda x: _cubic(x, -0.75)
    else:
        raise ValueError(f"unknown interpolate mode {mode!r}")
    left = np.floor(u - width / 2).astype(np.int64) + 1
    p = int(width)
    indices = left[:, None] + np.arange(p)[None, :]
    weights = kern(u[:, None] - indices)
    s = weights.sum(axis=1, keepdims=True)
    weights = np.where(s > 0, weights / np.where(s == 0, 1, s), weights)
    indices = np.clip(indices, 0, in_len - 1)
    return weights.astype(np.float32), indices


def _apply_axis_clamped(img: jnp.ndarray, weights: np.ndarray,
                        indices: np.ndarray, axis: int) -> jnp.ndarray:
    gathered = jnp.take(img, jnp.asarray(indices), axis=axis)
    w = jnp.asarray(weights)
    a = axis % img.ndim
    return jnp.einsum(
        gathered, [*range(a), img.ndim, img.ndim + 1,
                   *range(a + 1, img.ndim)],
        w, [img.ndim, img.ndim + 1],
        [*range(a), img.ndim, *range(a + 1, img.ndim)])


def interpolate(img: jnp.ndarray, size: Tuple[int, int],
                mode: str = "bilinear") -> jnp.ndarray:
    """torch ``F.interpolate`` parity on [..., H, W, C]: modes 'area' /
    'bilinear' / 'bicubic' (align_corners=False, no antialias) — the
    resize family the Real-ESRGAN degradation draws from
    (realesrgan_model.py:94-95)."""
    arr = jnp.asarray(img, jnp.float32)
    h, w = arr.shape[-3], arr.shape[-2]
    wh, ih = _torch_weights(h, size[0], mode)
    ww, iw = _torch_weights(w, size[1], mode)
    arr = _apply_axis_clamped(arr, wh, ih, arr.ndim - 3)
    return _apply_axis_clamped(arr, ww, iw, arr.ndim - 2)


# ------------------------------------------------------- YCbCr conversions

# ITU-R BT.601 "studio swing" matrices (MATLAB rgb2ycbcr; color_util.py).
_RGB2YCBCR = np.array([[65.481, -37.797, 112.0],
                       [128.553, -74.203, -93.786],
                       [24.966, 112.0, -18.214]], np.float32)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], np.float32)


def rgb2ycbcr(img: jnp.ndarray, y_only: bool = False) -> jnp.ndarray:
    """float [0,1] RGB [..., 3] -> YCbCr in the *uint8 value range scaled
    to [0,1]* (i.e. MATLAB output / 255, matching basicsr's float path,
    color_util.py:29-36)."""
    img = jnp.asarray(img, jnp.float32)
    if y_only:
        out = img @ jnp.asarray(_RGB2YCBCR[:, 0]) + 16.0
        out = out[..., None]
    else:
        out = img @ jnp.asarray(_RGB2YCBCR) + jnp.asarray(_YCBCR_OFFSET)
    return out / 255.0


def bgr2ycbcr(img: jnp.ndarray, y_only: bool = False) -> jnp.ndarray:
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def ycbcr2rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb2ycbcr` (color_util.py:73-108)."""
    img = jnp.asarray(img, jnp.float32) * 255.0
    inv = np.linalg.inv(_RGB2YCBCR).astype(np.float32)
    return (img - jnp.asarray(_YCBCR_OFFSET)) @ jnp.asarray(inv)


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma (torchvision convention used for gray noise in the
    degradation pipeline): 0.299 R + 0.587 G + 0.114 B, kept as a
    1-channel [..., 1] image."""
    w = jnp.asarray(np.array([0.299, 0.587, 0.114], np.float32))
    return (jnp.asarray(img, jnp.float32) @ w)[..., None]
