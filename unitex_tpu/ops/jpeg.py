"""Differentiable JPEG round-trip (basicsr/utils/diffjpeg.py) for the
Real-ESRGAN degradation synthesis.

JPEG's compression loss is fully expressible as dense tensor math on
TPU: full-swing YCbCr transform, 2x2 chroma average-pool subsampling,
8x8 block DCT as two small matmuls (MXU), division by quality-scaled
quantization tables, (soft-)rounding, and the inverse chain.  The whole
codec jits into one fused program; quality is a per-batch-item traced
value so one compile serves the random quality draws.

Layout: NHWC float RGB in [0, 1]; H and W are padded to multiples of 16
internally (diffjpeg.py DiffJPEG.forward does the same) and cropped on
return.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Standard Annex-K luminance / chrominance quantization tables.
_Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_C_TABLE = np.full((8, 8), 99.0, np.float32)
_C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                             [24, 26, 56, 99], [47, 66, 99, 99]],
                            np.float32)

# JPEG (full-swing) color transform on 0..255 values.
_RGB2YCC = np.array([[0.299, -0.168736, 0.5],
                     [0.587, -0.331264, -0.418688],
                     [0.114, 0.5, -0.081312]], np.float32)
_YCC2RGB = np.array([[1.0, 1.0, 1.0],
                     [0.0, -0.344136, 1.772],
                     [1.402, -0.714136, 0.0]], np.float32)


def _dct_matrix() -> np.ndarray:
    """D such that F = D f D^T is the JPEG 8x8 DCT-II (orthonormal)."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


_DCT = _dct_matrix()


def quality_to_factor(quality):
    """Scalar JPEG quality (1..100) -> quant-table scale
    (diffjpeg.py:32-45)."""
    quality = jnp.asarray(quality, jnp.float32)
    q = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0)
    return q / 100.0


def diff_round(x: jnp.ndarray) -> jnp.ndarray:
    """Soft rounding with non-zero gradient (diffjpeg.py:26-29)."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] -> [N, H/8 * W/8, 8, 8]."""
    n, h, w = plane.shape
    b = plane.reshape(n, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return b.reshape(n, -1, 8, 8)


def _unblocks(b: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    n = b.shape[0]
    b = b.reshape(n, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return b.reshape(n, h, w)


def _quantize(blocks, table, factor, rounding):
    scaled = jnp.asarray(table) * factor[:, None, None, None]
    return rounding(blocks / scaled) * scaled  # quantize + dequantize


def jpeg_roundtrip(img: jnp.ndarray, quality,
                   differentiable: bool = False) -> jnp.ndarray:
    """Simulate JPEG compression artifacts.

    img: [N, H, W, 3] RGB in [0, 1]; quality: scalar or [N] in (0, 100].
    Returns the decompressed image, same shape, float in [0, 1]
    (values may slightly exceed the range, as in the reference — the
    degradation pipeline clamps).
    """
    n, h, w, _ = img.shape
    ph, pw = (-h) % 16, (-w) % 16
    x = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    hh, ww = h + ph, w + pw

    factor = quality_to_factor(quality) * jnp.ones((n,), jnp.float32)
    rounding = diff_round if differentiable else jnp.round

    ycc = (x * 255.0) @ jnp.asarray(_RGB2YCC) \
        + jnp.asarray(np.array([0.0, 128.0, 128.0], np.float32))
    y = ycc[..., 0]
    # 2x2 chroma subsample (average), matching avg_pool2d
    cbcr = ycc[..., 1:].reshape(n, hh // 2, 2, ww // 2, 2, 2).mean((2, 4))
    cb, cr = cbcr[..., 0], cbcr[..., 1]

    d, dt = jnp.asarray(_DCT), jnp.asarray(_DCT.T)

    def codec(plane, table):
        f = d @ _blocks(plane - 128.0) @ dt
        f = _quantize(f, table, factor, rounding)
        return _unblocks(dt @ f @ d, plane.shape[1], plane.shape[2]) + 128.0

    y = codec(y, _Y_TABLE)
    cb = codec(cb, _C_TABLE)
    cr = codec(cr, _C_TABLE)

    # nearest (repeat) chroma upsampling
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=1), 2, axis=2)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=1), 2, axis=2)
    ycc = jnp.stack([y, cb - 128.0, cr - 128.0], axis=-1)
    rgb = ycc @ jnp.asarray(_YCC2RGB)
    return (rgb / 255.0)[:, :h, :w, :]
