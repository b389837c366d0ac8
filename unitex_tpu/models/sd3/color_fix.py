"""Color alignment for SR outputs: adain + wavelet reconstruction
(/root/reference/TSD_SR/utils/wavelet_color_fix.py:14-116): keep the
generated high-frequency detail, transplant the low-frequency color from
the bicubic-upscaled source."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def adain_color_fix(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Per-channel mean/std transfer: target [H, W, C] gets source stats."""
    t_mean = target.mean(axis=(0, 1), keepdims=True)
    t_std = target.std(axis=(0, 1), keepdims=True) + 1e-5
    s_mean = source.mean(axis=(0, 1), keepdims=True)
    s_std = source.std(axis=(0, 1), keepdims=True) + 1e-5
    return (target - t_mean) / t_std * s_std + s_mean


def _wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """3x3 binomial kernel with dilation ``radius`` (à-trous wavelet)."""
    kernel = np.asarray(
        [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]],
        np.float32,
    )
    C = image.shape[-1]
    k = jnp.tile(jnp.asarray(kernel).reshape(3, 3, 1, 1), (1, 1, 1, C))
    pad = radius
    x = jnp.pad(image[None], ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out[0]


def wavelet_decomposition(image: jnp.ndarray, levels: int = 5):
    """-> (high_freq, low_freq) à-trous decomposition."""
    high = jnp.zeros_like(image)
    low = image
    for i in range(levels):
        radius = 2**i
        blurred = _wavelet_blur(low, radius)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_color_fix(target: jnp.ndarray, source: jnp.ndarray, levels: int = 5):
    """target's high frequencies + source's low frequencies."""
    t_high, _ = wavelet_decomposition(target, levels)
    _, s_low = wavelet_decomposition(source, levels)
    return t_high + s_low
