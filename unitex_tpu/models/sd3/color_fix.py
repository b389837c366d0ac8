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
    """3x3 binomial kernel with dilation ``radius`` (à-trous wavelet).

    Implemented as the 9 shifted adds of the separable [.25,.5,.25]²
    stencil in [C, H, W] layout: a TPU conv over [H, W, C=3] NHWC pads
    the 3-channel lane axis to the 128-lane tile (~2 GB of temps per op
    at 2048² — measured as the --sr co-residency OOM, same class as the
    [H, W, 1] reduce_window fact in CLAUDE.md); with H, W as the tiled
    trailing dims nothing pads and XLA fuses the stencil into one kernel.
    """
    x = jnp.transpose(image, (2, 0, 1))
    C, H, W = x.shape
    p = radius
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    w1 = (0.25, 0.5, 0.25)
    out = jnp.zeros_like(x)
    for iy, wy in enumerate(w1):
        for ix, wx in enumerate(w1):
            out = out + (wy * wx) * jax.lax.dynamic_slice(
                xp, (0, iy * radius, ix * radius), (C, H, W))
    return jnp.transpose(out, (1, 2, 0))


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
