"""Image quality metrics: PSNR and SSIM in jnp.

The reference scores SR output with a pyiqa battery
(/root/reference/TSD_SR/test/test_metrics.py:1-60) and BasicSR's
psnr_ssim (TSD_SR/basicsr/metrics/psnr_ssim.py); these are the core two,
used for golden-output comparison against the CUDA reference and for the
round-trip oracles."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] pair (standard 11x11 gaussian window,
    the skimage/BasicSR formulation)."""
    kernel = _gaussian_kernel()
    C = a.shape[-1]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[None].astype(jnp.float32), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )[0]

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = filt(a * a) - mu_aa
    sigma_bb = filt(b * b) - mu_bb
    sigma_ab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return s.mean()
