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


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Frechet distance between two gaussians — the FID statistic
    (BasicSR calculate_fid, TSD_SR/basicsr/metrics/fid.py); feature
    extraction is pluggable (activations -> mean/cov), this is the metric
    math: ||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrt(S1 S2))."""
    mu1 = np.atleast_1d(mu1).astype(np.float64)
    mu2 = np.atleast_1d(mu2).astype(np.float64)
    sigma1 = np.atleast_2d(sigma1).astype(np.float64)
    sigma2 = np.atleast_2d(sigma2).astype(np.float64)
    diff = mu1 - mu2

    # sqrtm(S1 @ S2) via eigendecomposition with a jitter retry (scipy-free)
    prod = sigma1 @ sigma2
    w, v = np.linalg.eig(prod)
    if not np.isfinite(w).all() or (w.real < -eps).any():
        offset = np.eye(sigma1.shape[0]) * eps
        w, v = np.linalg.eig((sigma1 + offset) @ (sigma2 + offset))
    covmean = (v * np.sqrt(np.maximum(w.real, 0.0) + 0j)) @ np.linalg.inv(v)
    tr_covmean = float(np.trace(covmean).real)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def activation_statistics(feats: np.ndarray):
    """[N, D] activations -> (mu, sigma) for ``frechet_distance``."""
    feats = np.asarray(feats, np.float64)
    return feats.mean(axis=0), np.cov(feats, rowvar=False)


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


def _to_y_channel(img: jnp.ndarray, bgr: bool) -> jnp.ndarray:
    """basicsr metric_util.to_y_channel: [0, 255] image -> [0, 255] Y
    (MATLAB convention; basicsr images are BGR from cv2)."""
    from ..image.matlab import bgr2ycbcr, rgb2ycbcr
    f = bgr2ycbcr if bgr else rgb2ycbcr
    return f(jnp.asarray(img, jnp.float32) / 255.0, y_only=True) * 255.0


def calculate_psnr(img: jnp.ndarray, img2: jnp.ndarray,
                   crop_border: int = 0, test_y_channel: bool = False,
                   bgr: bool = True) -> float:
    """BasicSR-convention PSNR (psnr_ssim.py:12-49): [0, 255]-range HWC
    arrays, optional border crop and MATLAB-Y-channel scoring."""
    img = jnp.asarray(img, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img = _to_y_channel(img, bgr)
        img2 = _to_y_channel(img2, bgr)
    mse = float(jnp.mean((img - img2) ** 2))
    if mse == 0.0:
        return float("inf")
    return float(psnr(img, img2, data_range=255.0))


def calculate_ssim(img: jnp.ndarray, img2: jnp.ndarray,
                   crop_border: int = 0, test_y_channel: bool = False,
                   bgr: bool = True) -> float:
    """BasicSR-convention SSIM (psnr_ssim.py:85-131): per-channel 11x11
    gaussian SSIM on the [0, 255] scale, channel-averaged."""
    img = jnp.asarray(img, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img = _to_y_channel(img, bgr)
        img2 = _to_y_channel(img2, bgr)
    return float(ssim(img, img2, data_range=255.0))
