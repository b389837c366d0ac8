"""NIQE — Natural Image Quality Evaluator (no-reference IQA).

The reference's SR evaluation battery includes NIQE via pyiqa/BasicSR
(/root/reference/TSD_SR/test/test_metrics.py:18-28,
TSD_SR/basicsr/metrics/niqe.py). This is a from-scratch implementation of
the algorithm (Mittal et al., "Making a 'Completely Blind' Image Quality
Analyzer", IEEE SPL 2013):

1. MSCN coefficients: local gaussian mean/std normalization.
2. Per 96x96 block (48x48 at half scale), 18 features: AGGD fit of the
   MSCN field (shape + mean spread) and of its 4 directional pairwise
   products (H, V, D1, D2).
3. Quality = Mahalanobis-style distance between the multivariate-gaussian
   fit of the image's block features and a *pristine* MVG model.

BasicSR ships fitted pristine parameters (niqe_pris_params.npz, 125
pristine images) which we do not copy; `fit_pristine_params` fits the
same-format model from any directory of clean images (with the original
paper's sharpness-based patch selection), and `niqe` accepts either that
or a loaded npz dict with keys mu_pris_param / cov_pris_param.

Host-side metric: numpy throughout (runs on eval images, not in jit).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import numpy as np

# moment-matching lookup grid shared by GGD/AGGD estimators
_GAM = np.arange(0.2, 10.001, 0.001)
_GAM_R = np.asarray([math.gamma(2.0 / g) ** 2 / (math.gamma(1.0 / g) * math.gamma(3.0 / g)) for g in _GAM])


def estimate_aggd_param(block: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric generalized gaussian fit -> (alpha, beta_left, beta_right)
    by the moment-matching estimator of Lasmar et al. 2009."""
    block = block.ravel().astype(np.float64)
    left = block[block < 0]
    right = block[block > 0]
    left_std = math.sqrt(np.mean(left**2)) if left.size else 0.0
    right_std = math.sqrt(np.mean(right**2)) if right.size else 0.0
    if left_std == 0.0 or right_std == 0.0:
        # degenerate (e.g. constant block): fall back to gaussian shape
        return 2.0, left_std, right_std
    gammahat = left_std / right_std
    rhat = np.mean(np.abs(block)) ** 2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / ((gammahat**2 + 1) ** 2)
    alpha = float(_GAM[np.argmin((_GAM_R - rhatnorm) ** 2)])
    g1 = math.gamma(1.0 / alpha)
    g3 = math.gamma(3.0 / alpha)
    beta_l = left_std * math.sqrt(g1 / g3)
    beta_r = right_std * math.sqrt(g1 / g3)
    return alpha, beta_l, beta_r


def _block_features(block: np.ndarray) -> np.ndarray:
    """18 NSS features of one MSCN block (AGGD of field + 4 products)."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2.0])
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        product = block * np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(product)
        mean = (beta_r - beta_l) * (math.gamma(2.0 / alpha) / math.gamma(1.0 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return np.asarray(feat, np.float64)


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2_same(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    kh, kw = kernel.shape
    pad = ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2))
    padded = np.pad(img, pad, mode="reflect")
    # small fixed 7x7 kernel: direct sliding-window einsum
    windows = np.lib.stride_tricks.sliding_window_view(padded, kernel.shape)
    return np.einsum("ijkl,kl->ij", windows, kernel)


def mscn(img: np.ndarray) -> np.ndarray:
    """Mean-subtracted contrast-normalized coefficients of a gray image."""
    w = _gaussian_window()
    mu = _filter2_same(img, w)
    sigma = np.sqrt(np.abs(_filter2_same(img * img, w) - mu * mu))
    return (img - mu) / (sigma + 1.0)


def _to_gray(img: np.ndarray) -> np.ndarray:
    """[H,W] | [H,W,1] | [H,W,3] in [0,1] or [0,255] -> gray float64 [0,255]."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        if img.shape[-1] == 3:
            # BT.601, the BasicSR to_y_channel-adjacent gray convention
            img = img @ np.asarray([0.299, 0.587, 0.114])
        else:
            img = img[..., 0]
    if img.max() <= 1.0 + 1e-6:
        img = img * 255.0
    return img


def _half(img: np.ndarray) -> np.ndarray:
    """2x2 box downsample (antialiased halving for the second scale)."""
    h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
    img = img[:h, :w]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2])


def image_features(
    img: np.ndarray, block_size: int = 96, sharpness_fraction: float = 0.0
) -> np.ndarray:
    """[n_blocks, 36] NSS feature matrix over two scales.

    sharpness_fraction > 0 keeps only blocks whose local-std sum exceeds
    that fraction of the per-image peak (the pristine-training patch
    selection of the original paper); 0 keeps all blocks (scoring mode).
    """
    gray = _to_gray(img)
    h, w = gray.shape
    nbh, nbw = h // block_size, w // block_size
    if nbh == 0 or nbw == 0:
        raise ValueError(f"image {gray.shape} smaller than one {block_size}px block")
    gray = gray[: nbh * block_size, : nbw * block_size]

    scale_feats = []
    keep = None
    img_s = gray
    for scale in (1, 2):
        bs = block_size // scale
        field = mscn(img_s)
        feats = []
        sharp = []
        for by in range(nbh):
            for bx in range(nbw):
                block = field[by * bs : (by + 1) * bs, bx * bs : (bx + 1) * bs]
                feats.append(_block_features(block))
                if scale == 1 and sharpness_fraction > 0:
                    raw = img_s[by * bs : (by + 1) * bs, bx * bs : (bx + 1) * bs]
                    sharp.append(float(np.std(raw)))
        feats = np.stack(feats)
        if scale == 1 and sharpness_fraction > 0:
            sharp = np.asarray(sharp)
            keep = sharp > sharpness_fraction * sharp.max()
            if keep.sum() < 2:  # keep at least a couple of blocks
                keep = np.ones_like(keep, bool)
        if keep is not None:
            feats = feats[keep]
        scale_feats.append(feats)
        img_s = _half(img_s)
    return np.concatenate(scale_feats, axis=1)  # [n_blocks, 36]


def fit_pristine_params(
    images: Sequence[np.ndarray],
    block_size: int = 96,
    sharpness_fraction: float = 0.75,
) -> Dict[str, np.ndarray]:
    """Fit the pristine MVG model from clean images (the role of BasicSR's
    niqe_pris_params.npz). Returns {mu_pris_param [1,36], cov_pris_param
    [36,36]} — same keys/shapes as the npz, interchangeable with it."""
    feats = np.concatenate(
        [image_features(im, block_size, sharpness_fraction) for im in images], axis=0)
    mu = np.nanmean(feats, axis=0, keepdims=True)
    cov = np.cov(feats[~np.isnan(feats).any(1)].T)
    return {"mu_pris_param": mu, "cov_pris_param": cov}


def niqe(
    img: np.ndarray,
    pristine: Dict[str, np.ndarray],
    block_size: int = 96,
) -> float:
    """NIQE score (lower = more natural). pristine: fit_pristine_params
    output or a loaded BasicSR niqe_pris_params.npz."""
    mu_pris = np.asarray(pristine["mu_pris_param"], np.float64).reshape(1, -1)
    cov_pris = np.asarray(pristine["cov_pris_param"], np.float64)
    feats = image_features(img, block_size, sharpness_fraction=0.0)
    feats = feats[~np.isnan(feats).any(axis=1)]
    mu_dist = feats.mean(axis=0, keepdims=True)
    cov_dist = np.cov(feats.T)
    diff = mu_pris - mu_dist
    inv = np.linalg.pinv((cov_pris + cov_dist) / 2.0)
    return float(np.sqrt(max(float((diff @ inv @ diff.T).item()), 0.0)))
