"""Real-ESRGAN second-order degradation synthesis
(basicsr/models/realesrgan_model.py:68-185, realesrnet_model.py; the
blur-kernel / noise generators live in basicsr's data package, absent
from the vendored snapshot — behaviors reconstructed from the model's
imports and the Real-ESRGAN paper's published recipe).

Split TPU-first: *kernel synthesis* (tiny 21x21 arrays, irregular
branching) runs on the host in numpy, like the reference's dataloader;
*image-sized math* (per-item blur, noise, JPEG, resizes) is jnp and jits
per shape.  The random resize draws continuous scales; target sizes are
rounded to a multiple of ``size_multiple`` (default 16) so a training
run touches a bounded set of compiled programs — the artifact statistics
are unchanged, the XLA program count stops growing.

Layout: NHWC float RGB in [0, 1].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import j1 as _bessel_j1

from ..image.matlab import interpolate, rgb_to_grayscale
from ..ops.jpeg import jpeg_roundtrip

# ------------------------------------------------------------ blur kernels


def _rotated_sigma_inv(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    sigma = rot @ np.diag([sig_x ** 2, sig_y ** 2]) @ rot.T
    return np.linalg.inv(sigma)


def _kernel_grid(kernel_size: int) -> np.ndarray:
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1)  # [k, k, 2]


def bivariate_kernel(kernel_size: int, sig_x: float, sig_y: float,
                     theta: float, beta: float = 1.0,
                     ktype: str = "gaussian") -> np.ndarray:
    """Anisotropic rotated blur kernel, sum-normalized.

    ktype: 'gaussian' exp(-q/2); 'generalized' exp(-(q/2)^beta);
    'plateau' 1/(q^beta + 1) — the three families Real-ESRGAN mixes.
    """
    grid = _kernel_grid(kernel_size)
    inv = _rotated_sigma_inv(sig_x, sig_y, theta)
    q = np.einsum("hwi,ij,hwj->hw", grid, inv, grid)
    if ktype == "gaussian":
        k = np.exp(-0.5 * q)
    elif ktype == "generalized":
        k = np.exp(-0.5 * q ** beta)
    elif ktype == "plateau":
        k = 1.0 / (q ** beta + 1.0)
    else:
        raise ValueError(f"unknown kernel type {ktype!r}")
    return (k / k.sum()).astype(np.float32)


def circular_lowpass_kernel(cutoff: float, kernel_size: int,
                            pad_to: int = 0) -> np.ndarray:
    """2D sinc filter (the ringing/overshoot synthesizer): radial
    cutoff*J1(cutoff*r)/(2*pi*r) windowed to kernel_size, sum-normalized,
    optionally zero-padded to pad_to."""
    assert kernel_size % 2 == 1
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx ** 2 + yy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * _bessel_j1(cutoff * r) / (2 * np.pi * r)
    k[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = \
        cutoff ** 2 / (4 * np.pi)
    k = k / k.sum()
    if pad_to > kernel_size:
        p = (pad_to - kernel_size) // 2
        k = np.pad(k, ((p, p), (p, p)))
    return k.astype(np.float32)


_KERNEL_LIST = ("iso", "aniso", "generalized_iso", "generalized_aniso",
                "plateau_iso", "plateau_aniso")


def random_mixed_kernel(
    rng: np.random.Generator,
    kernel_size: int,
    kernel_list: Sequence[str] = _KERNEL_LIST,
    kernel_prob: Sequence[float] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03),
    sigma_range: Tuple[float, float] = (0.2, 3.0),
    betag_range: Tuple[float, float] = (0.5, 4.0),
    betap_range: Tuple[float, float] = (1.0, 2.0),
    rotation_range: Tuple[float, float] = (-math.pi, math.pi),
) -> np.ndarray:
    """One kernel from the Real-ESRGAN mixture (iso/aniso x gaussian/
    generalized/plateau with the x4plus probabilities)."""
    ktype = rng.choice(list(kernel_list), p=np.asarray(kernel_prob))
    sig_x = rng.uniform(*sigma_range)
    if ktype.endswith("aniso"):
        sig_y = rng.uniform(*sigma_range)
        theta = rng.uniform(*rotation_range)
    else:
        sig_y, theta = sig_x, 0.0
    if ktype.startswith("generalized"):
        base, beta = "generalized", rng.uniform(*betag_range)
    elif ktype.startswith("plateau"):
        base, beta = "plateau", rng.uniform(*betap_range)
    else:
        base, beta = "gaussian", 1.0
    return bivariate_kernel(kernel_size, sig_x, sig_y, theta, beta, base)


# ------------------------------------------------------------ device ops


def filter2D(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D parity (img_process_util.py:7-31): per-batch-item
    odd-sized kernels, reflect padding.  img [B,H,W,C], kernel [B,k,k] or
    [k,k] (shared)."""
    b, h, w, c = img.shape
    shared = kernel.ndim == 2
    k = kernel.shape[-1]
    p = k // 2
    x = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    if shared:
        rhs = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # [k,k,1,C]
        return jax.lax.conv_general_dilated(
            x, rhs, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # per-item: fold batch into channels, depthwise conv
    x = jnp.moveaxis(x, 0, -2).reshape(1, h + 2 * p, w + 2 * p, b * c)
    rhs = jnp.repeat(kernel, c, axis=0)              # [B*C, k, k]
    rhs = jnp.moveaxis(rhs, 0, -1)[:, :, None, :]    # [k, k, 1, B*C]
    y = jax.lax.conv_general_dilated(
        x, rhs, (1, 1), "VALID", feature_group_count=b * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.moveaxis(y.reshape(h, w, b, c), 2, 0)


def _cv2_gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0) -> jnp.ndarray:
    """USM sharpening with soft mask (img_process_util.py:63-83):
    sharp = I + w*(I-B), blended where |I-B|*255 > threshold."""
    if radius % 2 == 0:
        radius += 1
    k1 = _cv2_gaussian_kernel1d(radius)
    kernel = jnp.asarray(np.outer(k1, k1))
    blur = filter2D(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2D(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


def add_gaussian_noise(key: jax.Array, img: jnp.ndarray,
                       sigma: jnp.ndarray,
                       gray_mask: jnp.ndarray) -> jnp.ndarray:
    """sigma [B] in 0..255 units; gray_mask [B] bool — gray items get one
    noise field shared across channels."""
    b, h, w, c = img.shape
    kc, kg = jax.random.split(key)
    s = (sigma / 255.0)[:, None, None, None]
    color = jax.random.normal(kc, img.shape) * s
    gray = jax.random.normal(kg, (b, h, w, 1)) * s
    noise = jnp.where(gray_mask[:, None, None, None], gray, color)
    return img + noise


def poisson_noise_vals(img: np.ndarray) -> np.ndarray:
    """Per-item vals = 2^ceil(log2(#unique 8-bit levels)) — the shot-noise
    scaling the reference derives from image content (host-side; the
    level count is data-dependent)."""
    out = []
    for item in img:
        levels = len(np.unique(np.round(np.clip(item, 0, 1) * 255.0)))
        out.append(2.0 ** math.ceil(math.log2(max(levels, 2))))
    return np.asarray(out, np.float32)


def add_poisson_noise(key: jax.Array, img: jnp.ndarray, scale: jnp.ndarray,
                      vals: jnp.ndarray,
                      gray_mask: jnp.ndarray) -> jnp.ndarray:
    """Shot noise: poisson(round(I)*vals)/vals - round(I), scaled by
    `scale` [B]; gray items compute it on luma."""
    kc, kg = jax.random.split(key)
    v = vals[:, None, None, None]

    def shot(k, x):
        xr = jnp.round(jnp.clip(x, 0, 1) * 255.0) / 255.0
        lam = xr * v
        return jax.random.poisson(k, lam).astype(x.dtype) / v - xr

    color = shot(kc, img)
    gray = shot(kg, rgb_to_grayscale(img))
    noise = jnp.where(gray_mask[:, None, None, None], gray, color)
    return img + noise * scale[:, None, None, None]


# ------------------------------------------------------------ the pipeline


@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    """Real-ESRGAN x4plus recipe (options/train_realesrgan_x4plus.yml
    values cited in the paper; model flow realesrgan_model.py:68-185)."""
    scale: int = 4
    gt_size: int = 256
    # kernel synthesis (dataset side)
    kernel_range: Tuple[int, ...] = tuple(range(7, 22, 2))
    kernel_prob: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    sinc_prob: float = 0.1
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)
    betap_range: Tuple[float, float] = (1.0, 2.0)
    sinc_prob2: float = 0.1
    blur_sigma2: Tuple[float, float] = (0.2, 1.5)
    final_sinc_prob: float = 0.8
    pad_to: int = 21
    # first degradation
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)  # up/down/keep
    resize_range: Tuple[float, float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1.0, 30.0)
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30.0, 95.0)
    # second degradation
    second_blur_prob: float = 0.8
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1.0, 25.0)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30.0, 95.0)
    # TPU compile-count bound: resize targets round to this multiple
    size_multiple: int = 16


def random_degradation_kernels(rng: np.random.Generator,
                               cfg: DegradationConfig,
                               batch: int) -> Dict[str, np.ndarray]:
    """Per-item kernel1/kernel2/sinc stacks [B, pad_to, pad_to] — the
    reference dataloader's per-sample draws."""
    def one(sinc_prob, sigma_range):
        ks = int(rng.choice(cfg.kernel_range))
        if rng.uniform() < sinc_prob:
            cutoff = rng.uniform(np.pi / 3 if ks < 13 else np.pi / 5, np.pi)
            return circular_lowpass_kernel(cutoff, ks, pad_to=cfg.pad_to)
        k = random_mixed_kernel(rng, ks, kernel_prob=cfg.kernel_prob,
                                sigma_range=sigma_range,
                                betag_range=cfg.betag_range,
                                betap_range=cfg.betap_range)
        p = (cfg.pad_to - ks) // 2
        return np.pad(k, ((p, p), (p, p)))

    def final_sinc():
        if rng.uniform() < cfg.final_sinc_prob:
            ks = int(rng.choice(cfg.kernel_range))
            cutoff = rng.uniform(np.pi / 3, np.pi)
            return circular_lowpass_kernel(cutoff, ks, pad_to=cfg.pad_to)
        pulse = np.zeros((cfg.pad_to, cfg.pad_to), np.float32)
        pulse[cfg.pad_to // 2, cfg.pad_to // 2] = 1.0
        return pulse

    return {
        "kernel1": np.stack([one(cfg.sinc_prob, cfg.blur_sigma)
                             for _ in range(batch)]),
        "kernel2": np.stack([one(cfg.sinc_prob2, cfg.blur_sigma2)
                             for _ in range(batch)]),
        "sinc_kernel": np.stack([final_sinc() for _ in range(batch)]),
    }


def _round_size(n: float, multiple: int) -> int:
    if multiple <= 1:
        return max(int(n), 1)
    return max(multiple, int(round(n / multiple)) * multiple)


def _random_resize(rng, img, prob, srange, target_hw, cfg):
    updown = rng.choice(["up", "down", "keep"], p=np.asarray(prob))
    if updown == "up":
        s = rng.uniform(1.0, srange[1])
    elif updown == "down":
        s = rng.uniform(srange[0], 1.0)
    else:
        s = 1.0
    mode = rng.choice(["area", "bilinear", "bicubic"])
    h = _round_size(target_hw[0] * s, cfg.size_multiple)
    w = _round_size(target_hw[1] * s, cfg.size_multiple)
    return interpolate(img, (h, w), mode)


def _random_noise(rng, key, img, gauss_prob, noise_range, poisson_range,
                  gray_prob):
    b = img.shape[0]
    gray = jnp.asarray(rng.uniform(size=b) < gray_prob)
    if rng.uniform() < gauss_prob:
        sigma = jnp.asarray(rng.uniform(*noise_range, size=b), jnp.float32)
        return jnp.clip(add_gaussian_noise(key, img, sigma, gray), 0, 1)
    scale = jnp.asarray(rng.uniform(*poisson_range, size=b), jnp.float32)
    vals = jnp.asarray(poisson_noise_vals(np.asarray(img)))
    return jnp.clip(add_poisson_noise(key, img, scale, vals, gray), 0, 1)


def synthesize_lq(rng: np.random.Generator, key: jax.Array,
                  gt: jnp.ndarray, cfg: DegradationConfig,
                  kernels: Optional[Dict[str, np.ndarray]] = None,
                  ) -> jnp.ndarray:
    """GT batch [B, H, W, 3] -> degraded LQ [B, H/scale, W/scale, 3].

    The two-stage chain (realesrgan_model.py:83-168): USM'd GT is blurred,
    randomly resized, noised, JPEG'd; then optionally re-blurred, resized
    toward 1/scale, re-noised, and finished with a random order of
    [resize-to-target + sinc] and JPEG; finally quantized to 8 bits.
    Stage-level choices (resize mode/scale, gaussian-vs-poisson, op order)
    are host RNG draws like the reference's; pixel noise uses the jax key.
    """
    if kernels is None:
        kernels = random_degradation_kernels(rng, cfg, gt.shape[0])
    k1 = jnp.asarray(kernels["kernel1"])
    k2 = jnp.asarray(kernels["kernel2"])
    sinc = jnp.asarray(kernels["sinc_kernel"])
    keys = jax.random.split(key, 4)
    ori_h, ori_w = gt.shape[1], gt.shape[2]

    gt_usm = usm_sharp(gt)
    # ---- first degradation
    out = filter2D(gt_usm, k1)
    out = _random_resize(rng, out, cfg.resize_prob, cfg.resize_range,
                         (ori_h, ori_w), cfg)
    out = _random_noise(rng, keys[0], out, cfg.gaussian_noise_prob,
                        cfg.noise_range, cfg.poisson_scale_range,
                        cfg.gray_noise_prob)
    q = jnp.asarray(rng.uniform(*cfg.jpeg_range, size=gt.shape[0]),
                    jnp.float32)
    out = jnp.clip(jpeg_roundtrip(jnp.clip(out, 0, 1), q), 0, 1)

    # ---- second degradation
    if rng.uniform() < cfg.second_blur_prob:
        out = filter2D(out, k2)
    out = _random_resize(rng, out, cfg.resize_prob2, cfg.resize_range2,
                         (ori_h / cfg.scale, ori_w / cfg.scale), cfg)
    out = _random_noise(rng, keys[1], out, cfg.gaussian_noise_prob2,
                        cfg.noise_range2, cfg.poisson_scale_range2,
                        cfg.gray_noise_prob2)

    target = (ori_h // cfg.scale, ori_w // cfg.scale)
    mode = rng.choice(["area", "bilinear", "bicubic"])
    q2 = jnp.asarray(rng.uniform(*cfg.jpeg_range2, size=gt.shape[0]),
                     jnp.float32)
    if rng.uniform() < 0.5:
        out = filter2D(interpolate(out, target, mode), sinc)
        out = jpeg_roundtrip(jnp.clip(out, 0, 1), q2)
    else:
        out = jpeg_roundtrip(jnp.clip(out, 0, 1), q2)
        out = filter2D(interpolate(out, target, mode), sinc)

    # 8-bit quantization (clamp + round, :168)
    return jnp.clip(jnp.round(jnp.clip(out, 0, 1) * 255.0), 0, 255) / 255.0


def paired_random_crop(rng: np.random.Generator, gt: jnp.ndarray,
                       lq: jnp.ndarray, gt_patch: int,
                       scale: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned random crop (data/transforms.py semantics): LQ patch of
    gt_patch/scale, GT patch at scale x the same origin."""
    lq_patch = gt_patch // scale
    top = int(rng.integers(0, lq.shape[1] - lq_patch + 1))
    left = int(rng.integers(0, lq.shape[2] - lq_patch + 1))
    lq_c = lq[:, top:top + lq_patch, left:left + lq_patch]
    gt_c = gt[:, top * scale:top * scale + gt_patch,
              left * scale:left * scale + gt_patch]
    return gt_c, lq_c


class PairPool:
    """The training-pair shuffle queue (realesrgan_model.py:32-66):
    decouples the per-batch degradation draw from the batch composition
    so one batch mixes degradation severities."""

    def __init__(self, queue_size: int = 180):
        self.queue_size = queue_size
        self._lq: Optional[np.ndarray] = None
        self._gt: Optional[np.ndarray] = None
        self._ptr = 0

    def exchange(self, rng: np.random.Generator, lq: np.ndarray,
                 gt: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        b = lq.shape[0]
        if self._lq is None:
            assert self.queue_size % b == 0, \
                f"queue size {self.queue_size} not divisible by batch {b}"
            self._lq = np.zeros((self.queue_size,) + lq.shape[1:], lq.dtype)
            self._gt = np.zeros((self.queue_size,) + gt.shape[1:], gt.dtype)
            self._ptr = 0
        if self._ptr == self.queue_size:
            idx = rng.permutation(self.queue_size)
            self._lq, self._gt = self._lq[idx], self._gt[idx]
            lq_out, gt_out = self._lq[:b].copy(), self._gt[:b].copy()
            self._lq[:b], self._gt[:b] = lq, gt
            return lq_out, gt_out
        self._lq[self._ptr:self._ptr + b] = lq
        self._gt[self._ptr:self._ptr + b] = gt
        self._ptr += b
        return lq, gt
