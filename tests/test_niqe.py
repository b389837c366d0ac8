"""NIQE no-reference metric (the pyiqa/BasicSR NIQE capability)."""

import math

import numpy as np
import pytest

from unitex_tpu.utils.niqe import (
    estimate_aggd_param,
    fit_pristine_params,
    image_features,
    mscn,
    niqe,
)


def _natural_like(rng, size=192):
    """Synthetic 'natural' image: 1/f-ish spectrum via cumulative blur of
    white noise, normalized to [0, 1]."""
    img = rng.normal(size=(size, size))
    # heavy low-pass in fourier domain -> natural-scene-like correlations
    f = np.fft.fft2(img)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    radius = np.sqrt(fy**2 + fx**2)
    f *= 1.0 / (radius + 1.0 / size)
    img = np.real(np.fft.ifft2(f))
    img = (img - img.min()) / (img.max() - img.min())
    return img


class TestAGGD:
    def test_gaussian_recovers_alpha_2(self):
        rng = np.random.default_rng(0)
        x = rng.normal(scale=1.0, size=200_000)
        alpha, bl, br = estimate_aggd_param(x)
        assert alpha == pytest.approx(2.0, abs=0.1)
        # for a symmetric gaussian, beta_l ~= beta_r ~= sigma * sqrt(G(1/2)/G(3/2))
        expect = math.sqrt(math.gamma(0.5) / math.gamma(1.5))
        assert bl == pytest.approx(expect, rel=0.05)
        assert br == pytest.approx(expect, rel=0.05)

    def test_laplacian_alpha_1(self):
        rng = np.random.default_rng(1)
        x = rng.laplace(size=200_000)
        alpha, _, _ = estimate_aggd_param(x)
        assert alpha == pytest.approx(1.0, abs=0.1)

    def test_asymmetry_detected(self):
        rng = np.random.default_rng(2)
        x = np.where(rng.uniform(size=100_000) < 0.5,
                     -np.abs(rng.normal(scale=0.5, size=100_000)),
                     np.abs(rng.normal(scale=2.0, size=100_000)))
        _, bl, br = estimate_aggd_param(x)
        assert br > 2 * bl

    def test_constant_block_degenerate(self):
        alpha, bl, br = estimate_aggd_param(np.zeros(100))
        assert alpha == 2.0 and bl == 0.0 and br == 0.0


class TestMSCN:
    def test_whitens(self):
        rng = np.random.default_rng(3)
        img = _natural_like(rng) * 255.0
        field = mscn(img)
        # MSCN of a natural image is approximately zero-mean unit-ish spread
        assert abs(field.mean()) < 0.05
        assert 0.1 < field.std() < 1.5

    def test_feature_shape(self):
        rng = np.random.default_rng(4)
        feats = image_features(_natural_like(rng, 192))
        assert feats.shape == (4, 36)
        assert np.isfinite(feats).all()

    def test_too_small_raises(self):
        with pytest.raises(ValueError):
            image_features(np.zeros((64, 64)))


class TestNIQE:
    @pytest.fixture(scope="class")
    def pristine(self):
        rng = np.random.default_rng(5)
        return fit_pristine_params([_natural_like(rng, 288) for _ in range(10)])

    def test_pristine_param_shapes(self, pristine):
        assert pristine["mu_pris_param"].shape == (1, 36)
        assert pristine["cov_pris_param"].shape == (36, 36)
        assert np.isfinite(pristine["mu_pris_param"]).all()

    def test_distortion_increases_score(self, pristine):
        rng = np.random.default_rng(6)
        clean = _natural_like(rng, 288)
        noisy = np.clip(clean + rng.normal(scale=0.25, size=clean.shape), 0, 1)
        s_clean = niqe(clean, pristine)
        s_noisy = niqe(noisy, pristine)
        assert np.isfinite(s_clean) and np.isfinite(s_noisy)
        assert s_noisy > s_clean

    def test_blur_increases_score(self, pristine):
        rng = np.random.default_rng(7)
        clean = _natural_like(rng, 288)
        # severe 2x2 box blur chain kills the NSS statistics
        blurred = clean.copy()
        for _ in range(6):
            blurred = 0.25 * (np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0)
                              + np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1))
        assert niqe(blurred, pristine) > niqe(clean, pristine)

    def test_rgb_and_255_range_accepted(self, pristine):
        rng = np.random.default_rng(8)
        gray = _natural_like(rng, 96 * 2)
        rgb255 = np.stack([gray, gray, gray], -1) * 255.0
        assert np.isfinite(niqe(rgb255, pristine))
