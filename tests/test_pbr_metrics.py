"""PBR shading ops (renderutils equivalents), Poisson ops, and metrics."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.ops.poisson import diffusion_inpaint, poisson_blend
from unitex_tpu.texture.pbr import (
    fresnel_schlick,
    frostbite_diffuse,
    lambda_ggx,
    lambert,
    masking_smith,
    ndf_ggx,
    pbr_bsdf,
    pbr_specular,
    prepare_shading_normal,
)
from unitex_tpu.utils.metrics import psnr, ssim


class TestBSDF:
    def test_fresnel_limits(self):
        f0 = jnp.asarray([[0.04]])
        # normal incidence -> f0; grazing -> f90
        np.testing.assert_allclose(
            float(fresnel_schlick(f0, 1.0, jnp.asarray([[1.0]]))[0, 0]), 0.04, atol=1e-3
        )
        assert float(fresnel_schlick(f0, 1.0, jnp.asarray([[0.0]]))[0, 0]) > 0.99

    def test_ndf_ggx_normalization(self):
        """∫ D(h) cosθ dω over the hemisphere ≈ 1."""
        alpha_sqr = 0.25
        n = 400
        theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
        d = np.asarray(ndf_ggx(alpha_sqr, jnp.asarray(np.cos(theta))))
        integral = (
            d * np.cos(theta) * np.sin(theta) * (np.pi / 2 / n) * 2 * np.pi
        ).sum()
        assert abs(integral - 1.0) < 0.05

    def test_smith_masking_range(self):
        g = masking_smith(0.25, jnp.asarray([[0.8]]), jnp.asarray([[0.9]]))
        assert 0.0 < float(g[0, 0]) <= 1.0
        # smooth surface -> no masking
        g_smooth = masking_smith(1e-6, jnp.asarray([[0.8]]), jnp.asarray([[0.9]]))
        np.testing.assert_allclose(float(g_smooth[0, 0]), 1.0, atol=1e-3)

    def test_lambert(self):
        nrm = jnp.asarray([[0.0, 0.0, 1.0]])
        wi = jnp.asarray([[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(float(lambert(nrm, wi)[0, 0]), 1 / np.pi, atol=1e-6)
        wi_back = jnp.asarray([[0.0, 0.0, -1.0]])
        assert float(lambert(nrm, wi_back)[0, 0]) == 0.0

    def test_pbr_specular_energy(self):
        """Specular lobe peaks at the mirror direction."""
        nrm = jnp.asarray([[0.0, 0.0, 1.0]])
        col = jnp.asarray([[1.0, 1.0, 1.0]])
        wo = jnp.asarray([[0.0, 0.6, 0.8]])
        wi_mirror = jnp.asarray([[0.0, -0.6, 0.8]])
        wi_off = jnp.asarray([[0.6, 0.0, 0.8]])
        s_mirror = float(pbr_specular(col, nrm, wo, wi_mirror, 0.04).mean())
        s_off = float(pbr_specular(col, nrm, wo, wi_off, 0.04).mean())
        assert s_mirror > s_off * 3

    def test_pbr_bsdf_runs(self):
        rng = np.random.default_rng(0)
        n = 16
        kd = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        arm = jnp.asarray(rng.uniform(0.1, 1, (n, 3)).astype(np.float32))
        pos = jnp.zeros((n, 3))
        nrm = jnp.asarray([[0.0, 0.0, 1.0]]).repeat(n, axis=0)
        view = jnp.asarray([[0.0, 0.0, 2.0]]).repeat(n, axis=0)
        light = jnp.asarray([[1.0, 1.0, 2.0]]).repeat(n, axis=0)
        out = pbr_bsdf(kd, arm, pos, nrm, view, light)
        assert out.shape == (n, 3)
        assert (np.asarray(out) >= 0).all()

    def test_shading_normal_two_sided(self):
        pos = jnp.zeros((1, 3))
        view = jnp.asarray([[0.0, 0.0, -1.0]])  # viewer behind the face
        pert = jnp.asarray([[0.0, 0.0, 1.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        t = jnp.asarray([[1.0, 0.0, 0.0]])
        out = prepare_shading_normal(pos, view, pert, n, t, n, two_sided_shading=True)
        np.testing.assert_allclose(np.asarray(out), [[0, 0, -1.0]], atol=1e-5)


class TestPoisson:
    def test_blend_preserves_gradients(self):
        """Cloning a constant-gradient src into a flat dst keeps the dst
        boundary values while adopting src's (zero) interior Laplacian."""
        H = W = 32
        dst = jnp.ones((H, W, 1)) * 0.8
        src = jnp.zeros((H, W, 1))
        mask = np.zeros((H, W, 1), bool)
        mask[8:24, 8:24] = True
        out = poisson_blend(src, dst, jnp.asarray(mask), n_iters=500)
        o = np.asarray(out)[..., 0]
        # outside mask: dst
        assert abs(o[0, 0] - 0.8) < 1e-6
        # inside: harmonic with boundary 0.8 and flat guidance -> ~0.8
        assert abs(o[16, 16] - 0.8) < 0.01

    def test_blend_moves_src_detail(self):
        """High-frequency src detail survives the blend (gradient transfer)."""
        H = W = 32
        rng = np.random.default_rng(0)
        detail = rng.uniform(-0.1, 0.1, (H, W, 1)).astype(np.float32)
        src = jnp.asarray(0.2 + detail)
        dst = jnp.full((H, W, 1), 0.7)
        mask = np.zeros((H, W, 1), bool)
        mask[4:28, 4:28] = True
        out = poisson_blend(src, dst, jnp.asarray(mask), n_iters=500)
        o = np.asarray(out)[..., 0]
        inner = o[10:22, 10:22]
        # detail variance preserved, mean shifted toward dst
        assert inner.std() > 0.02
        assert inner.mean() > 0.5

    def test_inpaint_fills_hole(self):
        H = W = 32
        img = np.full((H, W, 1), 0.25, np.float32)
        img[:, 16:] = 0.75
        hole = np.zeros((H, W, 1), bool)
        hole[12:20, 12:20] = True
        out = diffusion_inpaint(jnp.asarray(img), jnp.asarray(hole), n_iters=300)
        o = np.asarray(out)[..., 0]
        # hole straddles the step edge: filled values interpolate smoothly
        assert 0.2 < o[16, 14] < 0.6
        assert 0.4 < o[16, 19] < 0.8
        # valid pixels untouched
        assert o[0, 0] == 0.25 and o[0, -1] == 0.75


class TestMetrics:
    def test_psnr_identity_and_noise(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        assert float(psnr(img, img)) > 100
        noisy = img + 0.1
        np.testing.assert_allclose(float(psnr(img, noisy)), 20.0, atol=0.1)

    def test_ssim_identity(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-4)
        assert float(ssim(img, 1.0 - img)) < 0.2

    def test_ssim_matches_skimage_if_available(self):
        skimage = pytest.importorskip("skimage")
        from skimage.metrics import structural_similarity

        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = structural_similarity(
            a, b, channel_axis=2, data_range=1.0,
            gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
        )
        assert abs(ours - ref) < 0.02


class TestFrechet:
    def test_identical_gaussians_zero(self):
        from unitex_tpu.utils.metrics import activation_statistics, frechet_distance

        rng = np.random.default_rng(4)
        feats = rng.normal(size=(500, 16))
        mu, sigma = activation_statistics(feats)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_equals_squared_distance(self):
        from unitex_tpu.utils.metrics import frechet_distance

        # equal covariances: FID reduces to ||mu1 - mu2||^2
        sigma = np.eye(8) * 0.5
        mu1 = np.zeros(8)
        mu2 = np.full(8, 0.3)
        got = frechet_distance(mu1, sigma, mu2, sigma)
        np.testing.assert_allclose(got, 8 * 0.3**2, rtol=1e-8)

    def test_diagonal_closed_form(self):
        from unitex_tpu.utils.metrics import frechet_distance

        # diagonal covariances: tr(S1+S2-2 sqrt(S1 S2)) = sum (sqrt(a)-sqrt(b))^2
        a = np.array([1.0, 4.0, 9.0])
        b = np.array([4.0, 1.0, 1.0])
        got = frechet_distance(np.zeros(3), np.diag(a), np.zeros(3), np.diag(b))
        want = ((np.sqrt(a) - np.sqrt(b)) ** 2).sum()
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_sample_statistics_separate_distributions(self):
        from unitex_tpu.utils.metrics import activation_statistics, frechet_distance

        rng = np.random.default_rng(5)
        x = rng.normal(size=(2000, 8))
        near = rng.normal(size=(2000, 8))
        far = rng.normal(loc=2.0, scale=3.0, size=(2000, 8))
        d_near = frechet_distance(*activation_statistics(x), *activation_statistics(near))
        d_far = frechet_distance(*activation_statistics(x), *activation_statistics(far))
        assert d_far > 10 * max(d_near, 1e-3)


def test_soft_blend():
    from unitex_tpu.ops.poisson import soft_blend

    src = jnp.ones((32, 32, 3))
    dst = jnp.zeros((32, 32, 3))
    mask = np.zeros((32, 32, 1), bool)
    mask[8:24, 8:24] = True
    out = np.asarray(soft_blend(src, dst, jnp.asarray(mask), feather=3))
    assert out[16, 16, 0] > 0.95      # deep inside: src
    assert out[0, 0, 0] < 0.05        # far outside: dst
    edge = out[8, 16, 0]
    assert 0.1 < edge < 0.9           # feathered boundary


def test_postprocess_inverse_of_preprocess():
    from PIL import Image as PILImage
    from unitex_tpu.image.process_image import (
        get_alpha_bbox,
        postprocess_reference_image,
        preprocess_reference_image,
    )

    rng = np.random.default_rng(0)
    orig = np.zeros((100, 120, 4), np.uint8)
    orig[30:70, 40:90, :3] = rng.integers(50, 255, (40, 50, 3))
    orig[30:70, 40:90, 3] = 255
    img = PILImage.fromarray(orig)
    pre = preprocess_reference_image(img, H=128, W=128, scale=0.9)
    bbox = get_alpha_bbox(np.asarray(img.getchannel("A")))
    back = postprocess_reference_image(pre.convert("RGB"), (120, 100), bbox, scale=0.9)
    assert back.size == (120, 100)
    # subject region survives the roundtrip approximately
    a = np.asarray(back)[30:70, 40:90].astype(int)
    b = orig[30:70, 40:90, :3].astype(int)
    assert np.abs(a - b).mean() < 30


class TestBasicSRConventionMetrics:
    """calculate_psnr/_ssim against the reference formulas reimplemented
    in numpy (psnr_ssim.py:12-49, 85-131 semantics)."""

    def test_psnr_y_channel_and_crop(self):
        from unitex_tpu.utils.metrics import calculate_psnr
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 255, size=(24, 24, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255).astype(np.float32)

        def y(img):  # BGR -> MATLAB Y on [0,255]
            r, g, bl = img[..., 2], img[..., 1], img[..., 0]
            return (65.481 * r + 128.553 * g + 24.966 * bl) / 255.0 + 16.0

        ac, bc = a[4:-4, 4:-4], b[4:-4, 4:-4]
        mse = np.mean((y(ac).astype(np.float64) - y(bc).astype(np.float64)) ** 2)
        expect = 10 * np.log10(255 ** 2 / mse)
        got = calculate_psnr(a, b, crop_border=4, test_y_channel=True)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_ssim_identical_is_one(self):
        from unitex_tpu.utils.metrics import calculate_ssim
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 255, size=(32, 32, 3)).astype(np.float32)
        assert abs(calculate_ssim(a, a) - 1.0) < 1e-5
        noisy = np.clip(a + rng.normal(0, 25, a.shape), 0, 255)
        s = calculate_ssim(a, noisy.astype(np.float32))
        assert 0.0 < s < 0.95
