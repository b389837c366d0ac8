"""Real-ESRGAN degradation synthesis stack: MATLAB imresize / torch
interpolate parity, YCbCr conversions, JPEG codec, blur kernels, noise,
the two-stage pipeline, and the RealESRGAN/RealESRNet train steps."""

import importlib.util
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.image import matlab as ml
from unitex_tpu.ops.jpeg import jpeg_roundtrip, quality_to_factor
from unitex_tpu.training import degradations as dg
from unitex_tpu.training import realesrgan as reg

rng = np.random.default_rng(0)


class TestMatlabImresize:
    def test_identity_scale(self):
        x = rng.random((9, 7, 3)).astype(np.float32)
        np.testing.assert_allclose(ml.imresize(x, 1.0), x, atol=1e-5)

    def test_constant_preserved(self):
        x = np.full((16, 16, 1), 0.37, np.float32)
        for s in (0.25, 0.5, 1.7):
            out = ml.imresize(x, s)
            assert out.shape[0] == math.ceil(16 * s)
            np.testing.assert_allclose(out, 0.37, atol=1e-5)

    def test_linear_ramp_upscale(self):
        """Cubic interpolation reproduces affine signals exactly away from
        borders."""
        x = np.arange(16, dtype=np.float32)[:, None, None] * np.ones((1, 4, 1))
        out = np.asarray(ml.imresize(x, 2.0))
        expect = (np.arange(32) + 0.5) / 2.0 - 0.5
        np.testing.assert_allclose(out[4:-4, 0, 0], expect[4:-4], atol=1e-4)

    def test_mirror_symmetry(self):
        x = rng.random((12, 12, 1)).astype(np.float32)
        sym = np.concatenate([x, x[::-1]], axis=0)
        out = np.asarray(ml.imresize(sym, 0.5))
        np.testing.assert_allclose(out, out[::-1], atol=1e-5)

    def test_reference_parity(self):
        """Oracle: the torch MATLAB-imresize port in the reference
        snapshot, when importable."""
        path = "/root/reference/TSD_SR/basicsr/utils/matlab_functions.py"
        if not os.path.exists(path):
            pytest.skip("reference snapshot not available")
        torch = pytest.importorskip("torch")
        spec = importlib.util.spec_from_file_location("ref_matlab", path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        x = rng.random((13, 11, 3)).astype(np.float32)
        for scale in (0.25, 0.5, 0.75, 1.5, 2.0):
            ours = np.asarray(ml.imresize(x, scale))
            theirs = ref.imresize(x, scale, antialiasing=True)
            np.testing.assert_allclose(ours, theirs, atol=2e-4,
                                       err_msg=f"scale={scale}")
        ours = np.asarray(ml.imresize(x, 0.5, antialiasing=False))
        theirs = ref.imresize(x, 0.5, antialiasing=False)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


class TestTorchInterpolate:
    @pytest.mark.parametrize("mode", ["bilinear", "bicubic", "area"])
    @pytest.mark.parametrize("size", [(7, 5), (20, 28), (16, 16)])
    def test_torch_parity(self, mode, size):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        x = rng.random((2, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(ml.interpolate(jnp.asarray(x), size, mode))
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        theirs = F.interpolate(t, size=size, mode=mode).numpy() \
            .transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


class TestYCbCr:
    def test_known_values(self):
        white = jnp.ones((1, 1, 3))
        y = np.asarray(ml.rgb2ycbcr(white))
        np.testing.assert_allclose(y[0, 0] * 255, [235, 128, 128], atol=0.1)
        black = jnp.zeros((1, 1, 3))
        np.testing.assert_allclose(
            np.asarray(ml.rgb2ycbcr(black))[0, 0] * 255, [16, 128, 128],
            atol=0.1)

    def test_roundtrip(self):
        x = jnp.asarray(rng.random((4, 4, 3)), jnp.float32)
        back = ml.ycbcr2rgb(ml.rgb2ycbcr(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_bgr_flip(self):
        x = jnp.asarray(rng.random((4, 4, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ml.bgr2ycbcr(x)),
            np.asarray(ml.rgb2ycbcr(x[..., ::-1])), atol=1e-6)


class TestJPEG:
    def test_quality_to_factor(self):
        assert float(quality_to_factor(50.0)) == pytest.approx(1.0)
        assert float(quality_to_factor(100.0)) == pytest.approx(0.0)
        assert float(quality_to_factor(10.0)) == pytest.approx(5.0)

    def test_quality_monotonic(self):
        x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        errs = []
        for q in (20.0, 50.0, 90.0):
            y = jpeg_roundtrip(x, q)
            errs.append(float(jnp.mean((y - x) ** 2)))
        assert errs[0] > errs[1] > errs[2]
        # smooth content reconstructs nearly losslessly at q=90
        xs = jnp.asarray(np.kron(rng.random((4, 4, 3)),
                                 np.ones((8, 8, 1))), jnp.float32)[None]
        e = float(jnp.mean((jpeg_roundtrip(xs, 90.0) - xs) ** 2))
        assert e < 1e-3, e

    def test_per_item_quality(self):
        x = jnp.tile(jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32),
                     (2, 1, 1, 1))
        y = jpeg_roundtrip(x, jnp.asarray([10.0, 95.0]))
        e0 = float(jnp.mean((y[0] - x[0]) ** 2))
        e1 = float(jnp.mean((y[1] - x[1]) ** 2))
        assert e0 > e1

    def test_nonmultiple_shape_and_grad(self):
        x = jnp.asarray(rng.random((1, 18, 22, 3)), jnp.float32)
        y = jpeg_roundtrip(x, 50.0)
        assert y.shape == x.shape
        g = jax.grad(lambda v: jnp.sum(
            jpeg_roundtrip(v, 50.0, differentiable=True)))(x)
        assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0

    def test_pil_agreement(self):
        """Our codec's reconstruction should be close to PIL's real JPEG
        at the same quality (not bit-exact: float DCT, no entropy
        stage)."""
        PIL = pytest.importorskip("PIL.Image")
        import io
        x = (rng.random((32, 32, 3)) * 0.5 + 0.25).astype(np.float32)
        buf = io.BytesIO()
        PIL.fromarray((x * 255).astype(np.uint8)).save(buf, "JPEG",
                                                       quality=75)
        pil = np.asarray(PIL.open(buf)).astype(np.float32) / 255.0
        ours = np.asarray(jpeg_roundtrip(jnp.asarray(x)[None], 75.0))[0]
        mse = float(np.mean((ours - pil) ** 2))
        assert mse < 2e-3, mse


class TestKernels:
    def test_normalized_and_symmetric(self):
        k = dg.bivariate_kernel(21, 1.5, 1.5, 0.0)
        assert k.sum() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(k, k.T, atol=1e-6)  # iso symmetric
        np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-6)

    def test_aniso_rotation(self):
        k0 = dg.bivariate_kernel(21, 3.0, 0.5, 0.0)
        k90 = dg.bivariate_kernel(21, 3.0, 0.5, math.pi / 2)
        np.testing.assert_allclose(k90, k0.T, atol=1e-6)

    def test_families_differ(self):
        kg = dg.bivariate_kernel(15, 2.0, 2.0, 0.0, ktype="gaussian")
        kgen = dg.bivariate_kernel(15, 2.0, 2.0, 0.0, beta=3.0,
                                   ktype="generalized")
        kp = dg.bivariate_kernel(15, 2.0, 2.0, 0.0, beta=1.5,
                                 ktype="plateau")
        assert np.abs(kg - kgen).max() > 1e-4
        assert np.abs(kg - kp).max() > 1e-4

    def test_sinc(self):
        k = dg.circular_lowpass_kernel(np.pi, 13, pad_to=21)
        assert k.shape == (21, 21)
        assert k.sum() == pytest.approx(1.0, abs=1e-5)
        # cutoff=pi keeps more high-frequency energy than a narrow cutoff
        k2 = dg.circular_lowpass_kernel(np.pi / 3, 13)
        assert k[10, 10] > k2[6, 6]

    def test_random_batch(self):
        cfg = dg.DegradationConfig()
        ks = dg.random_degradation_kernels(np.random.default_rng(3), cfg, 4)
        for name in ("kernel1", "kernel2", "sinc_kernel"):
            assert ks[name].shape == (4, 21, 21)
            np.testing.assert_allclose(ks[name].sum((1, 2)), 1.0, atol=1e-4)


class TestFilter2D:
    def test_scipy_parity_per_item(self):
        from scipy.ndimage import correlate
        img = rng.random((2, 12, 12, 3)).astype(np.float32)
        kern = rng.random((2, 5, 5)).astype(np.float32)
        out = np.asarray(dg.filter2D(jnp.asarray(img), jnp.asarray(kern)))
        for b in range(2):
            for c in range(3):
                expect = correlate(img[b, :, :, c], kern[b], mode="mirror")
                np.testing.assert_allclose(out[b, :, :, c], expect,
                                           atol=1e-4)

    def test_shared_kernel(self):
        img = rng.random((2, 10, 10, 3)).astype(np.float32)
        kern = rng.random((3, 3)).astype(np.float32)
        out = np.asarray(dg.filter2D(jnp.asarray(img), jnp.asarray(kern)))
        per = np.asarray(dg.filter2D(
            jnp.asarray(img), jnp.tile(jnp.asarray(kern)[None], (2, 1, 1))))
        np.testing.assert_allclose(out, per, atol=1e-5)


class TestUSM:
    def test_sharpens_edges(self):
        img = np.zeros((1, 64, 64, 3), np.float32)
        img[:, :, 32:] = 1.0
        img = jnp.asarray(img) * 0.8 + 0.1
        out = dg.usm_sharp(img)
        # overshoot on both sides of the edge
        assert float(out[0, 32, 33:40].max()) > 0.9
        assert float(out[0, 32, 24:31].min()) < 0.1
        # flat regions untouched
        np.testing.assert_allclose(np.asarray(out[0, :, :5]), 0.1, atol=1e-3)

    def test_range_and_shape(self):
        img = jnp.asarray(rng.random((2, 48, 48, 3)), jnp.float32)
        out = dg.usm_sharp(img)
        assert out.shape == img.shape
        assert bool(jnp.isfinite(out).all())


class TestNoise:
    def test_gaussian_sigma(self):
        img = jnp.full((2, 64, 64, 3), 0.5)
        sigma = jnp.asarray([5.0, 25.0])
        out = dg.add_gaussian_noise(jax.random.PRNGKey(0), img, sigma,
                                    jnp.asarray([False, False]))
        std = np.asarray(jnp.std(out - img, axis=(1, 2, 3)))
        np.testing.assert_allclose(std, [5 / 255, 25 / 255], rtol=0.1)

    def test_gray_mask_shares_channels(self):
        img = jnp.full((1, 16, 16, 3), 0.5)
        out = dg.add_gaussian_noise(jax.random.PRNGKey(0), img,
                                    jnp.asarray([10.0]),
                                    jnp.asarray([True]))
        n = np.asarray(out - img)
        np.testing.assert_allclose(n[..., 0], n[..., 1], atol=1e-6)

    def test_poisson(self):
        img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        vals = jnp.asarray(dg.poisson_noise_vals(np.asarray(img)))
        out = dg.add_poisson_noise(jax.random.PRNGKey(1), img,
                                   jnp.asarray([1.0, 2.0]), vals,
                                   jnp.asarray([False, True]))
        noise = np.asarray(out - img)
        assert np.isfinite(noise).all()
        assert abs(noise.mean()) < 0.01          # zero-mean shot noise
        assert noise.std() > 1e-3
        # gray item: identical noise across channels
        np.testing.assert_allclose(noise[1, ..., 0], noise[1, ..., 1],
                                   atol=0.05)


class TestPipeline:
    def test_synthesize_shapes_and_determinism(self):
        cfg = dg.DegradationConfig(scale=4, size_multiple=8)
        gt = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        lq1 = dg.synthesize_lq(np.random.default_rng(7),
                               jax.random.PRNGKey(7), gt, cfg)
        lq2 = dg.synthesize_lq(np.random.default_rng(7),
                               jax.random.PRNGKey(7), gt, cfg)
        assert lq1.shape == (2, 16, 16, 3)
        assert float(lq1.min()) >= 0 and float(lq1.max()) <= 1
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2))
        # 8-bit quantized
        q = np.asarray(lq1) * 255
        np.testing.assert_allclose(q, np.round(q), atol=1e-3)

    def test_degrades(self):
        """The LQ must actually be degraded vs a clean bicubic downscale."""
        cfg = dg.DegradationConfig(scale=4, size_multiple=8)
        x = np.kron(rng.random((8, 8, 3)), np.ones((8, 8, 1)))
        gt = jnp.asarray(x[None], jnp.float32)
        lq = dg.synthesize_lq(np.random.default_rng(3),
                              jax.random.PRNGKey(3), gt, cfg)
        clean = ml.imresize(gt, 0.25)
        assert float(jnp.mean((lq - clean) ** 2)) > 1e-4

    def test_paired_crop_alignment(self):
        scale = 4
        gt = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        lq = ml.imresize(gt, 1 / scale)
        g, l = dg.paired_random_crop(np.random.default_rng(0), gt, lq,
                                     32, scale)
        assert g.shape == (1, 32, 32, 3) and l.shape == (1, 8, 8, 3)
        # the crop of the downscale == the downscale of the crop center
        np.testing.assert_allclose(
            np.asarray(jnp.mean(g, (1, 2))), np.asarray(jnp.mean(l, (1, 2))),
            atol=0.05)

    def test_pair_pool(self):
        pool = dg.PairPool(queue_size=4)
        r = np.random.default_rng(0)
        a = np.full((2, 4, 4, 3), 1.0, np.float32)
        b = np.full((2, 4, 4, 3), 2.0, np.float32)
        ga, gb = a * 10, b * 10
        l1, g1 = pool.exchange(r, a, ga)       # fills, passthrough
        np.testing.assert_array_equal(l1, a)
        l2, g2 = pool.exchange(r, b, gb)
        np.testing.assert_array_equal(l2, b)
        c = np.full((2, 4, 4, 3), 3.0, np.float32)
        l3, g3 = pool.exchange(r, c, c * 10)   # full: returns pool content
        assert set(np.unique(l3)) <= {1.0, 2.0}
        np.testing.assert_allclose(g3, l3 * 10)


def _tiny_g(key):
    k = jax.random.normal(key, (3, 3, 3, 3)) * 0.1
    return {"k": k}


def _g_fwd(p, x):
    up = jnp.repeat(jnp.repeat(x, 4, 1), 4, 2)
    y = jax.lax.conv_general_dilated(
        up, p["k"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return up + y


def _tiny_d(key):
    return {"k": jax.random.normal(key, (3, 3, 3, 1)) * 0.1}


def _d_fwd(p, x):
    return jax.lax.conv_general_dilated(
        x, p["k"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestTraining:
    def test_artifact_map(self):
        gt = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        sr_ema = gt + 0.01
        sr = gt + jnp.asarray(rng.normal(size=(1, 16, 16, 3)) * 0.1,
                              jnp.float32)
        w = reg.get_refined_artifact_map(gt, sr, sr_ema)
        assert w.shape == (1, 16, 16, 1)
        assert float(w.min()) >= 0
        # where the current model beats the EMA, the weight is zeroed
        better = np.asarray(jnp.sum(jnp.abs(gt - sr), -1, keepdims=True)
                            < jnp.sum(jnp.abs(gt - sr_ema), -1,
                                      keepdims=True))
        assert np.all(np.asarray(w)[better] == 0)

    def test_realesrgan_step(self):
        import optax
        g = _tiny_g(jax.random.PRNGKey(0))
        d = _tiny_d(jax.random.PRNGKey(1))
        state = reg.RealESRGANState(
            g, d, jax.tree_util.tree_map(jnp.copy, g),
            optax.adam(1e-3).init(g), optax.adam(1e-3).init(d))
        cfg = reg.RealESRGANConfig(ldl_weight=1.0, percep_weight=0.0)
        step = reg.make_realesrgan_train_step(
            _g_fwd, _d_fwd, optax.adam(1e-3), optax.adam(1e-3), cfg)
        lq = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        gt_usm = dg.usm_sharp(gt)
        state2, m = step(state, lq, gt, gt_usm)
        assert all(np.isfinite(float(v)) for v in m.values())
        assert float(jnp.abs(state2.g_params["k"] - g["k"]).max()) > 0
        # EMA moved slightly toward the new params
        assert float(jnp.abs(state2.g_ema["k"] - g["k"]).max()) > 0
        assert float(jnp.abs(state2.g_ema["k"] - state2.g_params["k"]).max()) \
            < float(jnp.abs(g["k"] - state2.g_params["k"]).max()) + 1e-6

    def test_realesrnet_step(self):
        import optax
        g = _tiny_g(jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        step = reg.make_realesrnet_train_step(_g_fwd, opt)
        state = (g, jax.tree_util.tree_map(jnp.copy, g), opt.init(g))
        lq = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        losses = []
        for i in range(5):
            state, m = step(state, lq, gt, gt)
            losses.append(float(m["l_pix"]))
        assert losses[-1] < losses[0]
