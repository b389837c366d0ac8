"""LPIPS / DISTS learned perceptual metrics (the pyiqa capability,
/root/reference/TSD_SR/test/test_metrics.py:24-34) — jnp vs numpy
dual-implementation parity plus metric properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.utils.lpips import (
    backbone_features,
    convert_torchvision_backbone,
    dists,
    init_dists_params,
    init_lpips_params,
    lpips,
    lpips_image01,
    lpips_reference,
)


def _imgs(rng, n=2, size=32):
    a = rng.uniform(-1, 1, size=(n, size, size, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.3, size=a.shape).astype(np.float32), -1, 1)
    return a, b


class TestLPIPS:
    @pytest.fixture(scope="class", params=["vgg", "alex"])
    def setup(self, request):
        params = init_lpips_params(jax.random.key(0), request.param)
        rng = np.random.default_rng(0)
        return params, rng

    def test_identity_is_zero(self, setup):
        params, rng = setup
        a, _ = _imgs(rng)
        d = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(a)))
        assert d.shape == (2,)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_positive_and_monotone_in_distortion(self, setup):
        params, rng = setup
        a, _ = _imgs(rng)
        small = np.clip(a + rng.normal(scale=0.05, size=a.shape), -1, 1)
        large = np.clip(a + rng.normal(scale=0.5, size=a.shape), -1, 1)
        d_small = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(small)))
        d_large = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(large)))
        assert (d_small > 0).all()
        assert (d_large > d_small).all()

    def test_matches_numpy_reference(self, setup):
        params, rng = setup
        a, b = _imgs(rng)
        got = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(b)))
        want = lpips_reference(params, a, b)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    def test_differentiable(self, setup):
        params, rng = setup
        a, b = _imgs(rng, n=1)

        g = jax.grad(lambda x: lpips(params, x, jnp.asarray(b)).sum())(
            jnp.asarray(a)
        )
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_image01_wrapper(self, setup):
        params, rng = setup
        a, b = _imgs(rng)
        a01, b01 = (a + 1) / 2, (b + 1) / 2
        d1 = np.asarray(lpips_image01(params, jnp.asarray(a01), jnp.asarray(b01)))
        d2 = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-7)


class TestDISTS:
    @pytest.fixture(scope="class")
    def params(self):
        return init_dists_params(jax.random.key(1))

    def test_identity_is_zero(self, params):
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
        d = np.asarray(dists(params, jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_positive_on_distortion(self, params):
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.3, size=a.shape), 0, 1).astype(np.float32)
        d = np.asarray(dists(params, jnp.asarray(a), jnp.asarray(b)))
        assert (d > 0).all() and np.isfinite(d).all()


class TestTorchConversion:
    def test_torchvision_layout_roundtrip(self):
        """A torchvision-format OIHW state dict converts to stages that
        reproduce the directly-built jnp backbone's features."""
        torch = pytest.importorskip("torch")
        params = init_lpips_params(jax.random.key(2), "vgg")
        # serialize our backbone into torchvision's flat features.N layout
        sd = {}
        idx = 0
        from unitex_tpu.utils.lpips import _VGG16_CFG, _VGG16_POOL

        for si, stage in enumerate(_VGG16_CFG):
            if _VGG16_POOL[si]:
                idx += 1
            for li in range(len(stage)):
                p = params["net"][si][li]
                w = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
                sd[f"features.{idx}.weight"] = torch.from_numpy(w.copy())
                sd[f"features.{idx}.bias"] = torch.from_numpy(
                    np.asarray(p["bias"]).copy()
                )
                idx += 2
        stages = convert_torchvision_backbone(
            {k: v.numpy() for k, v in sd.items()}, "vgg"
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32))
        f_direct = backbone_features(params, x, "vgg")
        f_conv = backbone_features({"net": stages}, x, "vgg")
        for fd, fc in zip(f_direct, f_conv):
            np.testing.assert_allclose(np.asarray(fd), np.asarray(fc), atol=1e-6)
