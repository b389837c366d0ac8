import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.sr_archs import (
    RRDBConfig,
    init_rrdbnet_params,
    rrdbnet_forward,
)
from unitex_tpu.ops.basicsr_ops import (
    deform_conv2d,
    fused_leaky_relu,
    make_resample_kernel,
    upfirdn2d,
)


class TestUpfirdn:
    def test_identity_kernel(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 2)).astype(np.float32))
        k = jnp.asarray([[1.0]])
        out = upfirdn2d(x, k, up=1, down=1, pad=(0, 0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_upsample_shape_and_energy(self):
        x = jnp.ones((1, 4, 4, 1))
        k = make_resample_kernel([1, 3, 3, 1]) * 4  # gain for 2x up
        # stylegan2 up-2 padding for k=4: ((k-up+1)//2 + up - 1, (k-up)//2)
        out = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
        assert out.shape == (1, 8, 8, 1)
        # interior is flat 1.0 after properly-gained upsampling
        np.testing.assert_allclose(np.asarray(out)[0, 2:6, 2:6, 0], 1.0, atol=1e-5)

    def test_downsample(self):
        x = jnp.ones((1, 8, 8, 1))
        k = make_resample_kernel([1, 3, 3, 1])
        out = upfirdn2d(x, k, up=1, down=2, pad=(1, 1))
        assert out.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(np.asarray(out)[0, 1:3, 1:3, 0], 1.0, atol=1e-5)

    def test_matches_torch_conv_semantics(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 6, 6, 1)).astype(np.float32)
        k = rng.normal(size=(3, 3)).astype(np.float32)
        ours = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), pad=(1, 1)))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tk = torch.from_numpy(np.flip(k, (0, 1)).copy())[None, None]
        ref = TF.conv2d(TF.pad(tx, (1, 1, 1, 1)), tk).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestFusedAct:
    def test_values(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        b = jnp.asarray([0.5, 0.5, 0.5])
        out = np.asarray(fused_leaky_relu(x, b))
        expect = np.asarray([-0.5 * 0.2, 0.5, 2.5]) * np.sqrt(2)
        np.testing.assert_allclose(out, expect, atol=1e-6)


class TestDeformConv:
    def test_zero_offset_equals_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
        offset = jnp.zeros((1, 8, 8, 18))
        out = deform_conv2d(x, offset, w, padding=1)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_shift_offset(self):
        """Offset (0, +1) everywhere shifts the receptive field right."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 10, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
        off = jnp.zeros((1, 8, 10, 18)).at[..., 1::2].set(1.0)  # dx = +1
        out = deform_conv2d(x, off, w, padding=1)
        shifted = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
        ref = jax.lax.conv_general_dilated(
            shifted, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # interior matches (border differs by zero-padding semantics)
        np.testing.assert_allclose(
            np.asarray(out)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2], atol=1e-4
        )

    def test_mask_modulation(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)).astype(np.float32))
        off = jnp.zeros((1, 6, 6, 18))
        mask0 = jnp.zeros((1, 6, 6, 9))
        out = deform_conv2d(x, off, w, mask=mask0, padding=1)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestRRDB:
    def test_forward_shapes(self):
        cfg = RRDBConfig.tiny()
        params = init_rrdbnet_params(jax.random.key(0), cfg)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
        )
        out = rrdbnet_forward(params, cfg, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_x4(self):
        cfg = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
        params = init_rrdbnet_params(jax.random.key(0), cfg)
        x = jnp.ones((1, 8, 8, 3)) * 0.5
        out = rrdbnet_forward(params, cfg, x)
        assert out.shape == (1, 32, 32, 3)
