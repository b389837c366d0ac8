"""Torch-checkpoint converters for the SR zoo (models/sr_convert.py).

Oracle: a synthetic state dict with the basicsr arch's exact key names and
shapes must convert to a tree with the SAME structure and leaf shapes as
the matching ``init_*_params`` output, and the forward must run on it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models import sr_archs as sa
from unitex_tpu.models import sr_convert as sc
from unitex_tpu.models import video_sr as vs
from unitex_tpu.models import swinir as sw

rng = np.random.default_rng(0)


def conv_sd(sd, name, cin, cout, k=3):
    sd[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
    sd[f"{name}.bias"] = np.zeros(cout, np.float32)


def lin_sd(sd, name, cin, cout):
    sd[f"{name}.weight"] = rng.normal(size=(cout, cin)).astype(np.float32) * 0.05
    sd[f"{name}.bias"] = np.zeros(cout, np.float32)


def assert_matches_init(converted, init_tree):
    ps, ptree = jax.tree_util.tree_flatten(converted)
    qs, qtree = jax.tree_util.tree_flatten(init_tree)
    assert ptree == qtree, f"\n{ptree}\n!=\n{qtree}"
    for a, b in zip(ps, qs):
        assert a.shape == b.shape, (a.shape, b.shape)


class TestClassicArchs:
    def test_rrdbnet(self):
        cfg = sa.RRDBConfig.tiny()
        nf, gc = cfg.num_feat, cfg.num_grow_ch
        sd = {}
        conv_sd(sd, "conv_first", cfg.in_channels, nf)
        for i in range(cfg.num_block):
            for r in range(1, 4):
                for c in range(1, 6):
                    cin = nf + (c - 1) * gc
                    cout = gc if c < 5 else nf
                    conv_sd(sd, f"body.{i}.rdb{r}.conv{c}", cin, cout)
        for n in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
            conv_sd(sd, n, nf, nf)
        conv_sd(sd, "conv_last", nf, cfg.out_channels)
        p = sc.convert_rrdbnet(sd)
        assert_matches_init(p, sa.init_rrdbnet_params(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
        out = sa.rrdbnet_forward(p, cfg, x)
        assert out.shape == (1, 8 * cfg.scale, 8 * cfg.scale, 3)
        assert bool(jnp.isfinite(out).all())

    def test_msrresnet(self):
        cfg = sa.MSRResNetConfig.tiny()
        nf = cfg.num_feat
        sd = {}
        conv_sd(sd, "conv_first", cfg.in_channels, nf)
        for i in range(cfg.num_block):
            conv_sd(sd, f"body.{i}.conv1", nf, nf)
            conv_sd(sd, f"body.{i}.conv2", nf, nf)
        conv_sd(sd, "upconv1", nf, 4 * nf)
        if cfg.scale == 4:
            conv_sd(sd, "upconv2", nf, 4 * nf)
        conv_sd(sd, "conv_hr", nf, nf)
        conv_sd(sd, "conv_last", nf, cfg.out_channels)
        p = sc.convert_msrresnet(sd)
        assert_matches_init(p, sa.init_msrresnet_params(jax.random.PRNGKey(0), cfg))
        out = sa.msrresnet_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32))
        assert bool(jnp.isfinite(out).all())

    def test_edsr(self):
        cfg = sa.EDSRConfig.tiny()
        nf = cfg.num_feat
        sd = {}
        conv_sd(sd, "conv_first", cfg.in_channels, nf)
        for i in range(cfg.num_block):
            conv_sd(sd, f"body.{i}.conv1", nf, nf)
            conv_sd(sd, f"body.{i}.conv2", nf, nf)
        conv_sd(sd, "conv_after_body", nf, nf)
        # Upsample Sequential: conv at 0 (+ PixelShuffle at 1, conv at 2 for x4)
        conv_sd(sd, "upsample.0", nf, 4 * nf)
        if cfg.scale == 4:
            conv_sd(sd, "upsample.2", nf, 4 * nf)
        conv_sd(sd, "conv_last", nf, cfg.out_channels)
        p = sc.convert_edsr(sd)
        assert_matches_init(p, sa.init_edsr_params(jax.random.PRNGKey(0), cfg))
        out = sa.edsr_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32))
        assert bool(jnp.isfinite(out).all())

    def test_srvgg(self):
        cfg = sa.SRVGGConfig.tiny()
        nf = cfg.num_feat
        sd = {}
        conv_sd(sd, "body.0", cfg.in_channels, nf)
        sd["body.1.weight"] = np.full(nf, 0.25, np.float32)  # PReLU
        idx = 2
        for _ in range(cfg.num_conv):
            conv_sd(sd, f"body.{idx}", nf, nf)
            sd[f"body.{idx + 1}.weight"] = np.full(nf, 0.25, np.float32)
            idx += 2
        conv_sd(sd, f"body.{idx}", nf, cfg.out_channels * cfg.scale**2)
        p = sc.convert_srvgg(sd)
        assert_matches_init(p, sa.init_srvgg_params(jax.random.PRNGKey(0), cfg))
        out = sa.srvgg_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32))
        assert bool(jnp.isfinite(out).all())

    def test_rcan(self):
        cfg = sa.RCANConfig.tiny()
        nf, sq = cfg.num_feat, cfg.squeeze_factor
        sd = {}
        conv_sd(sd, "conv_first", cfg.in_channels, nf)
        for g in range(cfg.num_group):
            for b in range(cfg.num_block):
                base = f"body.{g}.residual_group.{b}"
                conv_sd(sd, f"{base}.rcab.0", nf, nf)
                conv_sd(sd, f"{base}.rcab.2", nf, nf)
                conv_sd(sd, f"{base}.rcab.3.attention.1", nf, nf // sq, k=1)
                conv_sd(sd, f"{base}.rcab.3.attention.3", nf // sq, nf, k=1)
            conv_sd(sd, f"body.{g}.residual_group.{cfg.num_block}", nf, nf)
        conv_sd(sd, "conv_after_body", nf, nf)
        conv_sd(sd, "upsample.0", nf, 4 * nf)
        if cfg.scale == 4:
            conv_sd(sd, "upsample.2", nf, 4 * nf)
        conv_sd(sd, "conv_last", nf, cfg.out_channels)
        p = sc.convert_rcan(sd)
        assert_matches_init(p, sa.init_rcan_params(jax.random.PRNGKey(0), cfg))
        out = sa.rcan_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32))
        assert bool(jnp.isfinite(out).all())


class TestSwinIR:
    def test_convert_and_forward(self):
        cfg = sw.SwinIRConfig.tiny()
        C, w = cfg.embed_dim, cfg.window_size
        nw = (2 * w - 1) ** 2
        sd = {}
        conv_sd(sd, "conv_first", cfg.in_channels, C)
        sd["patch_embed.norm.weight"] = np.ones(C, np.float32)
        sd["patch_embed.norm.bias"] = np.zeros(C, np.float32)
        for i in range(len(cfg.depths)):
            for j in range(cfg.depths[i]):
                b = f"layers.{i}.residual_group.blocks.{j}"
                for nm in ("norm1", "norm2"):
                    sd[f"{b}.{nm}.weight"] = np.ones(C, np.float32)
                    sd[f"{b}.{nm}.bias"] = np.zeros(C, np.float32)
                lin_sd(sd, f"{b}.attn.qkv", C, 3 * C)
                lin_sd(sd, f"{b}.attn.proj", C, C)
                lin_sd(sd, f"{b}.mlp.fc1", C, int(C * cfg.mlp_ratio))
                lin_sd(sd, f"{b}.mlp.fc2", int(C * cfg.mlp_ratio), C)
                sd[f"{b}.attn.relative_position_bias_table"] = (
                    rng.normal(size=(nw, cfg.num_heads)).astype(np.float32) * 0.02)
            conv_sd(sd, f"layers.{i}.conv", C, C)
        sd["norm.weight"] = np.ones(C, np.float32)
        sd["norm.bias"] = np.zeros(C, np.float32)
        nf = cfg.num_feat
        conv_sd(sd, "conv_after_body", C, C)
        conv_sd(sd, "conv_before_upsample.0", C, nf)
        conv_sd(sd, "upsample.0", nf, 4 * nf)
        if cfg.scale == 4:
            conv_sd(sd, "upsample.2", nf, 4 * nf)
        conv_sd(sd, "conv_last", nf, cfg.in_channels)
        p = sc.convert_swinir(sd)
        init = sw.init_swinir_params(jax.random.PRNGKey(0), cfg)
        # the converted tree additionally carries the checkpoint's
        # patch-embed norm (optional in the arch)
        assert "patch_norm" in p
        assert_matches_init(
            {k: v for k, v in p.items() if k != "patch_norm"}, init
        )
        x = jnp.asarray(rng.uniform(size=(1, 2 * w, 2 * w, 3)), jnp.float32)
        out = sw.swinir_forward(p, cfg, x)
        assert out.shape == (1, 2 * w * cfg.scale, 2 * w * cfg.scale, 3)
        assert bool(jnp.isfinite(out).all())

    def test_patch_norm_applied(self):
        """patch_embed.norm in the checkpoint must change the output."""
        cfg = sw.SwinIRConfig.tiny()
        p = sw.init_swinir_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
        base = sw.swinir_forward(p, cfg, x)
        p2 = dict(p)
        p2["patch_norm"] = {"g": jnp.full((cfg.embed_dim,), 2.0),
                            "b": jnp.zeros((cfg.embed_dim,))}
        out = sw.swinir_forward(p2, cfg, x)
        assert float(jnp.abs(out - base).max()) > 1e-5


class TestVideoArchs:
    def _spynet_sd(self, sd, prefix=""):
        for i in range(6):
            for j, (cin, cout) in zip((0, 2, 4, 6, 8), vs._SPY_CHANNELS):
                conv_sd(sd, f"{prefix}basic_module.{i}.basic_module.{j}",
                        cin, cout, k=7)

    def test_spynet(self):
        sd = {}
        self._spynet_sd(sd)
        p = sc.convert_spynet(sd)
        assert_matches_init(p, vs.init_spynet_params(jax.random.PRNGKey(0)))
        ref = np.broadcast_to(
            np.linspace(0, 1, 64, dtype=np.float32)[None, :, None, None],
            (1, 64, 64, 3)).copy()
        flow = vs.spynet_flow(p, jnp.asarray(ref), jnp.asarray(ref))
        assert flow.shape == (1, 64, 64, 2)
        assert bool(jnp.isfinite(flow).all())

    def test_basicvsr(self):
        cfg = vs.BasicVSRConfig.tiny()
        nf = cfg.num_feat
        sd = {}
        self._spynet_sd(sd, "spynet.")
        for name in ("backward_trunk", "forward_trunk"):
            conv_sd(sd, f"{name}.main.0", nf + 3, nf)
            for i in range(cfg.num_block):
                conv_sd(sd, f"{name}.main.2.{i}.conv1", nf, nf)
                conv_sd(sd, f"{name}.main.2.{i}.conv2", nf, nf)
        conv_sd(sd, "fusion", 2 * nf, nf, k=1)
        conv_sd(sd, "upconv1", nf, 4 * nf)
        conv_sd(sd, "upconv2", nf, 4 * nf)
        conv_sd(sd, "conv_hr", nf, nf)
        conv_sd(sd, "conv_last", nf, 3)
        p = sc.convert_basicvsr(sd)
        assert_matches_init(p, vs.init_basicvsr_params(jax.random.PRNGKey(0), cfg))
        lrs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
        out = vs.basicvsr_forward(p, cfg, lrs)
        assert out.shape == (2, 128, 128, 3)
        assert bool(jnp.isfinite(out).all())

    def test_edvr(self):
        cfg = vs.EDVRConfig.tiny()
        nf, g = cfg.num_feat, cfg.deformable_groups
        sd = {}
        conv_sd(sd, "conv_first", 3, nf)
        for i in range(cfg.num_extract_block):
            conv_sd(sd, f"feature_extraction.{i}.conv1", nf, nf)
            conv_sd(sd, f"feature_extraction.{i}.conv2", nf, nf)
        for n in ("conv_l2_1", "conv_l2_2", "conv_l3_1", "conv_l3_2"):
            conv_sd(sd, n, nf, nf)
        for lv in (1, 2, 3):
            conv_sd(sd, f"pcd_align.offset_conv1.l{lv}", 2 * nf, nf)
            conv_sd(sd, f"pcd_align.offset_conv2.l{lv}",
                    nf if lv == 3 else 2 * nf, nf)
            if lv < 3:
                conv_sd(sd, f"pcd_align.offset_conv3.l{lv}", nf, nf)
                conv_sd(sd, f"pcd_align.feat_conv.l{lv}", 2 * nf, nf)
            conv_sd(sd, f"pcd_align.dcn_pack.l{lv}", nf, nf)
            conv_sd(sd, f"pcd_align.dcn_pack.l{lv}.conv_offset", nf, g * 27)
        conv_sd(sd, "pcd_align.cas_offset_conv1", 2 * nf, nf)
        conv_sd(sd, "pcd_align.cas_offset_conv2", nf, nf)
        conv_sd(sd, "pcd_align.cas_dcnpack", nf, nf)
        conv_sd(sd, "pcd_align.cas_dcnpack.conv_offset", nf, g * 27)
        for n in ("temporal_attn1", "temporal_attn2"):
            conv_sd(sd, f"fusion.{n}", nf, nf)
        conv_sd(sd, "fusion.feat_fusion", cfg.num_frame * nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn1", cfg.num_frame * nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn2", 2 * nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn3", nf, nf)
        conv_sd(sd, "fusion.spatial_attn4", nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn5", nf, nf)
        conv_sd(sd, "fusion.spatial_attn_l1", nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn_l2", 2 * nf, nf)
        conv_sd(sd, "fusion.spatial_attn_l3", nf, nf)
        conv_sd(sd, "fusion.spatial_attn_add1", nf, nf, k=1)
        conv_sd(sd, "fusion.spatial_attn_add2", nf, nf, k=1)
        for i in range(cfg.num_reconstruct_block):
            conv_sd(sd, f"reconstruction.{i}.conv1", nf, nf)
            conv_sd(sd, f"reconstruction.{i}.conv2", nf, nf)
        conv_sd(sd, "upconv1", nf, 4 * nf)
        conv_sd(sd, "upconv2", nf, 4 * 64)
        conv_sd(sd, "conv_hr", 64, 64)
        conv_sd(sd, "conv_last", 64, 3)
        p = sc.convert_edvr(sd)
        assert_matches_init(p, vs.init_edvr_params(jax.random.PRNGKey(0), cfg))
        lrs = jnp.asarray(rng.uniform(size=(cfg.num_frame, 16, 16, 3)), jnp.float32)
        out = vs.edvr_forward(p, cfg, lrs)
        assert out.shape == (64, 64, 3)
        assert bool(jnp.isfinite(out).all())


class TestLoaderRobustness:
    def test_bf16_and_bookkeeping_entries(self, tmp_path):
        import torch

        sd = {
            "conv.weight": torch.randn(4, 3, 3, 3, dtype=torch.bfloat16),
            "conv.bias": torch.zeros(4),
            "epoch": 12,  # scalar bookkeeping (permitted by weights_only)
        }
        path = str(tmp_path / "ckpt.pth")
        torch.save(sd, path)
        out = sc.load_state_dict(path)
        assert out["conv.weight"].dtype == np.float32
        assert "epoch" not in out

    def test_srvgg_leakyrelu_rejected(self):
        sd = {}
        conv_sd(sd, "body.0", 3, 8)
        conv_sd(sd, "body.1", 8, 8)
        conv_sd(sd, "body.2", 8, 48)
        with pytest.raises(ValueError, match="leakyrelu"):
            sc.convert_srvgg(sd)


def bn_sd(sd, name, c):
    sd[f"{name}.weight"] = np.ones(c, np.float32)
    sd[f"{name}.bias"] = np.zeros(c, np.float32)
    sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
    sd[f"{name}.running_var"] = np.ones(c, np.float32)


class TestExtraArchs:
    def test_ecbsr(self):
        cfg = sa.ECBSRConfig(num_block=2, num_channel=8, scale=2)
        nc, m = cfg.num_channel, cfg.depth_multiplier
        sd = {}
        dims = [(cfg.num_in_ch, nc)] + [(nc, nc)] * cfg.num_block \
            + [(nc, cfg.num_out_ch * cfg.scale**2)]
        for i, (cin, cout) in enumerate(dims):
            b = f"backbone.{i}"
            conv_sd(sd, f"{b}.conv3x3", cin, cout)
            mid = int(cout * m)
            sd[f"{b}.conv1x1_3x3.k0"] = rng.normal(
                size=(mid, cin, 1, 1)).astype(np.float32) * 0.05
            sd[f"{b}.conv1x1_3x3.b0"] = np.zeros(mid, np.float32)
            sd[f"{b}.conv1x1_3x3.k1"] = rng.normal(
                size=(cout, mid, 3, 3)).astype(np.float32) * 0.05
            sd[f"{b}.conv1x1_3x3.b1"] = np.zeros(cout, np.float32)
            for br in ("sbx", "sby", "lpl"):
                sd[f"{b}.conv1x1_{br}.k0"] = rng.normal(
                    size=(cout, cin, 1, 1)).astype(np.float32) * 0.05
                sd[f"{b}.conv1x1_{br}.b0"] = np.zeros(cout, np.float32)
                sd[f"{b}.conv1x1_{br}.scale"] = rng.normal(
                    size=(cout, 1, 1, 1)).astype(np.float32) * 1e-3
                sd[f"{b}.conv1x1_{br}.bias"] = np.zeros(cout, np.float32)
                sd[f"{b}.conv1x1_{br}.mask"] = np.zeros((cout, 1, 3, 3), np.float32)
            if i < len(dims) - 1:
                sd[f"{b}.act.weight"] = np.full(cout, 0.25, np.float32)
        p = sc.convert_ecbsr(sd)
        assert_matches_init(p, sa.init_ecbsr_params(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
        out = sa.ecbsr_forward(p, cfg, x)
        rep = sa.ecbsr_reparameterize(p, cfg)
        out2 = sa.ecbsr_forward_rep(rep, cfg, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_ridnet(self):
        cfg = sa.RIDNetConfig.tiny()
        nf, sq = cfg.mid_channels, cfg.squeeze_factor
        sd = {}
        conv_sd(sd, "sub_mean", 3, 3, k=1)
        conv_sd(sd, "add_mean", 3, 3, k=1)
        conv_sd(sd, "head", cfg.in_channels, nf)
        for i in range(cfg.num_block):
            b = f"body.{i}"
            conv_sd(sd, f"{b}.merge.dilation1.0", nf, nf)
            conv_sd(sd, f"{b}.merge.dilation1.2", nf, nf)
            conv_sd(sd, f"{b}.merge.dilation2.0", nf, nf)
            conv_sd(sd, f"{b}.merge.dilation2.2", nf, nf)
            conv_sd(sd, f"{b}.merge.aggregation.0", 2 * nf, nf)
            conv_sd(sd, f"{b}.block1.conv1", nf, nf)
            conv_sd(sd, f"{b}.block1.conv2", nf, nf)
            conv_sd(sd, f"{b}.block2.body.0", nf, nf)
            conv_sd(sd, f"{b}.block2.body.2", nf, nf)
            conv_sd(sd, f"{b}.block2.body.4", nf, nf, k=1)
            conv_sd(sd, f"{b}.ca.attention.1", nf, nf // sq, k=1)
            conv_sd(sd, f"{b}.ca.attention.3", nf // sq, nf, k=1)
        conv_sd(sd, "tail", nf, cfg.out_channels)
        p = sc.convert_ridnet(sd)
        assert_matches_init(p, sa.init_ridnet_params(jax.random.PRNGKey(0), cfg))
        out = sa.ridnet_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32))
        assert bool(jnp.isfinite(out).all())

    def test_toflow(self):
        sd = {}
        chans = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))
        for i in range(4):
            base = f"spynet.basic_module.{i}.basic_module"
            for j, (idx, (cin, cout)) in enumerate(zip((0, 3, 6, 9, 12), chans)):
                sd[f"{base}.{idx}.weight"] = rng.normal(
                    size=(cout, cin, 7, 7)).astype(np.float32) * 0.02
                if j == 4:
                    sd[f"{base}.{idx}.bias"] = np.zeros(cout, np.float32)
                else:
                    bn_sd(sd, f"{base}.{idx + 1}", cout)
        sd["conv_1.weight"] = rng.normal(size=(64, 21, 9, 9)).astype(np.float32) * 0.02
        sd["conv_1.bias"] = np.zeros(64, np.float32)
        conv_sd(sd, "conv_2", 64, 64, k=9)
        conv_sd(sd, "conv_3", 64, 64, k=1)
        conv_sd(sd, "conv_4", 64, 3, k=1)
        p = sc.convert_toflow(sd)
        assert_matches_init(p, vs.init_toflow_params(jax.random.PRNGKey(0)))
        out = vs.toflow_forward(
            p, jnp.asarray(rng.uniform(size=(7, 32, 32, 3)), jnp.float32))
        assert out.shape == (32, 32, 3)

    def test_duf(self):
        cfg = vs.DUFConfig.tiny()
        nb, gc, s2 = cfg.num_block, cfg.num_grow_ch, cfg.scale ** 2
        sd = {}

        def c3_sd(name, cin, cout, kt, k):
            sd[f"{name}.weight"] = rng.normal(
                size=(cout, cin, kt, k, k)).astype(np.float32) * 0.02
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        def unit_sd(prefix, cin):
            bn_sd(sd, f"{prefix}.0", cin)
            c3_sd(f"{prefix}.2", cin, cin, 1, 1)
            bn_sd(sd, f"{prefix}.3", cin)
            c3_sd(f"{prefix}.5", cin, gc, 3, 3)

        c3_sd("conv3d1", 3, 64, 1, 3)
        for i in range(nb):
            unit_sd(f"dense_block1.dense_blocks.{i}", 64 + i * gc)
        c1 = 64 + nb * gc
        for j, cin in enumerate((c1, c1 + gc, c1 + 2 * gc)):
            unit_sd(f"dense_block2.temporal_reduce{j + 1}", cin)
        ch = c1 + 3 * gc
        bn_sd(sd, "bn3d2", ch)
        c3_sd("conv3d2", ch, 256, 1, 3)
        c3_sd("conv3d_r1", 256, 256, 1, 1)
        c3_sd("conv3d_r2", 256, 3 * s2, 1, 1)
        c3_sd("conv3d_f1", 256, 512, 1, 1)
        c3_sd("conv3d_f2", 512, 25 * s2, 1, 1)
        p = sc.convert_duf(sd)
        assert_matches_init(p, vs.init_duf_params(jax.random.PRNGKey(0), cfg))
        out = vs.duf_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(7, 8, 8, 3)), jnp.float32))
        assert out.shape == (8 * cfg.scale, 8 * cfg.scale, 3)

    def test_basicvsrpp(self):
        cfg = vs.BasicVSRPPConfig.tiny()
        mid, G = cfg.mid_channels, cfg.deformable_groups
        sd = {}
        for i in range(6):
            base = f"spynet.basic_module.{i}.basic_module"
            for idx, (cin, cout) in zip((0, 2, 4, 6, 8),
                                        ((8, 32), (32, 64), (64, 32),
                                         (32, 16), (16, 2))):
                sd[f"{base}.{idx}.weight"] = rng.normal(
                    size=(cout, cin, 7, 7)).astype(np.float32) * 0.02
                sd[f"{base}.{idx}.bias"] = np.zeros(cout, np.float32)

        def trunk_sd(name, cin, n):
            conv_sd(sd, f"{name}.main.0", cin, mid)
            for i in range(n):
                conv_sd(sd, f"{name}.main.2.{i}.conv1", mid, mid)
                conv_sd(sd, f"{name}.main.2.{i}.conv2", mid, mid)

        trunk_sd("feat_extract", 3, 5)
        for i, name in enumerate(("backward_1", "forward_1",
                                  "backward_2", "forward_2")):
            da = f"deform_align.{name}"
            conv_sd(sd, da, 2 * mid, mid)
            conv_sd(sd, f"{da}.conv_offset.0", 3 * mid + 4, mid)
            conv_sd(sd, f"{da}.conv_offset.2", mid, mid)
            conv_sd(sd, f"{da}.conv_offset.4", mid, mid)
            conv_sd(sd, f"{da}.conv_offset.6", mid, 27 * G)
            trunk_sd(f"backbone.{name}", (2 + i) * mid, cfg.num_blocks)
        trunk_sd("reconstruction", 5 * mid, 5)
        conv_sd(sd, "upconv1", mid, mid * 4)
        conv_sd(sd, "upconv2", mid, 64 * 4)
        conv_sd(sd, "conv_hr", 64, 64)
        conv_sd(sd, "conv_last", 64, 3)
        p = sc.convert_basicvsrpp(sd)
        assert_matches_init(
            p, vs.init_basicvsrpp_params(jax.random.PRNGKey(0), cfg))
        out = vs.basicvsrpp_forward(
            p, cfg, jnp.asarray(rng.uniform(size=(3, 32, 32, 3)), jnp.float32))
        assert out.shape == (3, 128, 128, 3)
