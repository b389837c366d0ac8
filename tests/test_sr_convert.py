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
