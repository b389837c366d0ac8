"""DFDNet (models/dfdnet.py).

Oracles:
* the static-shape masked swap must match the crop-based numpy reference
  (torch semantics of dfdnet_arch.swap_feat) bit-for-bit in the box;
* box_resize_bilinear / nearest paste against torch F.interpolate;
* VGG19 extractor against torchvision layer arithmetic (shapes + a conv
  parity spot check);
* converter structure-equality against the init tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models import dfdnet as dn

rng = np.random.default_rng(7)


def rand(*shape):
    return rng.normal(size=shape).astype(np.float32)


class TestBoxOps:
    def test_box_resize_matches_torch_interpolate(self):
        torch = pytest.importorskip("torch")
        f = rand(31, 29, 5)
        box = np.array([4, 6, 27, 25], np.int32)  # x0 y0 x1 y1
        out = dn.box_resize_bilinear(jnp.asarray(f), jnp.asarray(box), (10, 8))
        crop = torch.from_numpy(f[6:25, 4:27].transpose(2, 0, 1))[None]
        ref = torch.nn.functional.interpolate(
            crop, (10, 8), mode="bilinear", align_corners=False)
        ref = ref[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_box_paste_matches_torch_nearest(self):
        torch = pytest.importorskip("torch")
        sel = rand(7, 9, 4)
        box = np.array([3, 5, 20, 17], np.int32)
        full, mask = dn.box_paste_nearest(jnp.asarray(sel), jnp.asarray(box),
                                          (30, 28))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(sel.transpose(2, 0, 1))[None], (12, 17),
            mode="nearest")[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(np.asarray(full)[5:17, 3:20], ref,
                                   atol=1e-6)
        m = np.asarray(mask)[..., 0]
        assert m[5:17, 3:20].all() and m.sum() == 12 * 17

    def test_adain_matches_torch_semantics(self):
        content = rand(3, 6, 5, 4)
        style = rand(6, 5, 4)
        out = np.asarray(dn.adaptive_instance_norm(
            jnp.asarray(content), jnp.asarray(style)))
        # unbiased variance like torch .var()
        cm = content.mean((1, 2), keepdims=True)
        cv = content.var((1, 2), keepdims=True, ddof=1)
        sm = style.mean((0, 1), keepdims=True)
        sv = style.var((0, 1), keepdims=True, ddof=1)
        ref = (content - cm) / np.sqrt(cv + 1e-5) * np.sqrt(sv + 1e-5) + sm
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSwapParity:
    def test_masked_full_map_swap_equals_crop_reference(self):
        """The core re-architecture claim: conv-on-masked-full-map ==
        conv-on-zero-padded-crop inside the box, untouched outside."""
        key = jax.random.PRNGKey(0)
        attn_p = dn._conv_pair(key, 6, 6)
        f = rand(24, 24, 6)
        updated = f.copy()
        dict_feat = rand(5, 8, 8, 6)
        box = np.array([3, 5, 17, 19], np.int32)
        ours = dn.swap_part(attn_p, jnp.asarray(f), jnp.asarray(updated),
                            jnp.asarray(dict_feat), jnp.asarray(box))
        ref = dn.swap_part_reference(
            jax.tree_util.tree_map(np.asarray, attn_p), f, updated,
            dict_feat, box)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_outside_box_untouched(self):
        key = jax.random.PRNGKey(1)
        attn_p = dn._conv_pair(key, 3, 3)
        f = rand(16, 16, 3)
        marker = np.full_like(f, 42.0)
        out = np.asarray(dn.swap_part(
            attn_p, jnp.asarray(f), jnp.asarray(marker),
            jnp.asarray(rand(2, 4, 4, 3)),
            jnp.asarray(np.array([2, 2, 10, 10], np.int32))))
        assert (out[12:] == 42.0).all() and (out[:, 12:] == 42.0).all()
        assert not (out[2:10, 2:10] == 42.0).all()


class TestVGG19:
    def test_tap_shapes(self):
        p = dn.init_vgg19_params(jax.random.PRNGKey(0))
        x = jnp.asarray(rand(1, 64, 64, 3))
        taps = dn.vgg19_features(p, x, dn.VGG_TAPS, range_norm=True)
        assert taps["relu2_2"].shape == (1, 32, 32, 128)
        assert taps["relu3_4"].shape == (1, 16, 16, 256)
        assert taps["relu4_4"].shape == (1, 8, 8, 512)
        assert taps["conv5_4"].shape == (1, 4, 4, 512)

    def test_conv5_4_is_pre_relu(self):
        p = dn.init_vgg19_params(jax.random.PRNGKey(0))
        x = jnp.asarray(rand(1, 32, 32, 3))
        t = dn.vgg19_features(p, x, ("conv5_4",))
        assert float(jnp.min(t["conv5_4"])) < 0.0


class TestForwardAndConvert:
    def _tiny_dict(self, nf):
        sizes = {32: 8, 16: 5, 8: 3, 4: 2}
        chans = dict(zip((32, 16, 8, 4), dn.CHANNEL_SIZES))
        return {fs: {part: jnp.asarray(rand(3, s, s, chans[fs]) * 0.2)
                     for part in dn.PARTS}
                for fs, s in sizes.items()}

    def test_forward_tiny(self):
        cfg = dn.DFDNetConfig.tiny()
        p = init_scaled = dn.init_dfdnet_params(jax.random.PRNGKey(0), cfg)
        d = self._tiny_dict(cfg.num_feat)
        x = jnp.asarray(rand(2, 64, 64, 3) * 0.5)
        locs = jnp.asarray(
            np.array([[[8, 8, 24, 24], [40, 8, 56, 24],
                       [24, 24, 40, 44], [16, 44, 48, 60]]] * 2, np.int32))
        out = dfd = dn.dfdnet_forward(p, d, x, locs, cfg)
        assert out.shape == (2, 64, 64, 3)
        o = np.asarray(out)
        assert np.isfinite(o).all() and (np.abs(o) <= 1.0).all()

    def test_convert_structure(self):
        cfg = dn.DFDNetConfig.tiny()
        nf = cfg.num_feat
        sd = {}

        def conv_sd(name, cin, cout, sn=False, bias=True):
            w = rand(cout, cin, 3, 3) * 0.05
            if sn:
                sd[f"{name}.weight_orig"] = w
                sd[f"{name}.weight_u"] = rand(cout)
                sd[f"{name}.weight_v"] = rand(cin * 9)
            else:
                sd[f"{name}.weight"] = w
            if bias:
                sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        cin = 3
        for name, ci, co in dn._vgg_conv_channels("conv5_4"):
            conv_sd(f"vgg_extractor.vgg_net.{name}", ci, co)
        for ch, fs in zip(dn.CHANNEL_SIZES, dn.FEATURE_SIZES):
            for part in dn.PARTS:
                conv_sd(f"attn_blocks.{part}_{fs}.0", ch, ch, sn=True)
                conv_sd(f"attn_blocks.{part}_{fs}.2", ch, ch, sn=True)
        for i in range(4):
            conv_sd(f"multi_scale_dilation.conv_blocks.{i}.0",
                    nf * 8, nf * 8, sn=True)
            conv_sd(f"multi_scale_dilation.conv_blocks.{i}.2",
                    nf * 8, nf * 8, sn=True)
        conv_sd("multi_scale_dilation.conv_fusion", nf * 32, nf * 8, sn=True)
        dims = [(nf * 8, nf * 8), (nf * 8, nf * 4), (nf * 4, nf * 2),
                (nf * 2, nf)]
        for i, (ci, co) in enumerate(dims):
            conv_sd(f"upsample{i}.conv1.1", ci, co, sn=True)
            conv_sd(f"upsample{i}.convup.1", co, co, sn=True)
            conv_sd(f"upsample{i}.scale_block.0", ci, co, sn=True)
            conv_sd(f"upsample{i}.scale_block.2", co, co, sn=True)
            conv_sd(f"upsample{i}.shift_block.0", ci, co, sn=True)
            conv_sd(f"upsample{i}.shift_block.2", co, co, sn=True)
        conv_sd("upsample4.0", nf, nf, sn=True)
        for r in (2, 3):
            conv_sd(f"upsample4.{r}.body.0", nf, nf)
            conv_sd(f"upsample4.{r}.body.2", nf, nf)
        conv_sd("upsample4.4", nf, 3)

        p = dn.convert_dfdnet(sd, cfg)
        init = dn.init_dfdnet_params(jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        for a, b in zip(ps, qs):
            assert a.shape == b.shape, (a.shape, b.shape)

    def test_convert_dict(self):
        td = {"256": {p: rand(4, 10, 10, 0 + c) .transpose(0, 3, 1, 2)
                      for p, c in zip(dn.PARTS, (6, 6, 6, 6))}}
        out = dn.convert_dfdnet_dict(td)
        assert out[256]["nose"].shape == (4, 10, 10, 6)
