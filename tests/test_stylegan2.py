"""StyleGAN2 (basicsr stylegan2_arch.py capability): generator,
discriminator, modulated-conv math equivalence, checkpoint converters."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models import stylegan2 as sg
from unitex_tpu.models import sr_convert as sc

rng = np.random.default_rng(0)


class TestModulatedConv:
    def test_matches_per_sample_weight_form(self):
        """The input-scale/output-demod formulation must equal the
        reference's per-sample modulated-weight grouped conv
        (stylegan2_arch.py:249-277) for demodulate on and off."""
        B, H, W, cin, cout, k, nsf = 3, 6, 6, 5, 7, 3, 4
        key = jax.random.PRNGKey(0)
        p = sg._mod_conv_init(key, cin, cout, k, nsf)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, cin))
        style = jax.random.normal(jax.random.PRNGKey(2), (B, nsf))

        for demod in (True, False):
            got = sg._mod_conv(p, x, style, demodulate=demod)

            # reference math: per-sample weight w_b = scale * w * s_b,
            # demodulated over (kh, kw, cin), then a plain conv per sample
            w = p["weight"]
            scale = 1.0 / math.sqrt(cin * k * k)
            s = sg._eq_linear(p["modulation"], style)      # [B, cin]
            wb = scale * w[None] * s[:, None, None, :, None]
            if demod:
                d = jax.lax.rsqrt(jnp.sum(wb**2, axis=(1, 2, 3)) + 1e-8)
                wb = wb * d[:, None, None, None, :]
            ref = jnp.stack([
                jax.lax.conv_general_dilated(
                    x[b][None], wb[b], (1, 1),
                    ((k // 2, k // 2), (k // 2, k // 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
                for b in range(B)
            ])
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5)

    def test_upsample_shape(self):
        p = sg._mod_conv_init(jax.random.PRNGKey(0), 4, 6, 3, 4)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
        style = jax.random.normal(jax.random.PRNGKey(2), (2, 4))
        out = sg._mod_conv(p, x, style, up=True, smooth_kernel=(1, 3, 3, 1))
        assert out.shape == (2, 16, 16, 6)


class TestGenerator:
    def test_forward_and_mixing(self):
        cfg = sg.StyleGAN2Config.tiny()
        p = sg.init_stylegan2_generator_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_style_feat))
        img = sg.stylegan2_generator(p, cfg, [z],
                                     noise_key=jax.random.PRNGKey(2))
        assert img.shape == (2, cfg.out_size, cfg.out_size, 3)
        assert bool(jnp.isfinite(img).all())
        z2 = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.num_style_feat))
        img2 = sg.stylegan2_generator(p, cfg, [z, z2], inject_index=2)
        assert img2.shape == img.shape

    def test_truncation_pulls_to_mean(self):
        cfg = sg.StyleGAN2Config.tiny()
        p = sg.init_stylegan2_generator_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_style_feat))
        w_mean = jnp.zeros((1, cfg.num_style_feat))
        full = sg.stylegan2_generator(p, cfg, [z])
        trunc0 = sg.stylegan2_generator(
            p, cfg, [sg.style_mlp(p["style_mlp"], cfg, z)],
            input_is_latent=True, truncation=0.0, truncation_latent=w_mean)
        mean_img = sg.stylegan2_generator(p, cfg, [w_mean],
                                          input_is_latent=True)
        np.testing.assert_allclose(np.asarray(trunc0), np.asarray(mean_img),
                                   atol=1e-6)
        assert float(jnp.abs(full - mean_img).max()) > 1e-6


class TestDiscriminator:
    def test_forward(self):
        cfg = sg.StyleGAN2Config.tiny()
        p = sg.init_stylegan2_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (4, cfg.out_size, cfg.out_size, 3))
        logits = sg.stylegan2_discriminator(p, cfg, x)
        assert logits.shape == (4, 1)
        assert bool(jnp.isfinite(logits).all())

    def test_gradients(self):
        cfg = sg.StyleGAN2Config.tiny()
        p = sg.init_stylegan2_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (4, cfg.out_size, cfg.out_size, 3))
        g = jax.grad(lambda q: jnp.sum(
            sg.stylegan2_discriminator(q, cfg, x)))(p)
        assert all(bool(jnp.isfinite(l).all())
                   for l in jax.tree_util.tree_leaves(g))


class TestConverters:
    def test_generator(self):
        cfg = sg.StyleGAN2Config.tiny()
        ch, nsf = cfg.channels, cfg.num_style_feat
        sd = {}
        for i in range(cfg.num_mlp):
            sd[f"style_mlp.{i + 1}.weight"] = rng.normal(
                size=(nsf, nsf)).astype(np.float32)
            sd[f"style_mlp.{i + 1}.bias"] = np.zeros(nsf, np.float32)
        sd["constant_input.weight"] = rng.normal(
            size=(1, ch[4], 4, 4)).astype(np.float32)

        def mod_conv_sd(name, cin, cout, k):
            sd[f"{name}.weight"] = rng.normal(
                size=(1, cout, cin, k, k)).astype(np.float32)
            sd[f"{name}.modulation.weight"] = rng.normal(
                size=(cin, nsf)).astype(np.float32)
            sd[f"{name}.modulation.bias"] = np.ones(cin, np.float32)

        def style_conv_sd(name, cin, cout):
            mod_conv_sd(f"{name}.modulated_conv", cin, cout, 3)
            sd[f"{name}.weight"] = np.zeros(1, np.float32)
            sd[f"{name}.activate.bias"] = np.zeros(cout, np.float32)

        def to_rgb_sd(name, cin):
            mod_conv_sd(f"{name}.modulated_conv", cin, 3, 1)
            sd[f"{name}.bias"] = np.zeros((1, 3, 1, 1), np.float32)

        style_conv_sd("style_conv1", ch[4], ch[4])
        to_rgb_sd("to_rgb1", ch[4])
        cin = ch[4]
        gi = 0
        for i in range(3, cfg.log_size + 1):
            cout = ch[2**i]
            style_conv_sd(f"style_convs.{2 * gi}", cin, cout)
            style_conv_sd(f"style_convs.{2 * gi + 1}", cout, cout)
            to_rgb_sd(f"to_rgbs.{gi}", cout)
            cin = cout
            gi += 1
        p = sc.convert_stylegan2_generator(sd)
        init = sg.init_stylegan2_generator_params(jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, nsf))
        img = sg.stylegan2_generator(p, cfg, [z])
        assert img.shape == (1, cfg.out_size, cfg.out_size, 3)

    def test_discriminator(self):
        cfg = sg.StyleGAN2Config.tiny()
        ch = cfg.channels
        sd = {}

        def conv_sd(name, cin, cout, k, bias_name=None, conv_bias=False):
            sd[f"{name}.weight"] = rng.normal(
                size=(cout, cin, k, k)).astype(np.float32)
            if conv_bias:
                sd[f"{name}.bias"] = np.zeros(cout, np.float32)
            if bias_name:
                sd[f"{bias_name}.bias"] = np.zeros(cout, np.float32)

        conv_sd("conv_body.0.0", 3, ch[cfg.out_size], 1, "conv_body.0.1")
        cin = ch[cfg.out_size]
        bi = 1
        for i in range(cfg.log_size, 2, -1):
            cout = ch[2 ** (i - 1)]
            conv_sd(f"conv_body.{bi}.conv1.0", cin, cin, 3,
                    f"conv_body.{bi}.conv1.1")
            conv_sd(f"conv_body.{bi}.conv2.1", cin, cout, 3,
                    f"conv_body.{bi}.conv2.2")
            conv_sd(f"conv_body.{bi}.skip.1", cin, cout, 1)
            cin = cout
            bi += 1
        conv_sd("final_conv.0", cin + 1, ch[4], 3, "final_conv.1")
        sd["final_linear.0.weight"] = rng.normal(
            size=(ch[4], ch[4] * 16)).astype(np.float32)
        sd["final_linear.0.bias"] = np.zeros(ch[4], np.float32)
        sd["final_linear.1.weight"] = rng.normal(
            size=(1, ch[4])).astype(np.float32)
        sd["final_linear.1.bias"] = np.zeros(1, np.float32)
        p = sc.convert_stylegan2_discriminator(sd)
        init = sg.init_stylegan2_discriminator_params(
            jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs))
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (4, cfg.out_size, cfg.out_size, 3))
        assert sg.stylegan2_discriminator(p, cfg, x).shape == (4, 1)
