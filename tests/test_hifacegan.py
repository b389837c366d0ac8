"""HiFaceGAN (basicsr/archs/hifacegan_arch.py): SPADE generator with LIP
encoder, multiscale PatchGAN discriminator, spectral-norm-resolving
converter."""

import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.models import hifacegan as hf
from unitex_tpu.models import sr_convert as sc

rng = np.random.default_rng(0)


class TestGenerator:
    def test_forward_shape_and_range(self):
        cfg = hf.HiFaceGANConfig.tiny()
        p = hf.init_hifacegan_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
        out = hf.hifacegan_generator(p, cfg, x)
        assert out.shape == (1, 64, 64, 3)
        assert bool(jnp.isfinite(out).all())
        assert float(jnp.abs(out).max()) <= 1.0       # tanh output

    def test_spade_modulates_by_guidance(self):
        """Different guidance maps must change the output (the SPADE path
        is live)."""
        cfg = hf.HiFaceGANConfig.tiny()
        p = hf.init_hifacegan_params(jax.random.PRNGKey(0), cfg)
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
        assert float(jnp.abs(hf.hifacegan_generator(p, cfg, a)
                             - hf.hifacegan_generator(p, cfg, b)).max()) > 1e-6


class TestLIP:
    def test_lip_pool_halves_and_interpolates(self):
        """With zero logits, LIP reduces to a plain ratio-of-averages =
        local mean; output is the 3x3 s2 average pool."""
        lip = {"conv": {"kernel": jnp.zeros((3, 3, 2, 2))},
               "in_scale": jnp.zeros((2,)), "in_offset": jnp.zeros((2,))}
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 2))
        out = hf._lip_pool(x, lip)
        assert out.shape == (1, 4, 4, 2)
        # interior: plain 3x3 mean (uniform weights cancel)
        expect = jnp.mean(x[0, 1:4, 1:4], axis=(0, 1))
        np.testing.assert_allclose(np.asarray(out[0, 1, 1]),
                                   np.asarray(expect), atol=1e-5)


class TestDiscriminator:
    def test_multiscale_outputs(self):
        cfg = hf.HiFaceGANConfig.tiny()
        p = hf.init_hifacegan_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 6))
        result = hf.hifacegan_discriminator(p, cfg, x)
        assert len(result) == cfg.num_d
        for feats in result:
            assert feats[-1].shape[-1] == 1           # patch logit map
            assert all(bool(jnp.isfinite(f).all()) for f in feats)
        # second scale sees a half-size input
        assert result[1][-1].shape[1] < result[0][-1].shape[1]


class TestConverter:
    def test_spectral_resolution(self):
        """Resolved weight must have sigma(W) scaled so u^T W v == 1 with
        the stored vectors."""
        w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
        u = rng.normal(size=(8,)).astype(np.float32)
        v = rng.normal(size=(4 * 9,)).astype(np.float32)
        sd = {"c.weight_orig": w, "c.weight_u": u, "c.weight_v": v,
              "c.bias": np.zeros(8, np.float32)}
        resolved = sc._c_sn(sd, "c")
        wm = np.transpose(np.asarray(resolved["kernel"]), (3, 2, 0, 1))
        sigma_after = float(u @ wm.reshape(8, -1) @ v)
        assert abs(sigma_after - 1.0) < 1e-4

    def test_generator_structure(self):
        cfg = hf.HiFaceGANConfig.tiny()
        nf = cfg.num_feat
        sd = {}

        def conv_sd(name, cin, cout, k=3, bias=True, spectral=False):
            if spectral:
                sd[f"{name}.weight_orig"] = rng.normal(
                    size=(cout, cin, k, k)).astype(np.float32) * 0.05
                sd[f"{name}.weight_u"] = rng.normal(size=(cout,)).astype(np.float32)
                sd[f"{name}.weight_v"] = rng.normal(
                    size=(cin * k * k,)).astype(np.float32)
            else:
                sd[f"{name}.weight"] = rng.normal(
                    size=(cout, cin, k, k)).astype(np.float32) * 0.05
            if bias:
                sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        def spade_sd(name, norm_nc):
            nh = 128 if norm_nc > 128 else norm_nc
            conv_sd(f"{name}.mlp_shared.0", 3, nh)
            conv_sd(f"{name}.mlp_gamma", nh, norm_nc, bias=False)
            conv_sd(f"{name}.mlp_beta", nh, norm_nc, bias=False)

        def resblock_sd(name, fin, fout):
            fmid = min(fin, fout)
            conv_sd(f"{name}.conv_0", fin, fmid, spectral=True)
            conv_sd(f"{name}.conv_1", fmid, fout, spectral=True)
            spade_sd(f"{name}.norm_0", fin)
            spade_sd(f"{name}.norm_1", fmid)
            if fin != fout:
                conv_sd(f"{name}.conv_s", fin, fout, k=1, bias=False,
                        spectral=True)
                spade_sd(f"{name}.norm_s", fin)

        # LIP encoder sequential
        conv_sd("lip_encoder.model.0", 3, nf, bias=False)
        cur = 1
        for i in range(5):
            nxt = min(cur * 2, 16)
            base = f"lip_encoder.model.{3 + 4 * i}"
            conv_sd(f"{base}.logit.0", nf * cur, nf * cur, bias=False)
            sd[f"{base}.logit.1.weight"] = np.ones(nf * cur, np.float32)
            sd[f"{base}.logit.1.bias"] = np.zeros(nf * cur, np.float32)
            conv_sd(f"lip_encoder.model.{4 + 4 * i}", nf * cur, nf * nxt)
            cur = nxt
        resblock_sd("head_0", 16 * nf, 16 * nf)
        resblock_sd("g_middle_0", 16 * nf, 16 * nf)
        resblock_sd("g_middle_1", 16 * nf, 16 * nf)
        for i, (fi, fo) in enumerate(((16, 8), (8, 4), (4, 2), (2, 1))):
            resblock_sd(f"ups.{i}", fi * nf, fo * nf)
        for i, fo in enumerate((8, 4, 2, 1)):
            conv_sd(f"to_rgbs.{i}", fo * nf, 3)
        conv_sd("fc", 3, 16 * nf)                     # unused base-class head
        p = sc.convert_hifacegan(sd)
        init = hf.init_hifacegan_params(jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs))
        out = hf.hifacegan_generator(
            p, cfg, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)))
        assert out.shape == (1, 64, 64, 3)

    def test_discriminator_structure(self):
        cfg = hf.HiFaceGANConfig.tiny()
        nf = cfg.num_feat
        sd = {}
        for d in range(cfg.num_d):
            base = f"discriminator_{d}"
            sd[f"{base}.model0.0.weight"] = rng.normal(
                size=(nf, 6, 4, 4)).astype(np.float32)
            sd[f"{base}.model0.0.bias"] = np.zeros(nf, np.float32)
            c = nf
            for n in range(1, cfg.n_layers_d):
                c2 = min(c * 2, 512)
                sd[f"{base}.model{n}.0.0.weight_orig"] = rng.normal(
                    size=(c2, c, 4, 4)).astype(np.float32)
                sd[f"{base}.model{n}.0.0.weight_u"] = rng.normal(
                    size=(c2,)).astype(np.float32)
                sd[f"{base}.model{n}.0.0.weight_v"] = rng.normal(
                    size=(c * 16,)).astype(np.float32)
                c = c2
            sd[f"{base}.model{cfg.n_layers_d}.0.weight"] = rng.normal(
                size=(1, c, 4, 4)).astype(np.float32)
            sd[f"{base}.model{cfg.n_layers_d}.0.bias"] = np.zeros(1, np.float32)
        p = sc.convert_hifacegan_discriminator(sd)
        init = hf.init_hifacegan_discriminator_params(jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs)
                   if hasattr(a, "shape"))  # skip the bool "in" markers
        out = hf.hifacegan_discriminator(
            p, cfg, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 6)))
        assert out[0][-1].shape[-1] == 1
