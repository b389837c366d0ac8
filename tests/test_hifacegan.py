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


class TestHiFaceGANTraining:
    def _setup(self, cfg=None):
        from unitex_tpu.training import hifacegan as ht
        import optax
        rng = np.random.default_rng(11)

        def rand(*s):
            return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)

        g_params = {"w": rand(3, 3)}

        def g_forward(p, lq):
            return jnp.tanh(lq @ p["w"]) * 0.5 + 0.5

        # toy conditional multiscale D: 2 scales, 2 layers each (feat, logit)
        d_params = {"w1": rand(6, 4), "w2": rand(4, 1),
                    "v1": rand(6, 4), "v2": rand(4, 1)}

        def d_forward(p, x6):
            f1 = jnp.tanh(x6 @ p["w1"])
            s1 = [f1, f1 @ p["w2"]]
            x2 = x6[:, ::2, ::2]
            f2 = jnp.tanh(x2 @ p["v1"])
            s2 = [f2, f2 @ p["v2"]]
            return [s1, s2]

        cfg = cfg or ht.HiFaceGANTrainConfig()
        g_opt = optax.adam(1e-3)
        d_opt = optax.adam(1e-3)
        step = ht.make_hifacegan_train_step(
            g_forward, d_forward, g_opt, d_opt, cfg)
        state = ht.init_hifacegan_state(g_params, d_params, g_opt, d_opt)
        lq = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        return ht, step, state, lq, gt

    def test_step_runs_and_losses_finite(self):
        ht, step, state, lq, gt = self._setup()
        s1, m = step(state, lq, gt)
        for k in ("l_g_gan", "l_g_feat", "l_d_real", "l_d_fake", "l_d"):
            assert np.isfinite(float(m[k])), k
        assert float(m["g_updated"]) == 1.0
        assert not np.allclose(np.asarray(s1.g_params["w"]),
                               np.asarray(state.g_params["w"]))
        assert not np.allclose(np.asarray(s1.d_params["w1"]),
                               np.asarray(state.d_params["w1"]))

    def test_net_d_init_iters_gates_g(self):
        from unitex_tpu.training import hifacegan as htm
        cfg = htm.HiFaceGANTrainConfig(net_d_init_iters=1)
        _, step, state, lq, gt = self._setup(cfg)
        s1, m1 = step(state, lq, gt)
        assert float(m1["g_updated"]) == 0.0
        np.testing.assert_array_equal(np.asarray(s1.g_params["w"]),
                                      np.asarray(state.g_params["w"]))
        # D still updated
        assert not np.allclose(np.asarray(s1.d_params["w1"]),
                               np.asarray(state.d_params["w1"]))
        s2, m2 = step(s1, lq, gt)
        assert float(m2["g_updated"]) == 1.0
        assert not np.allclose(np.asarray(s2.g_params["w"]),
                               np.asarray(s1.g_params["w"]))

    def test_feat_loss_excludes_logit_and_detaches_real(self):
        from unitex_tpu.training import hifacegan as ht
        f = [[jnp.ones((2, 4)), jnp.full((2, 1), 100.0)]]
        r = [[jnp.zeros((2, 4)), jnp.zeros((2, 1))]]
        # logit layer (diff 100) must not contribute
        np.testing.assert_allclose(float(ht.gan_feat_loss(f, r)), 1.0)

    def test_multiscale_gan_loss_uses_last_and_averages(self):
        from unitex_tpu.training import hifacegan as ht
        preds = [[jnp.zeros((2, 4)), jnp.full((2, 1), 2.0)],
                 [jnp.full((2, 1), 4.0)]]
        # hinge G loss: -mean(logit) per scale -> (-2 + -4)/2 = -3
        got = float(ht.multiscale_gan_loss(preds, True, "hinge"))
        np.testing.assert_allclose(got, -3.0)
