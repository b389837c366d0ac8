"""SR arch zoo (BasicSR capability: srresnet/edsr/srvgg/rcan archs +
SRGAN/ESRGAN adversarial training)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unitex_tpu.models.sr_archs import (
    EDSRConfig,
    MSRResNetConfig,
    RCANConfig,
    SRVGGConfig,
    VGGDiscriminatorConfig,
    edsr_forward,
    init_edsr_params,
    init_msrresnet_params,
    init_rcan_params,
    init_srvgg_params,
    init_vgg_discriminator_params,
    msrresnet_forward,
    pixel_shuffle,
    rcan_forward,
    srvgg_forward,
    vgg_discriminator_forward,
)
from unitex_tpu.training.sr_gan import SRGANConfig, gan_loss, make_srgan_train_step


def test_pixel_shuffle_matches_torch_order():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 3, 4, 8)).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    ref = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


ARCHS = [
    (MSRResNetConfig, init_msrresnet_params, msrresnet_forward),
    (EDSRConfig, init_edsr_params, edsr_forward),
    (SRVGGConfig, init_srvgg_params, srvgg_forward),
    (RCANConfig, init_rcan_params, rcan_forward),
]


@pytest.mark.parametrize("cfg_cls,init,fwd", ARCHS)
def test_arch_forward_shape(cfg_cls, init, fwd):
    cfg = cfg_cls.tiny()
    params = init(jax.random.PRNGKey(0), cfg)
    x = jnp.linspace(0, 1, 2 * 8 * 8 * 3).reshape(2, 8, 8, 3)
    y = jax.jit(lambda p, x: fwd(p, cfg, x))(params, x)
    assert y.shape == (2, 8 * cfg.scale, 8 * cfg.scale, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_msrresnet_scales(scale):
    cfg = MSRResNetConfig(num_feat=8, num_block=1, scale=scale)
    params = init_msrresnet_params(jax.random.PRNGKey(1), cfg)
    y = msrresnet_forward(params, cfg, jnp.zeros((1, 6, 6, 3)))
    assert y.shape == (1, 6 * scale, 6 * scale, 3)


def test_edsr_mean_shift_identity_region():
    # with zero body output the net reduces to conv chains around the
    # mean shift; just check the output stays in a sane image range
    cfg = EDSRConfig.tiny()
    params = init_edsr_params(jax.random.PRNGKey(2), cfg)
    x = 0.5 * jnp.ones((1, 8, 8, 3))
    y = edsr_forward(params, cfg, x)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("cfg_cls,init,fwd", ARCHS)
def test_arch_gradients_flow(cfg_cls, init, fwd):
    cfg = cfg_cls.tiny()
    params = init(jax.random.PRNGKey(3), cfg)
    x = jnp.ones((1, 4, 4, 3)) * 0.3
    hr = jnp.ones((1, 4 * cfg.scale, 4 * cfg.scale, 3)) * 0.6

    def loss(p):
        return jnp.mean((fwd(p, cfg, x) - hr) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


class TestDiscriminator:
    def test_logits_shape(self):
        cfg = VGGDiscriminatorConfig.tiny()
        params = init_vgg_discriminator_params(jax.random.PRNGKey(4), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(5), (2, 128, 128, 3))
        logits = jax.jit(lambda p, x: vgg_discriminator_forward(p, cfg, x))(params, x)
        assert logits.shape == (2, 1)

    def test_input_256(self):
        cfg = VGGDiscriminatorConfig(num_feat=4, input_size=256)
        params = init_vgg_discriminator_params(jax.random.PRNGKey(6), cfg)
        logits = vgg_discriminator_forward(params, cfg, jnp.zeros((1, 256, 256, 3)))
        assert logits.shape == (1, 1)


class TestGANLoss:
    def test_vanilla_is_bce(self):
        logits = jnp.asarray([0.0, 2.0, -2.0])
        # real target: -log(sigmoid(x))
        expect = float(np.mean(-np.log(1 / (1 + np.exp(-np.asarray([0.0, 2.0, -2.0]))))))
        assert float(gan_loss(logits, True, "vanilla")) == pytest.approx(expect, rel=1e-5)

    def test_lsgan(self):
        logits = jnp.asarray([0.5])
        assert float(gan_loss(logits, True, "lsgan")) == pytest.approx(0.25)
        assert float(gan_loss(logits, False, "lsgan")) == pytest.approx(0.25)

    def test_hinge_disc(self):
        logits = jnp.asarray([0.2])
        assert float(gan_loss(logits, True, "hinge", is_disc=True)) == pytest.approx(0.8)
        assert float(gan_loss(logits, False, "hinge", is_disc=True)) == pytest.approx(1.2)

    def test_wgan(self):
        logits = jnp.asarray([3.0])
        assert float(gan_loss(logits, True, "wgan")) == -3.0
        assert float(gan_loss(logits, False, "wgan")) == 3.0


class TestSRGANTraining:
    def _setup(self, relativistic=False):
        g_cfg = SRVGGConfig(num_feat=8, num_conv=1, scale=2)
        d_cfg = VGGDiscriminatorConfig(num_feat=4, input_size=128)
        g_params = init_srvgg_params(jax.random.PRNGKey(0), g_cfg)
        d_params = init_vgg_discriminator_params(jax.random.PRNGKey(1), d_cfg)
        g_opt = optax.adam(1e-4)
        d_opt = optax.adam(1e-4)
        step = make_srgan_train_step(
            lambda p, x: srvgg_forward(p, g_cfg, x),
            lambda p, x: vgg_discriminator_forward(p, d_cfg, x),
            g_opt, d_opt,
            SRGANConfig(gan_type="vanilla", relativistic=relativistic),
        )
        state = (g_params, d_params, g_opt.init(g_params), d_opt.init(d_params))
        lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
        hr = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 3))
        return step, state, lr, hr

    @pytest.mark.parametrize("relativistic", [False, True])
    def test_two_player_step_updates_both(self, relativistic):
        step, state, lr, hr = self._setup(relativistic)
        new_state, metrics = step(state, lr, hr)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        g0 = jax.tree_util.tree_leaves(state[0])
        g1 = jax.tree_util.tree_leaves(new_state[0])
        assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(g0, g1))
        d0 = jax.tree_util.tree_leaves(state[1])
        d1 = jax.tree_util.tree_leaves(new_state[1])
        assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(d0, d1))

    def test_pixel_loss_decreases(self):
        step, state, lr, hr = self._setup()
        _, m0 = step(state, lr, hr)
        for _ in range(10):
            state, m = step(state, lr, hr)
        assert float(m["l_g_pix"]) < float(m0["l_g_pix"])


def test_unsupported_scale_raises():
    with pytest.raises(ValueError):
        init_edsr_params(jax.random.PRNGKey(0), EDSRConfig(scale=5))
    with pytest.raises(ValueError):
        init_msrresnet_params(jax.random.PRNGKey(0), MSRResNetConfig(scale=5))


class TestECBSR:
    """Re-parameterizable edge-oriented blocks (ecbsr_arch.py): the
    structural multi-branch forward must equal the collapsed single-conv
    serving forward exactly (the reference's rep_params contract)."""

    @pytest.mark.parametrize("with_idt", [False, True])
    def test_reparam_parity(self, with_idt):
        from unitex_tpu.models.sr_archs import (
            ECBSRConfig, ecbsr_forward, ecbsr_forward_rep,
            ecbsr_reparameterize, init_ecbsr_params)

        cfg = ECBSRConfig(num_block=2, num_channel=8, scale=2,
                          with_idt=with_idt)
        p = init_ecbsr_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 10, 3))
        y_struct = ecbsr_forward(p, cfg, x)
        y_rep = ecbsr_forward_rep(ecbsr_reparameterize(p, cfg), cfg, x)
        assert y_struct.shape == (2, 24, 20, 3)
        np.testing.assert_allclose(np.asarray(y_struct), np.asarray(y_rep),
                                   atol=2e-5)

    def test_single_channel_shortcut(self):
        from unitex_tpu.models.sr_archs import (
            ECBSRConfig, ecbsr_forward, init_ecbsr_params)

        cfg = ECBSRConfig(num_in_ch=1, num_out_ch=1, num_block=1,
                          num_channel=4, scale=2)
        p = init_ecbsr_params(jax.random.PRNGKey(0), cfg)
        out = ecbsr_forward(p, cfg, jnp.ones((1, 8, 8, 1)))
        assert out.shape == (1, 16, 16, 1)

    def test_gradients_flow(self):
        from unitex_tpu.models.sr_archs import (
            ECBSRConfig, ecbsr_forward, init_ecbsr_params)

        cfg = ECBSRConfig.tiny()
        p = init_ecbsr_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
        g = jax.grad(lambda q: jnp.sum(ecbsr_forward(q, cfg, x) ** 2))(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestRIDNet:
    def test_forward_shape_and_residual(self):
        from unitex_tpu.models.sr_archs import (
            RIDNetConfig, init_ridnet_params, ridnet_forward)

        cfg = RIDNetConfig.tiny()
        p = init_ridnet_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 255.0
        out = ridnet_forward(p, cfg, x)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())

    def test_mean_shift_roundtrip(self):
        """sub_mean then add_mean is the identity (same eye/std kernel,
        opposite-sign bias)."""
        from unitex_tpu.models.sr_archs import RIDNetConfig, _mean_shift_params
        from unitex_tpu.models.sr_archs import _conv

        cfg = RIDNetConfig()
        sub = _mean_shift_params(cfg, -1)
        add = _mean_shift_params(cfg, 1)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 4, 3)) * 255.0
        y = _conv(add, _conv(sub, x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


class TestUNetDiscriminatorSN:
    def test_shapes_and_skip(self):
        from unitex_tpu.models import sr_archs as sa
        cfg = sa.UNetDiscriminatorConfig.tiny()
        p = sa.init_unet_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
        out = sa.unet_discriminator_forward(p, cfg, x)
        assert out.shape == (2, 16, 16, 1)
        cfg2 = sa.UNetDiscriminatorConfig(num_feat=8, skip_connection=False)
        out2 = sa.unet_discriminator_forward(p, cfg2, x)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_spectral_normalize_unit_sigma(self):
        from unitex_tpu.models.sr_archs import spectral_normalize
        rng = np.random.default_rng(0)
        kern = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 3)
        u = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        for _ in range(30):  # converge the power iteration
            kern_n, u = spectral_normalize(kern, u)
        w = np.asarray(kern_n).transpose(3, 2, 0, 1).reshape(8, -1)
        s = np.linalg.svd(w, compute_uv=False)[0]
        np.testing.assert_allclose(s, 1.0, rtol=1e-3)

    def test_update_u_changes_buffer_only(self):
        from unitex_tpu.models import sr_archs as sa
        cfg = sa.UNetDiscriminatorConfig.tiny()
        p = sa.init_unet_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
        out, p2 = sa.unet_discriminator_forward(p, cfg, x, update_u=True)
        assert not np.allclose(np.asarray(p2["conv1"]["u"]),
                               np.asarray(p["conv1"]["u"]))
        np.testing.assert_array_equal(np.asarray(p2["conv1"]["kernel"]),
                                      np.asarray(p["conv1"]["kernel"]))
        # second forward with updated buffers is deterministic
        out_b = sa.unet_discriminator_forward(p2, cfg, x)
        assert out_b.shape == out.shape

    def test_converter_structure(self):
        from unitex_tpu.models import sr_archs as sa
        from unitex_tpu.models import sr_convert as sc
        rng = np.random.default_rng(2)
        nf = 8
        sd = {"conv0.weight": rng.normal(size=(nf, 3, 3, 3)).astype(np.float32),
              "conv0.bias": np.zeros(nf, np.float32),
              "conv9.weight": rng.normal(size=(1, nf, 3, 3)).astype(np.float32),
              "conv9.bias": np.zeros(1, np.float32)}
        chans = [(nf, nf * 2, 4), (nf * 2, nf * 4, 4), (nf * 4, nf * 8, 4),
                 (nf * 8, nf * 4, 3), (nf * 4, nf * 2, 3), (nf * 2, nf, 3),
                 (nf, nf, 3), (nf, nf, 3)]
        for i, (cin, cout, k) in enumerate(chans, start=1):
            sd[f"conv{i}.weight_orig"] = rng.normal(
                size=(cout, cin, k, k)).astype(np.float32)
            sd[f"conv{i}.weight_u"] = rng.normal(size=(cout,)).astype(np.float32)
            sd[f"conv{i}.weight_v"] = rng.normal(
                size=(cin * k * k,)).astype(np.float32)
        p = sc.convert_unet_discriminator(sd)
        cfg = sa.UNetDiscriminatorConfig(num_feat=nf)
        init = sa.init_unet_discriminator_params(jax.random.PRNGKey(0), cfg)
        ps, ptree = jax.tree_util.tree_flatten(p)
        qs, qtree = jax.tree_util.tree_flatten(init)
        assert ptree == qtree
        assert all(a.shape == b.shape for a, b in zip(ps, qs))
        out = sa.unet_discriminator_forward(
            p, cfg, jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)))
        assert out.shape == (1, 16, 16, 1)


class TestSRGANExtendedState:
    def _mk(self, cfg_kwargs):
        from unitex_tpu.training.sr_gan import SRGANConfig, make_srgan_train_step
        g_params = {"w": jnp.ones((3, 3)) * 0.1}
        d_params = {"w": jnp.ones((3, 1)) * 0.1}
        g_fwd = lambda p, x: jnp.tanh(x @ p["w"])
        d_fwd = lambda p, x: x @ p["w"]
        g_opt = optax.adam(1e-2)
        d_opt = optax.adam(1e-2)
        step = make_srgan_train_step(g_fwd, d_fwd, g_opt, d_opt,
                                     SRGANConfig(**cfg_kwargs))
        state = (g_params, d_params, g_params, g_opt.init(g_params),
                 d_opt.init(d_params), jnp.int32(0))
        x = jnp.ones((2, 3)) * 0.5
        return step, state, x

    def test_net_d_init_iters_gates_g(self):
        step, state, x = self._mk({"net_d_init_iters": 1})
        s1, _ = step(state, x, x)
        np.testing.assert_array_equal(np.asarray(s1[0]["w"]),
                                      np.asarray(state[0]["w"]))
        assert not np.allclose(np.asarray(s1[1]["w"]),
                               np.asarray(state[1]["w"]))
        s2, _ = step(s1, x, x)
        assert not np.allclose(np.asarray(s2[0]["w"]), np.asarray(s1[0]["w"]))
        assert int(s2[5]) == 2

    def test_ema_tracks(self):
        step, state, x = self._mk({"ema_decay": 0.5})
        s1, _ = step(state, x, x)
        expect = 0.5 * np.asarray(state[2]["w"]) + 0.5 * np.asarray(s1[0]["w"])
        np.testing.assert_allclose(np.asarray(s1[2]["w"]), expect, rtol=1e-6)

    def test_legacy_four_tuple_still_works(self):
        from unitex_tpu.training.sr_gan import SRGANConfig, make_srgan_train_step
        g_params = {"w": jnp.ones((3, 3)) * 0.1}
        d_params = {"w": jnp.ones((3, 1)) * 0.1}
        g_opt = optax.adam(1e-2)
        d_opt = optax.adam(1e-2)
        step = make_srgan_train_step(
            lambda p, x: jnp.tanh(x @ p["w"]), lambda p, x: x @ p["w"],
            g_opt, d_opt, SRGANConfig())
        state = (g_params, d_params, g_opt.init(g_params),
                 d_opt.init(d_params))
        s1, m = step(state, jnp.ones((2, 3)), jnp.ones((2, 3)))
        assert len(s1) == 4 and np.isfinite(float(m["l_d"]))
