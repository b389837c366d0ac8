"""BasicSR loss family, restart LR schedules, StyleGAN2 training step
(basicsr/losses/basic_loss.py, models/lr_scheduler.py,
models/stylegan2_model.py semantics)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unitex_tpu.training.losses import (charbonnier_loss, gram_matrix,
                                        l1_loss, mse_loss, perceptual_loss,
                                        weighted_tv_loss)
from unitex_tpu.training.schedules import (cosine_annealing_restart_lr,
                                           multistep_restart_lr)
from unitex_tpu.training.sr_gan import gan_loss, gradient_penalty_loss


class TestLosses:
    def test_charbonnier_approaches_l1(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
        np.testing.assert_allclose(
            float(charbonnier_loss(x, y, eps=1e-12)),
            float(l1_loss(x, y)), rtol=1e-4)

    def test_tv_loss_flat_image_is_zero(self):
        assert float(weighted_tv_loss(jnp.ones((1, 8, 8, 3)))) == 0.0

    def test_tv_loss_matches_manual(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 5, 2))
        got = float(weighted_tv_loss(x))
        expect = float(jnp.mean(jnp.abs(x[:, :-1] - x[:, 1:]))
                       + jnp.mean(jnp.abs(x[:, :, :-1] - x[:, :, 1:])))
        assert abs(got - expect) < 1e-6

    def test_weighted_reduction(self):
        x = jnp.ones((1, 2, 2, 3))
        y = jnp.zeros((1, 2, 2, 3))
        w = jnp.array([1.0, 1.0, 0.0, 0.0]).reshape(1, 2, 2, 1)
        # single-channel weight: mean over weighted region only
        assert abs(float(l1_loss(x, y, weight=w)) - 1.0) < 1e-5

    def test_gram_matrix(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 3, 2))
        g = gram_matrix(x)
        assert g.shape == (1, 2, 2)
        f = np.asarray(x).reshape(9, 2)
        expect = f.T @ f / (2 * 9)
        np.testing.assert_allclose(np.asarray(g[0]), expect, atol=1e-5)

    def test_perceptual_with_style(self):
        feats = lambda im: {"a": im * 2.0, "b": jnp.tanh(im)}
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
        p, s = perceptual_loss(feats, x, y, {"a": 1.0, "b": 0.5},
                               style_weight=1.0)
        assert float(p) > 0 and float(s) > 0
        p0, s0 = perceptual_loss(feats, x, x, {"a": 1.0}, style_weight=1.0)
        assert float(p0) < 1e-6 and float(s0) < 1e-6


class TestSchedules:
    def test_multistep_restart(self):
        """lr decays by gamma at milestones, resets to base*weight at
        restarts, decays again from there (lr_scheduler.py:6-33)."""
        s = multistep_restart_lr(1.0, milestones=[3, 6, 12], gamma=0.1,
                                 restarts=[0, 8], restart_weights=[1.0, 0.5])
        assert abs(float(s(0)) - 1.0) < 1e-7
        assert abs(float(s(3)) - 0.1) < 1e-7
        assert abs(float(s(6)) - 0.01) < 1e-7
        assert abs(float(s(8)) - 0.5) < 1e-7       # restart
        assert abs(float(s(12)) - 0.05) < 1e-7     # decay after restart

    def test_cosine_annealing_restart(self):
        s = cosine_annealing_restart_lr(1.0, periods=[10, 10],
                                        restart_weights=[1.0, 0.5])
        assert abs(float(s(0)) - 1.0) < 1e-6
        assert abs(float(s(5)) - 0.5) < 1e-6       # half-period
        assert float(s(10)) < 1e-6                 # end of first cycle
        assert abs(float(s(15)) - 0.25) < 1e-3     # mid second, weight 0.5

    def test_works_as_optax_schedule(self):
        s = cosine_annealing_restart_lr(1e-3, periods=[100],
                                        restart_weights=[1.0])
        opt = optax.adam(learning_rate=s)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        up, _ = opt.update({"w": jnp.ones(3)}, state, params)
        assert bool(jnp.isfinite(up["w"]).all())


class TestStyleGAN2Training:
    def test_five_steps_with_lazy_regularization(self):
        from unitex_tpu.models.stylegan2 import (
            StyleGAN2Config, init_stylegan2_discriminator_params,
            init_stylegan2_generator_params)
        from unitex_tpu.training.stylegan2 import (
            StyleGAN2TrainConfig, make_stylegan2_train_step)

        cfg = StyleGAN2Config.tiny()
        gp = init_stylegan2_generator_params(jax.random.PRNGKey(0), cfg)
        dp = init_stylegan2_discriminator_params(jax.random.PRNGKey(1), cfg)
        tcfg = StyleGAN2TrainConfig(net_g_reg_every=2, net_d_reg_every=3)
        init_state, step = make_stylegan2_train_step(
            cfg, optax.adam(1e-3), optax.adam(1e-3), tcfg)
        state = init_state(gp, dp)
        real = jax.random.normal(jax.random.PRNGKey(2),
                                 (4, cfg.out_size, cfg.out_size, 3))
        path_lens = []
        for i in range(4):
            state, m = step(state, real, jax.random.PRNGKey(10))
            assert all(bool(jnp.isfinite(v).all()) for v in m.values())
            path_lens.append(float(m["path_length"]))
        # lazy path regularization fires on steps 0 and 2 only
        assert path_lens[0] > 0 and path_lens[2] > 0
        assert path_lens[1] == 0 and path_lens[3] == 0
        # params actually moved and EMA tracks them
        g_params, _, _, _, g_ema, mean_pl, it = state
        assert int(it) == 4 and float(mean_pl) > 0

    def test_r1_penalty_positive(self):
        from unitex_tpu.models.stylegan2 import (
            StyleGAN2Config, init_stylegan2_discriminator_params,
            stylegan2_discriminator)
        from unitex_tpu.training.stylegan2 import r1_penalty

        cfg = StyleGAN2Config.tiny()
        dp = init_stylegan2_discriminator_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (4, cfg.out_size, cfg.out_size, 3))
        pen = r1_penalty(
            lambda p, im: stylegan2_discriminator(p, cfg, im), dp, x)
        assert float(pen) > 0 and np.isfinite(float(pen))


class TestWGANGP:
    def test_gradient_penalty_for_linear_d_is_exact(self):
        """For D(x) = <w, x>, the gradient is w everywhere, so the penalty
        is (|w| - 1)^2 independent of the interpolate."""
        w = jnp.full((4, 4, 3), 0.5)
        d_forward = lambda p, x: jnp.sum(x * p["w"], axis=(1, 2, 3))
        real = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        fake = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
        pen = gradient_penalty_loss(
            d_forward, {"w": w}, real, fake, jax.random.PRNGKey(2))
        norm = math.sqrt(4 * 4 * 3 * 0.25)
        assert abs(float(pen) - (norm - 1.0) ** 2) < 1e-4

    def test_wgan_softplus_labels(self):
        logits = jnp.array([2.0, -1.0])
        lr = float(gan_loss(logits, True, "wgan_softplus"))
        lf = float(gan_loss(logits, False, "wgan_softplus"))
        expect_r = float(jnp.mean(jnp.log1p(jnp.exp(-logits))))
        expect_f = float(jnp.mean(jnp.log1p(jnp.exp(logits))))
        assert abs(lr - expect_r) < 1e-5 and abs(lf - expect_f) < 1e-5
