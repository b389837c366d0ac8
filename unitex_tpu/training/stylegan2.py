"""StyleGAN2 training (basicsr/models/stylegan2_model.py semantics).

One jitted two-player step with the reference's lazy regularization:
logistic (wgan_softplus) GAN losses every step; R1 gradient penalty on
the discriminator every ``d_reg_every`` steps and path-length
regularization on the generator every ``g_reg_every`` steps (applied via
lax.cond on the step counter — both branches compile once).  Style
mixing with probability ``mixing_prob`` is expressed as a per-layer
latent select (jit-friendly; same distribution as the reference's
python-level branch, stylegan2_model.py:178-183).  Generator EMA follows
the reference decay 0.5**(32/10000) (stylegan2_model.py:255).

The reference's lazy-regularization optimizer rescaling (lr and betas
scaled by reg_every/(reg_every+1), stylegan2_model.py:128-131) is the
caller's choice when building the optax optimizers.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.stylegan2 import (StyleGAN2Config, style_mlp,
                                stylegan2_discriminator, stylegan2_generator)


def r1_penalty(d_forward, d_params, real_img: jnp.ndarray) -> jnp.ndarray:
    """R1: squared gradient norm of D at real data
    (basicsr/losses/gan_loss.py:143-157)."""
    grad = jax.grad(lambda img: jnp.sum(d_forward(d_params, img)))(real_img)
    return jnp.mean(jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1))


def g_path_regularize(grad_wrt_latents: jnp.ndarray,
                      mean_path_length: jnp.ndarray, decay: float = 0.01):
    """Path-length penalty from the Jacobian-vector product's gradient
    (gan_loss.py:160-169).  grad_wrt_latents [B, num_latent, D]."""
    path_lengths = jnp.sqrt(
        jnp.mean(jnp.sum(grad_wrt_latents ** 2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
    return penalty, jnp.mean(path_lengths), jax.lax.stop_gradient(path_mean)


def wgan_softplus_loss(logits: jnp.ndarray, target_is_real: bool):
    """The logistic GAN loss StyleGAN2 trains with (gan_loss.py
    'wgan_softplus'): softplus(-x) for real, softplus(x) for fake."""
    x = -logits if target_is_real else logits
    return jnp.mean(jax.nn.softplus(x))


@dataclasses.dataclass(frozen=True)
class StyleGAN2TrainConfig:
    r1_reg_weight: float = 10.0
    path_reg_weight: float = 2.0
    net_g_reg_every: int = 4
    net_d_reg_every: int = 16
    mixing_prob: float = 0.9
    path_batch_shrink: int = 2
    ema_decay: float = 0.5 ** (32 / (10 * 1000))


def _sample_latent(g_params, cfg: StyleGAN2Config, tcfg: StyleGAN2TrainConfig,
                   key, batch):
    """Mixed per-layer latent [B, num_latent, D]: two MLP-mapped codes,
    switched at a random injection index with prob mixing_prob."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z = jax.random.normal(k1, (2, batch, cfg.num_style_feat))
    w = jax.vmap(lambda zz: style_mlp(g_params["style_mlp"], cfg, zz))(z)
    mix = jax.random.bernoulli(k3, tcfg.mixing_prob)
    inject = jax.random.randint(k4, (), 1, cfg.num_latent)
    idx_eff = jnp.where(mix, inject, cfg.num_latent)
    layer = jnp.arange(cfg.num_latent)
    return jnp.where(layer[None, :, None] < idx_eff, w[0][:, None], w[1][:, None])


def make_stylegan2_train_step(
    cfg: StyleGAN2Config,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    tcfg: StyleGAN2TrainConfig = StyleGAN2TrainConfig(),
):
    """Returns (init_state, step).  step(state, real_img [B,S,S,3] in
    [-1,1], key) -> (state, metrics); state carries both players' params/
    opt states, the EMA generator, the running mean path length, and the
    step counter (stylegan2_model.py:185-255 order: D, lazy R1, G, lazy
    path)."""

    def g_forward(g_params, latent, noise_key, batch):
        noise = [jax.random.normal(jax.random.fold_in(noise_key, li),
                                   (batch, 2 ** ((li + 5) // 2),
                                    2 ** ((li + 5) // 2), 1))
                 for li in range(cfg.num_layers)]
        return stylegan2_generator(g_params, cfg, [latent],
                                   input_is_latent=True, noise=noise)

    def step(state, real_img, key):
        (g_params, d_params, g_state, d_state, g_ema, mean_pl, it) = state
        B = real_img.shape[0]
        kd, kg, kp, kn1, kn2, kn3 = jax.random.split(jax.random.fold_in(key, it), 6)

        # ---- discriminator
        latent = _sample_latent(g_params, cfg, tcfg, kd, B)
        fake = jax.lax.stop_gradient(g_forward(g_params, latent, kn1, B))

        def d_loss_fn(dp):
            return (wgan_softplus_loss(stylegan2_discriminator(dp, cfg, fake), False)
                    + wgan_softplus_loss(stylegan2_discriminator(dp, cfg, real_img), True))

        l_d, d_grads = jax.value_and_grad(d_loss_fn)(d_params)

        def add_r1(grads):
            def r1_loss(dp):
                pen = r1_penalty(
                    lambda p, x: stylegan2_discriminator(p, cfg, x),
                    dp, real_img)
                return tcfg.r1_reg_weight / 2 * pen * tcfg.net_d_reg_every
            r1_grads = jax.grad(r1_loss)(d_params)
            return jax.tree.map(jnp.add, grads, r1_grads)

        d_grads = jax.lax.cond(it % tcfg.net_d_reg_every == 0,
                               add_r1, lambda g: g, d_grads)
        d_updates, d_state = d_opt.update(d_grads, d_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        # ---- generator
        latent = _sample_latent(g_params, cfg, tcfg, kg, B)

        def g_loss_fn(gp):
            img = g_forward(gp, latent, kn2, B)
            return wgan_softplus_loss(
                stylegan2_discriminator(d_params, cfg, img), True)

        l_g, g_grads = jax.value_and_grad(g_loss_fn)(g_params)

        pb = max(1, B // tcfg.path_batch_shrink)
        path_latent = _sample_latent(g_params, cfg, tcfg, kp, pb)

        def path_state(gp):
            # the reference differentiates sum(fake * noise) wrt the
            # latents (a randomized JVP estimate of the Jacobian norm,
            # gan_loss.py:160-163), then penalizes the deviation from the
            # running mean and backprops that through the generator
            def jvp_target(gpp, lat):
                img = g_forward(gpp, lat, kn3, pb)
                noise = jax.random.normal(
                    jax.random.fold_in(kn3, 999), img.shape) / math.sqrt(
                        img.shape[1] * img.shape[2])
                return jnp.sum(img * noise)

            def path_loss(gpp):
                grad_lat = jax.grad(
                    lambda l: jvp_target(gpp, l))(path_latent)
                pen, pl, new_mean = g_path_regularize(grad_lat, mean_pl)
                return tcfg.path_reg_weight * tcfg.net_g_reg_every * pen, \
                    (pl, new_mean)

            (_, (pl, new_mean)), pgrads = jax.value_and_grad(
                path_loss, has_aux=True)(gp)
            return pgrads, pl, new_mean

        def add_path(args):
            grads, mpl = args
            pgrads, pl, new_mean = path_state(g_params)
            return jax.tree.map(jnp.add, grads, pgrads), new_mean, pl

        def no_path(args):
            grads, mpl = args
            return grads, mpl, jnp.zeros(())

        g_grads, mean_pl, path_len = jax.lax.cond(
            it % tcfg.net_g_reg_every == 0, add_path, no_path,
            (g_grads, mean_pl))
        g_updates, g_state = g_opt.update(g_grads, g_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        d = tcfg.ema_decay
        g_ema = jax.tree.map(lambda e, p: e * d + p * (1 - d), g_ema, g_params)

        metrics = {"l_d": l_d, "l_g": l_g, "path_length": path_len,
                   "mean_path_length": mean_pl}
        return (g_params, d_params, g_state, d_state, g_ema, mean_pl,
                it + 1), metrics

    def init_state(g_params, d_params):
        return (g_params, d_params, g_opt.init(g_params),
                d_opt.init(d_params), jax.tree.map(jnp.array, g_params),
                jnp.zeros(()), jnp.zeros((), jnp.int32))

    return init_state, jax.jit(step)
