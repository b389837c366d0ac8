"""SRGAN/ESRGAN adversarial training (the BasicSR model capability).

The vendored BasicSR trains its SR archs with a pixel + perceptual + GAN
objective (TSD_SR/basicsr/models/srgan_model.py, esrgan_model.py;
losses in basicsr/losses/losses.py GANLoss). This module provides the
TPU-native equivalent: functional GAN losses (vanilla / lsgan / hinge /
wgan, same label conventions: real=1, fake=0) and a jittable two-player
train step over any (init, forward) arch pair from models/sr_archs.py.

ESRGAN's *relativistic* discriminator (esrgan_model.py: D(real) vs mean
D(fake)) is provided as `relativistic=True`.

Perceptual (VGG-feature) loss needs pretrained VGG19 weights that are not
bundled in this image; the hook accepts any feature_fn (e.g. a loaded VGG
or a frozen discriminator trunk) and is exercised in tests with a random
conv stack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def gan_loss(
    logits: jnp.ndarray,
    target_is_real: bool,
    gan_type: str = "vanilla",
    is_disc: bool = False,
) -> jnp.ndarray:
    """BasicSR GANLoss semantics (basicsr/losses/losses.py).

    vanilla = BCE-with-logits vs {1,0}; lsgan = MSE vs {1,0};
    wgan = signed mean; hinge = ReLU margin for D, -mean for G.
    """
    if gan_type == "vanilla":
        label = 1.0 if target_is_real else 0.0
        loss = optax.sigmoid_binary_cross_entropy(logits, label * jnp.ones_like(logits))
        return loss.mean()
    if gan_type == "lsgan":
        label = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - label) ** 2)
    if gan_type == "wgan":
        return -logits.mean() if target_is_real else logits.mean()
    if gan_type == "wgan_softplus":
        # the logistic loss StyleGAN2 trains with (gan_loss.py:80-98)
        return jax.nn.softplus(-logits).mean() if target_is_real \
            else jax.nn.softplus(logits).mean()
    if gan_type == "hinge":
        if is_disc:
            return jax.nn.relu(1.0 - logits).mean() if target_is_real else jax.nn.relu(1.0 + logits).mean()
        return -logits.mean()
    raise ValueError(f"unknown gan_type {gan_type!r}")


def perceptual_loss(
    feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
    pred: jnp.ndarray,
    target: jnp.ndarray,
    criterion: str = "l1",
) -> jnp.ndarray:
    """Feature-space distance (basicsr PerceptualLoss shape; the feature
    extractor is injected — VGG19 in the reference, any frozen net here)."""
    fp = feature_fn(pred)
    ft = jax.lax.stop_gradient(feature_fn(target))
    if criterion == "l1":
        return jnp.mean(jnp.abs(fp - ft))
    return jnp.mean((fp - ft) ** 2)


@dataclasses.dataclass(frozen=True)
class SRGANConfig:
    gan_type: str = "vanilla"
    pixel_weight: float = 1.0  # l1, basicsr pixel_opt
    gan_weight: float = 5e-3  # esrgan default (train_ESRGAN config)
    percep_weight: float = 0.0
    relativistic: bool = False  # ESRGAN: D(x_r) - E[D(x_f)]
    ema_decay: float = 0.0      # srgan_model.py net_g_ema
    net_d_iters: int = 1        # G updates every N iters ...
    net_d_init_iters: int = 0   # ... after this many D-only iters


def _relativistic_g_loss(real_logits, fake_logits, gan_type):
    # ESRGAN generator: both halves, each weighted 0.5 (esrgan_model.py)
    l_real = gan_loss(real_logits - fake_logits.mean(), False, gan_type)
    l_fake = gan_loss(fake_logits - real_logits.mean(), True, gan_type)
    return 0.5 * (l_real + l_fake)


def make_srgan_train_step(
    g_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    d_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    cfg: SRGANConfig = SRGANConfig(),
    feature_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """Returns jitted step(state, lr_batch, hr_batch) -> (new_state,
    metrics).  ``state`` is (g_params, d_params, g_opt_state,
    d_opt_state) or the 6-tuple with ``g_ema`` and a step counter
    appended — required when ema_decay/net_d_iters/net_d_init_iters are
    non-default (srgan_model.py tracks net_g_ema and gates G the same
    way).  Generator first, then discriminator on the detached fake —
    the BasicSR optimize_parameters order (srgan_model.py)."""

    def g_loss_fn(g_params, d_params, lr, hr):
        sr = g_forward(g_params, lr)
        l_pix = jnp.mean(jnp.abs(sr - hr))
        fake_logits = d_forward(d_params, sr)
        if cfg.relativistic:
            real_logits = jax.lax.stop_gradient(d_forward(d_params, hr))
            l_gan = _relativistic_g_loss(real_logits, fake_logits, cfg.gan_type)
        else:
            l_gan = gan_loss(fake_logits, True, cfg.gan_type)
        loss = cfg.pixel_weight * l_pix + cfg.gan_weight * l_gan
        if cfg.percep_weight > 0.0 and feature_fn is not None:
            loss = loss + cfg.percep_weight * perceptual_loss(feature_fn, sr, hr)
        return loss, (sr, l_pix, l_gan)

    def d_loss_fn(d_params, sr, hr):
        real_logits = d_forward(d_params, hr)
        fake_logits = d_forward(d_params, sr)
        if cfg.relativistic:
            l_real = gan_loss(
                real_logits - fake_logits.mean(), True, cfg.gan_type, is_disc=True)
            l_fake = gan_loss(
                fake_logits - real_logits.mean(), False, cfg.gan_type, is_disc=True)
        else:
            l_real = gan_loss(real_logits, True, cfg.gan_type, is_disc=True)
            l_fake = gan_loss(fake_logits, False, cfg.gan_type, is_disc=True)
        return 0.5 * (l_real + l_fake)

    extended_needed = (cfg.ema_decay > 0.0 or cfg.net_d_iters != 1
                       or cfg.net_d_init_iters != 0)

    @jax.jit
    def step(state, lr, hr):
        extended = len(state) == 6
        if extended_needed and not extended:
            raise ValueError(
                "ema_decay/net_d_iters/net_d_init_iters need the 6-tuple "
                "state (g, d, g_ema, g_opt, d_opt, step)")
        if extended:
            g_params, d_params, g_ema, g_state, d_state, it = state
        else:
            g_params, d_params, g_state, d_state = state
            g_ema, it = None, None

        (g_total, (sr, l_pix, l_gan)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, d_params, lr, hr)
        if extended:
            cur = it + 1  # basicsr iterations count from 1
            g_on = ((cur % cfg.net_d_iters == 0)
                    & (cur > cfg.net_d_init_iters)).astype(jnp.float32)
            g_grads = jax.tree_util.tree_map(lambda g: g * g_on, g_grads)
        g_updates, g_state = g_opt.update(g_grads, g_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        sr = jax.lax.stop_gradient(sr)
        d_total, d_grads = jax.value_and_grad(d_loss_fn)(d_params, sr, hr)
        d_updates, d_state = d_opt.update(d_grads, d_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        metrics = {"l_g_total": g_total, "l_g_pix": l_pix, "l_g_gan": l_gan,
                   "l_d": d_total}
        if not extended:
            return (g_params, d_params, g_state, d_state), metrics
        if cfg.ema_decay > 0.0:
            g_ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e + (1.0 - cfg.ema_decay) * p,
                g_ema, g_params)
        return (g_params, d_params, g_ema, g_state, d_state, cur), metrics

    return step


def gradient_penalty_loss(
    d_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    d_params: dict,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """WGAN-GP gradient penalty (basicsr gan_loss.py:172-208): unit
    gradient norm of D at random real/fake interpolates."""
    alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
    interp = alpha * real + (1.0 - alpha) * fake
    grad = jax.grad(lambda x: jnp.sum(d_forward(d_params, x)))(interp)
    norm = jnp.sqrt(jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)
