"""Real-ESRGAN / Real-ESRNet training (basicsr/models/realesrgan_model.py,
realesrnet_model.py): GAN fine-tuning (and its L1-only pretraining stage)
on synthetically degraded pairs from
:mod:`unitex_tpu.training.degradations`.

One jitted two-player step mirrors ``optimize_parameters``
(realesrgan_model.py:193-267): generator L1 + perceptual + GAN against
the (optionally USM-sharpened) GT, optional LDL artifact-weighted L1
against a generator-EMA output, then the discriminator on the detached
fake; generator EMA update last.  The degradation synthesis itself stays
outside the jit (host-orchestrated random shapes) — feed `lq`/`gt`
batches from `synthesize_lq` + `PairPool`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .sr_gan import gan_loss, perceptual_loss


def local_variance(x: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """Unbiased variance in a ksize x ksize reflect-padded window per
    pixel (basicsr loss_util.get_local_weights)."""
    p = (ksize - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")

    def win_sum(v):
        return jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, ksize, ksize, 1), (1, 1, 1, 1),
            "VALID")

    n = ksize * ksize
    mean = win_sum(xp) / n
    sq = win_sum(xp * xp) / n
    return (sq - mean * mean) * (n / (n - 1))


def get_refined_artifact_map(gt: jnp.ndarray, sr: jnp.ndarray,
                             sr_ema: jnp.ndarray,
                             ksize: int = 7) -> jnp.ndarray:
    """LDL pixel weights (loss_util.get_refined_artifact_map, used at
    realesrgan_model.py:223): (batch-variance of |gt-sr|)^0.2 x (local
    window variance)^0.2, zeroed where the EMA model already fits
    better."""
    res_ema = jnp.sum(jnp.abs(gt - sr_ema), axis=-1, keepdims=True)
    res_sr = jnp.sum(jnp.abs(gt - sr), axis=-1, keepdims=True)
    patch_w = jnp.var(res_sr, axis=(1, 2, 3), keepdims=True) ** 0.2
    pixel_w = local_variance(res_sr, ksize) ** 0.2
    overall = patch_w * pixel_w
    return jnp.where(res_sr < res_ema, 0.0, overall)


@dataclasses.dataclass(frozen=True)
class RealESRGANConfig:
    gan_type: str = "vanilla"
    pixel_weight: float = 1.0
    gan_weight: float = 0.1          # x4plus finetune config
    percep_weight: float = 1.0
    ldl_weight: float = 0.0          # Real-ESRGAN+LDL variant
    ema_decay: float = 0.999
    l1_gt_usm: bool = True           # which GTs are sharpened
    percep_gt_usm: bool = True
    gan_gt_usm: bool = False


class RealESRGANState(NamedTuple):
    g_params: dict
    d_params: dict
    g_ema: dict
    g_opt: optax.OptState
    d_opt: optax.OptState


def make_realesrgan_train_step(
    g_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    d_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    cfg: RealESRGANConfig = RealESRGANConfig(),
    feature_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """step(state, lq, gt, gt_usm) -> (state, metrics), jitted."""

    def g_loss_fn(g_params, d_params, g_ema, lq, gt, gt_usm):
        sr = g_forward(g_params, lq)
        l1_gt = gt_usm if cfg.l1_gt_usm else gt
        percep_gt = gt_usm if cfg.percep_gt_usm else gt
        l_pix = jnp.mean(jnp.abs(sr - l1_gt))
        loss = cfg.pixel_weight * l_pix
        l_ldl = jnp.float32(0.0)
        if cfg.ldl_weight > 0.0:
            sr_ema = jax.lax.stop_gradient(g_forward(g_ema, lq))
            w = jax.lax.stop_gradient(
                get_refined_artifact_map(gt, sr, sr_ema))
            l_ldl = jnp.mean(jnp.abs(w * sr - w * gt))
            loss = loss + cfg.ldl_weight * l_ldl
        if cfg.percep_weight > 0.0 and feature_fn is not None:
            loss = loss + cfg.percep_weight * perceptual_loss(
                feature_fn, sr, percep_gt)
        l_gan = gan_loss(d_forward(d_params, sr), True, cfg.gan_type)
        loss = loss + cfg.gan_weight * l_gan
        return loss, (sr, l_pix, l_gan, l_ldl)

    def d_loss_fn(d_params, sr, gan_gt):
        l_real = gan_loss(d_forward(d_params, gan_gt), True, cfg.gan_type,
                          is_disc=True)
        l_fake = gan_loss(d_forward(d_params, sr), False, cfg.gan_type,
                          is_disc=True)
        return l_real + l_fake, (l_real, l_fake)

    @jax.jit
    def step(state: RealESRGANState, lq, gt, gt_usm):
        (g_total, (sr, l_pix, l_gan, l_ldl)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.d_params,
                                     state.g_ema, lq, gt, gt_usm)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        gan_gt = gt_usm if cfg.gan_gt_usm else gt
        sr = jax.lax.stop_gradient(sr)
        (d_total, (l_real, l_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, sr, gan_gt)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        g_ema = jax.tree_util.tree_map(
            lambda e, p: cfg.ema_decay * e + (1.0 - cfg.ema_decay) * p,
            state.g_ema, g_params)
        metrics = {"l_g_total": g_total, "l_g_pix": l_pix,
                   "l_g_gan": l_gan, "l_g_ldl": l_ldl,
                   "l_d_real": l_real, "l_d_fake": l_fake}
        return RealESRGANState(g_params, d_params, g_ema, g_opt_state,
                               d_opt_state), metrics

    return step


def make_realesrnet_train_step(
    g_forward: Callable[[dict, jnp.ndarray], jnp.ndarray],
    g_opt: optax.GradientTransformation,
    ema_decay: float = 0.999,
    gt_usm: bool = True,
):
    """Real-ESRNet pretraining (realesrnet_model.py): plain L1 to the
    (USM'd) GT with generator EMA — the stage-1 recipe before GAN
    fine-tuning.  step((params, ema, opt_state), lq, gt, gt_usm)."""

    def loss_fn(params, lq, target):
        return jnp.mean(jnp.abs(g_forward(params, lq) - target))

    @jax.jit
    def step(state, lq, gt, gt_sharp):
        params, ema, opt_state = state
        target = gt_sharp if gt_usm else gt
        loss, grads = jax.value_and_grad(loss_fn)(params, lq, target)
        updates, opt_state = g_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)
        return (params, ema, opt_state), {"l_pix": loss}

    return step
