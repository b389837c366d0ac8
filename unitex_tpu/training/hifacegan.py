"""HiFaceGAN face-renovation training (basicsr/models/hifacegan_model.py).

The reference trains the SPADE generator against the conditional
multiscale PatchGAN with

* **conditional combined-batch discrimination** — fake and real images
  are channel-concatenated with the (resized) LQ input and fed to D in
  ONE batch so normalization statistics are shared
  (hifacegan_model.py:76-99); resizes use torch ``F.interpolate``
  defaults (nearest).
* **multiscale GAN loss** — per-scale loss on the last feature map,
  averaged over scales (gan_loss.py:116-141 MultiScaleGANLoss).
* **feature matching** — L1 between fake/real intermediate D features
  (all layers but the logit), summed over layers, averaged over scales
  (pix2pixHD-style GANFeatLoss; ``feature_matching_opt``
  hifacegan_model.py:46-48 — the loss class itself is absent from the
  vendored snapshot, semantics follow upstream basicsr).
* **G gating** — G updates only when ``iter % net_d_iters == 0`` and
  ``iter > net_d_init_iters`` (hifacegan_model.py:115-127); here a 0/1
  update multiplier so one compiled program serves every iteration.
* **D loss** ``(l_d_real + l_d_fake) / 2`` on the SRGAN-style detached
  G output (hifacegan_model.py:157-185).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .sr_gan import gan_loss, perceptual_loss

Params = Dict[str, Any]
# a multiscale prediction: per scale, the list of intermediate features
# with the patch logit map last (models/hifacegan.py discriminator)
MultiScalePred = List[List[jnp.ndarray]]


def multiscale_gan_loss(preds: MultiScalePred, target_is_real: bool,
                        gan_type: str = "hinge",
                        is_disc: bool = False) -> jnp.ndarray:
    """MultiScaleGANLoss (gan_loss.py:124-141): GAN loss on each scale's
    last tensor, averaged over scales."""
    losses = [
        gan_loss(p[-1] if isinstance(p, (list, tuple)) else p,
                 target_is_real, gan_type, is_disc=is_disc)
        for p in preds
    ]
    return sum(losses) / len(losses)


def gan_feat_loss(pred_fake: MultiScalePred, pred_real: MultiScalePred,
                  criterion: str = "l1") -> jnp.ndarray:
    """Feature-matching loss: criterion between fake and (detached) real
    intermediate features, every layer except the final logit, divided
    by the number of scales (upstream basicsr GANFeatLoss)."""
    num_d = len(pred_fake)
    loss = jnp.float32(0.0)
    for sf, sr in zip(pred_fake, pred_real):
        for f, r in zip(sf[:-1], sr[:-1]):
            r = jax.lax.stop_gradient(r)
            if criterion == "l1":
                loss = loss + jnp.mean(jnp.abs(f - r)) / num_d
            else:
                loss = loss + jnp.mean((f - r) ** 2) / num_d
    return loss


def _resize_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


@dataclasses.dataclass(frozen=True)
class HiFaceGANTrainConfig:
    gan_type: str = "hinge"
    pixel_weight: float = 0.0         # no pixel loss by default (ref comment)
    percep_weight: float = 0.0
    feat_weight: float = 10.0         # pix2pixHD/SPADE convention
    gan_weight: float = 1.0
    net_d_iters: int = 1
    net_d_init_iters: int = 0


class HiFaceGANState(NamedTuple):
    g_params: Params
    d_params: Params
    g_opt: optax.OptState
    d_opt: optax.OptState
    step: jnp.ndarray


def init_hifacegan_state(g_params: Params, d_params: Params,
                         g_opt: optax.GradientTransformation,
                         d_opt: optax.GradientTransformation
                         ) -> HiFaceGANState:
    return HiFaceGANState(g_params, d_params, g_opt.init(g_params),
                          d_opt.init(d_params), jnp.int32(0))


def make_hifacegan_train_step(
    g_forward: Callable[[Params, jnp.ndarray], jnp.ndarray],
    d_forward: Callable[[Params, jnp.ndarray], MultiScalePred],
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    cfg: HiFaceGANTrainConfig = HiFaceGANTrainConfig(),
    feature_fn: Optional[Callable[[jnp.ndarray], Sequence[jnp.ndarray]]] = None,
):
    """step(state, lq [B,h,w,3], gt [B,H,W,3]) -> (state, metrics).

    ``d_forward`` takes the 6-channel [lq ‖ image] conditional input
    (init_hifacegan_discriminator_params(conditional=True)).
    """

    def discriminate(d_params, lq, output, gt):
        h, w = output.shape[1:3]
        lq_r = _resize_nearest(lq, h, w)
        gt_r = _resize_nearest(gt, h, w)
        fake_concat = jnp.concatenate([lq_r, output], axis=-1)
        real_concat = jnp.concatenate([lq_r, gt_r], axis=-1)
        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        preds = d_forward(d_params, both)
        n = output.shape[0]
        fake = [[t[:n] for t in scale] for scale in preds]
        real = [[t[n:] for t in scale] for scale in preds]
        return fake, real

    def g_loss_fn(g_params, d_params, lq, gt):
        out = g_forward(g_params, lq)
        loss = jnp.float32(0.0)
        l_pix = jnp.float32(0.0)
        if cfg.pixel_weight > 0.0:
            l_pix = jnp.mean(jnp.abs(out - gt))
            loss = loss + cfg.pixel_weight * l_pix
        l_percep = jnp.float32(0.0)
        if cfg.percep_weight > 0.0 and feature_fn is not None:
            l_percep = perceptual_loss(feature_fn, out, gt)
            loss = loss + cfg.percep_weight * l_percep
        pred_fake, pred_real = discriminate(d_params, lq, out, gt)
        l_gan = multiscale_gan_loss(pred_fake, True, cfg.gan_type)
        loss = loss + cfg.gan_weight * l_gan
        l_feat = jnp.float32(0.0)
        if cfg.feat_weight > 0.0:
            l_feat = gan_feat_loss(pred_fake, pred_real)
            loss = loss + cfg.feat_weight * l_feat
        return loss, (out, l_pix, l_percep, l_gan, l_feat)

    def d_loss_fn(d_params, lq, out_sg, gt):
        pred_fake, pred_real = discriminate(d_params, lq, out_sg, gt)
        l_real = multiscale_gan_loss(pred_real, True, cfg.gan_type,
                                     is_disc=True)
        l_fake = multiscale_gan_loss(pred_fake, False, cfg.gan_type,
                                     is_disc=True)
        return (l_real + l_fake) / 2.0, (l_real, l_fake)

    @jax.jit
    def step(state: HiFaceGANState, lq, gt):
        cur = state.step + 1
        g_on = ((cur % cfg.net_d_iters == 0)
                & (cur > cfg.net_d_init_iters)).astype(jnp.float32)

        (_, (out, l_pix, l_percep, l_gan, l_feat)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, lq, gt))
        g_grads = jax.tree_util.tree_map(lambda g: g * g_on, g_grads)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        out_sg = jax.lax.stop_gradient(out)
        (l_d, (l_real, l_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, lq, out_sg, gt)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = {"l_g_pix": l_pix, "l_g_percep": l_percep,
                   "l_g_gan": l_gan, "l_g_feat": l_feat,
                   "l_d_real": l_real, "l_d_fake": l_fake, "l_d": l_d,
                   "g_updated": g_on}
        return HiFaceGANState(g_params, d_params, g_opt_state,
                              d_opt_state, cur), metrics

    return step
