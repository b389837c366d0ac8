"""BasicSR loss family (basicsr/losses/basic_loss.py, loss_util.py).

Weighted-reduction semantics follow the reference's ``weighted_loss``
decorator (loss_util.py:41-88): elementwise loss, optional elementwise
weight, then none/mean/sum reduction — with the reference's special case
that a weighted 'mean' divides by the weight SUM when the weight has one
channel (loss_util.py:28-38 reduce_loss + weight handling: mean over
weighted elements is sum(loss*w)/sum(w) only for the sum-of-weights path;
BasicSR's actual code divides by n_elements when weight has C channels and
by sum(weight)/C when single-channel).

PerceptualLoss here takes an injected multi-layer ``features_fn``
returning a dict of feature maps (the reference hardwires a torchvision
VGG19 — utils/lpips.py provides jnp VGG backbones whose layer activations
can be exposed); style loss uses the same Gram-matrix math
(basic_loss.py:240-253).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray],
            reduction: str) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction != "mean":
        raise ValueError(f"unknown reduction {reduction!r}")
    if weight is None:
        return jnp.mean(loss)
    # basicsr loss_util.py:78-85: single-channel weights normalize by the
    # weight sum (per channel); full-channel weights by element count
    if weight.shape[-1] == 1 and loss.shape[-1] > 1:
        return jnp.sum(loss) / (jnp.sum(weight) * loss.shape[-1] + 1e-12)
    return jnp.mean(loss)


def l1_loss(pred, target, weight=None, reduction="mean"):
    return _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, reduction="mean"):
    return _reduce((pred - target) ** 2, weight, reduction)


def charbonnier_loss(pred, target, weight=None, reduction="mean",
                     eps=1e-12):
    """Robust differentiable L1 (basic_loss.py:22-24): sqrt(d^2 + eps)."""
    return _reduce(jnp.sqrt((pred - target) ** 2 + eps), weight, reduction)


def weighted_tv_loss(pred, weight=None, reduction="mean"):
    """Total-variation on NHWC images (basic_loss.py:117-143): L1 between
    vertical and horizontal neighbor pairs, optionally masked."""
    wy = weight[:, :-1, :, :] if weight is not None else None
    wx = weight[:, :, :-1, :] if weight is not None else None
    y = l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], wy, reduction)
    x = l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], wx, reduction)
    return x + y


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, C, C] / (C*H*W) (basic_loss.py:240-253)."""
    N, H, W, C = feat.shape
    f = feat.reshape(N, H * W, C)
    return jnp.einsum("npc,npd->ncd", f, f) / (C * H * W)


def perceptual_loss(
    features_fn: Callable[[jnp.ndarray], Mapping[str, jnp.ndarray]],
    pred: jnp.ndarray,
    target: jnp.ndarray,
    layer_weights: Dict[str, float],
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
    criterion: str = "l1",
):
    """basicsr PerceptualLoss (basic_loss.py:146-238): per-layer feature
    distance + optional Gram-matrix style loss.  ``features_fn`` maps an
    image to {layer_name: [N,H,W,C] feature}.  Returns
    (perceptual, style) — each None when its weight is 0."""
    fp = features_fn(pred)
    ft = jax.tree.map(jax.lax.stop_gradient, dict(features_fn(target)))

    def dist(a, b):
        if criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if criterion == "l2":
            return jnp.mean((a - b) ** 2)
        if criterion == "fro":
            return jnp.linalg.norm((a - b).reshape(-1))
        raise ValueError(f"unknown criterion {criterion!r}")

    percep = None
    if perceptual_weight > 0:
        percep = sum(dist(fp[k], ft[k]) * w for k, w in layer_weights.items())
        percep = percep * perceptual_weight
    style = None
    if style_weight > 0:
        style = sum(dist(gram_matrix(fp[k]), gram_matrix(ft[k])) * w
                    for k, w in layer_weights.items())
        style = style * style_weight
    return percep, style
