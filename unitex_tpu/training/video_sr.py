"""Video-SR training (basicsr/models/video_base_model.py,
video_recurrent_model.py, video_gan_model.py,
video_recurrent_gan_model.py).

The reference's model classes are training orchestration around the
video archs; the behaviors that matter are

* **fix-flow warmup** — spynet/edvr submodules frozen for the first
  ``fix_flow_iter`` iterations (video_recurrent_model.py:52-63): here a
  step-counted gate that zeroes flow-labeled gradients inside the jit.
  The moments of a fresh optimizer stay zero under zero gradients, so
  the frozen window matches requires_grad_(False) exactly when training
  starts from iteration 0.
* **flow lr multiplier** — separate learning rate for flow params
  (video_recurrent_model.py:22-48): ``optax.multi_transform`` over a
  'flow'/'normal' label tree.
* **recurrent GAN step** — frames flattened to (b·n) images for
  D/perceptual, G updated only every ``net_d_iters`` after
  ``net_d_init_iters`` (video_recurrent_gan_model.py:105-180): the gate
  becomes a multiplier on the G update so one compiled program serves
  every iteration.
* **temporal self-ensemble test** — ``flip_seq`` forward+reversed
  averaging and ``center_frame_only`` (video_recurrent_model.py:178-197).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .sr_gan import gan_loss, perceptual_loss

Params = Dict[str, Any]

FLOW_KEYS: Tuple[str, ...] = ("spynet", "edvr")


# ---------------------------------------------------------------------------
# Flow-param labeling / optimizer assembly
# ---------------------------------------------------------------------------

def flow_param_labels(params: Params,
                      flow_keys: Sequence[str] = FLOW_KEYS) -> Params:
    """Label tree: 'flow' for subtrees whose top-level key names a flow
    module (the reference matches 'spynet'/'edvr' substrings in param
    names), 'normal' elsewhere."""
    def label(k):
        return "flow" if any(f in k for f in flow_keys) else "normal"
    return {
        k: jax.tree_util.tree_map(lambda _: label(k), v)
        for k, v in params.items()
    }


def make_video_optimizer(lr, flow_lr_mul: float, params: Params,
                         b1: float = 0.9, b2: float = 0.99,
                         flow_keys: Sequence[str] = FLOW_KEYS
                         ) -> optax.GradientTransformation:
    """Adam with a scaled flow-group learning rate
    (video_recurrent_model.py:22-48; BasicVSR configs use
    flow_lr_mul=0.125, betas (0.9, 0.99))."""
    if flow_lr_mul == 1.0:
        return optax.adam(lr, b1=b1, b2=b2)
    labels = flow_param_labels(params, flow_keys)

    def scaled(mul):
        if callable(lr):
            return optax.adam(lambda s: lr(s) * mul, b1=b1, b2=b2)
        return optax.adam(lr * mul, b1=b1, b2=b2)

    return optax.multi_transform(
        {"normal": scaled(1.0), "flow": scaled(flow_lr_mul)}, labels)


def _freeze_flow_grads(grads: Params, step: jnp.ndarray, fix_flow_iter: int,
                       flow_keys: Sequence[str] = FLOW_KEYS) -> Params:
    """Zero flow-labeled grads while step < fix_flow_iter."""
    if fix_flow_iter <= 0:
        return grads
    live = (step >= fix_flow_iter).astype(jnp.float32)
    return {
        k: (jax.tree_util.tree_map(lambda g: g * live, v)
            if any(f in k for f in flow_keys) else v)
        for k, v in grads.items()
    }


# ---------------------------------------------------------------------------
# Recurrent (pixel-loss) training — VideoRecurrentModel
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VideoRecurrentConfig:
    fix_flow_iter: int = 5000
    pixel_loss: str = "charbonnier"   # BasicVSR configs
    charbonnier_eps: float = 1e-12


class VideoTrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray


def _pixel_loss(kind: str, eps: float, pred, gt):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - gt))
    if kind == "mse":
        return jnp.mean((pred - gt) ** 2)
    return jnp.mean(jnp.sqrt((pred - gt) ** 2 + eps))


def make_video_recurrent_train_step(
    g_forward: Callable[[Params, jnp.ndarray], jnp.ndarray],
    opt: optax.GradientTransformation,
    cfg: VideoRecurrentConfig = VideoRecurrentConfig(),
):
    """step(state, lq [B,N,H,W,3], gt [B,N,sH,sW,3]) -> (state, metrics)."""

    def loss_fn(params, lq, gt):
        return _pixel_loss(cfg.pixel_loss, cfg.charbonnier_eps,
                           g_forward(params, lq), gt)

    @jax.jit
    def step(state: VideoTrainState, lq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, lq, gt)
        grads = _freeze_flow_grads(grads, state.step, cfg.fix_flow_iter)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (VideoTrainState(params, opt_state, state.step + 1),
                {"l_pix": loss})

    return step


# ---------------------------------------------------------------------------
# EDVR training — EDVRModel (edvr_model.py)
# ---------------------------------------------------------------------------

def _label_by_path(tree, pred, label, other="normal", path=()):
    if isinstance(tree, dict):
        return {k: _label_by_path(v, pred, label, other, path + (k,))
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_label_by_path(v, pred, label, other, path) for v in tree]
        return type(tree)(out)
    return label if pred(path) else other


def edvr_param_labels(params: Params) -> Params:
    """'dcn' for params under a DCNv2Pack (keys containing 'dcn' —
    matches the reference's ``'dcn' in name`` test over torch names,
    where the pack's offset conv lives inside the dcn module,
    edvr_model.py:26-41), 'normal' elsewhere."""
    return _label_by_path(
        params, lambda p: any("dcn" in k for k in p), "dcn")


def make_edvr_optimizer(lr, dcn_lr_mul: float, params: Params,
                        b1: float = 0.9, b2: float = 0.99
                        ) -> optax.GradientTransformation:
    """Adam with a scaled DCN-group learning rate (edvr_model.py:18-46;
    EDVR configs use dcn_lr_mul=1 for from-scratch, 0.25 when
    fine-tuning from a no-TSA checkpoint)."""
    if dcn_lr_mul == 1.0:
        return optax.adam(lr, b1=b1, b2=b2)
    labels = edvr_param_labels(params)

    def scaled(mul):
        if callable(lr):
            return optax.adam(lambda s: lr(s) * mul, b1=b1, b2=b2)
        return optax.adam(lr * mul, b1=b1, b2=b2)

    return optax.multi_transform(
        {"normal": scaled(1.0), "dcn": scaled(dcn_lr_mul)}, labels)


@dataclasses.dataclass(frozen=True)
class EDVRTrainConfig:
    tsa_iter: int = 0                 # 0 disables the warmup
    pixel_loss: str = "charbonnier"
    charbonnier_eps: float = 1e-12


def make_edvr_train_step(
    g_forward: Callable[[Params, jnp.ndarray], jnp.ndarray],
    opt: optax.GradientTransformation,
    cfg: EDVRTrainConfig = EDVRTrainConfig(),
    tsa_key: str = "tsa",
):
    """EDVR train step with the TSA-only warmup (edvr_model.py:48-61):
    for the first ``tsa_iter`` iterations only the TSA-fusion subtree
    receives gradients (the reference sets requires_grad=False on every
    param without 'fusion' in its name; with a fresh optimizer the
    zero-grad window is bit-identical — Adam moments stay zero).

    step(state, lq [B,T,h,w,3], gt [B,H,W,3]) -> (state, metrics).
    """

    def loss_fn(params, lq, gt):
        return _pixel_loss(cfg.pixel_loss, cfg.charbonnier_eps,
                           g_forward(params, lq), gt)

    @jax.jit
    def step(state: VideoTrainState, lq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, lq, gt)
        if cfg.tsa_iter > 0:
            live = (state.step >= cfg.tsa_iter).astype(jnp.float32)
            grads = {
                k: (v if k == tsa_key else
                    jax.tree_util.tree_map(lambda g: g * live, v))
                for k, v in grads.items()
            }
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (VideoTrainState(params, opt_state, state.step + 1),
                {"l_pix": loss})

    return step


# ---------------------------------------------------------------------------
# Recurrent GAN training — VideoRecurrentGANModel
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VideoGANConfig:
    gan_type: str = "vanilla"
    pixel_weight: float = 1.0
    percep_weight: float = 1.0
    gan_weight: float = 5e-2          # RealBasicVSR-style configs
    fix_flow_iter: int = 5000
    net_d_iters: int = 1
    net_d_init_iters: int = 0
    ema_decay: float = 0.0


class VideoGANState(NamedTuple):
    g_params: Params
    d_params: Params
    g_ema: Params
    g_opt: optax.OptState
    d_opt: optax.OptState
    step: jnp.ndarray


def make_video_gan_train_step(
    g_forward: Callable[[Params, jnp.ndarray], jnp.ndarray],
    d_forward: Callable[[Params, jnp.ndarray], jnp.ndarray],
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    cfg: VideoGANConfig = VideoGANConfig(),
    feature_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """Two-player video GAN step (video_recurrent_gan_model.py:105-180).

    lq [B,N,h,w,3], gt [B,N,H,W,3]; D and the perceptual loss see frames
    flattened to (B·N, H, W, 3).  The reference's ``current_iter %
    net_d_iters`` / ``> net_d_init_iters`` G-gate becomes a 0/1
    multiplier on the G update (step counts from 1 like the reference).
    """

    def flat(v):
        # [B,N,H,W,C] sequences flatten to (B·N) images; center-frame
        # models (EDVR via VideoGANModel) already produce [B,H,W,C]
        return v if v.ndim == 4 else v.reshape((-1,) + v.shape[2:])

    def g_loss_fn(g_params, d_params, lq, gt):
        sr = g_forward(g_params, lq)
        l_pix = _pixel_loss("l1", 0.0, sr, gt)
        loss = cfg.pixel_weight * l_pix
        l_percep = jnp.float32(0.0)
        if cfg.percep_weight > 0.0 and feature_fn is not None:
            l_percep = perceptual_loss(feature_fn, flat(sr), flat(gt))
            loss = loss + cfg.percep_weight * l_percep
        l_gan = gan_loss(d_forward(d_params, flat(sr)), True, cfg.gan_type)
        loss = loss + cfg.gan_weight * l_gan
        return loss, (sr, l_pix, l_percep, l_gan)

    def d_loss_fn(d_params, sr_flat, gt_flat):
        real = d_forward(d_params, gt_flat)
        fake = d_forward(d_params, sr_flat)
        l_real = gan_loss(real, True, cfg.gan_type, is_disc=True)
        l_fake = gan_loss(fake, False, cfg.gan_type, is_disc=True)
        return l_real + l_fake, (l_real, l_fake,
                                 jnp.mean(real), jnp.mean(fake))

    @jax.jit
    def step(state: VideoGANState, lq, gt):
        cur = state.step + 1  # basicsr iterations count from 1
        g_on = ((cur % cfg.net_d_iters == 0)
                & (cur > cfg.net_d_init_iters)).astype(jnp.float32)

        (_, (sr, l_pix, l_percep, l_gan)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.d_params, lq, gt)
        g_grads = _freeze_flow_grads(g_grads, state.step, cfg.fix_flow_iter)
        g_grads = jax.tree_util.tree_map(lambda g: g * g_on, g_grads)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        sr_flat = jax.lax.stop_gradient(flat(sr))
        (_, (l_real, l_fake, out_real, out_fake)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, sr_flat, flat(gt)))
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        g_ema = state.g_ema
        if cfg.ema_decay > 0.0:
            g_ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e + (1.0 - cfg.ema_decay) * p,
                state.g_ema, g_params)

        metrics = {"l_g_pix": l_pix, "l_g_percep": l_percep,
                   "l_g_gan": l_gan, "l_d_real": l_real,
                   "l_d_fake": l_fake, "out_d_real": out_real,
                   "out_d_fake": out_fake, "g_updated": g_on}
        return VideoGANState(g_params, d_params, g_ema, g_opt_state,
                             d_opt_state, cur), metrics

    return step


# ---------------------------------------------------------------------------
# Testing — VideoRecurrentModel.test
# ---------------------------------------------------------------------------

def video_test(g_forward: Callable[[jnp.ndarray], jnp.ndarray],
               lq: jnp.ndarray, flip_seq: bool = False,
               center_frame_only: bool = False) -> jnp.ndarray:
    """lq [B, N, h, w, 3] -> SR frames.  ``flip_seq`` runs the model on
    [seq ‖ reversed seq] and averages the two temporal directions
    (video_recurrent_model.py:178-197)."""
    n = lq.shape[1]
    if flip_seq:
        lq = jnp.concatenate([lq, lq[:, ::-1]], axis=1)
    out = g_forward(lq)
    if flip_seq:
        out = 0.5 * (out[:, :n] + out[:, n:][:, ::-1])
    if center_frame_only:
        out = out[:, n // 2]
    return out


# ---------------------------------------------------------------------------
# Per-folder frame evaluation — VideoBaseModel.dist_validation essence
# ---------------------------------------------------------------------------

def evaluate_video_folders(
    g_forward: Callable[[jnp.ndarray], jnp.ndarray],
    folders: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    metrics: Dict[str, Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]],
    flip_seq: bool = False,
    center_frame_only: bool = False,
) -> Dict[str, Dict[str, list]]:
    """{folder: (lq [1,N,h,w,3], gt [1,N,H,W,3])} -> per-folder,
    per-frame metric table (video_base_model.py keeps a
    [num_frame, num_metric] tensor per clip)."""
    results: Dict[str, Dict[str, list]] = {}
    for folder, (lq, gt) in folders.items():
        sr = video_test(g_forward, lq, flip_seq, center_frame_only)
        if center_frame_only:
            sr = sr[:, None]
            gt = gt[:, gt.shape[1] // 2][:, None]
        results[folder] = {
            name: [float(fn(sr[0, i], gt[0, i]))
                   for i in range(sr.shape[1])]
            for name, fn in metrics.items()
        }
    return results
