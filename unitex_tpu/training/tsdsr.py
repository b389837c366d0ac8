"""TSD-SR training: target score distillation for one-step SR.

JAX/optax equivalent of /root/reference/TSD_SR/train/train.py:391-1033.
Three networks share the SD3 backbone:

* student  — base + student LoRA, runs ONE step at t=1000,
* teacher  — the frozen base model with CFG (compute_with_cfg, :742-756),
* regularizer — base + reg LoRA, trained with flow matching on the
  student's outputs (:935-958).

Per step:
  latent_stu = z_lr − σ(1000)·v_student(z_lr)                (:793, 820)
  TSD grad   = λ·(v_teacher(ẑ) − v_reg(ẑ))·σ² +
               (1−λ)·(v_teacher(ẑ) − v_teacher(z_hr))·σ²     (:880-889)
  tsd_loss   = ½‖latent_stu − stopgrad(latent_stu − grad)‖²
  data_loss  = MSE(latent_stu, z_hr) (+ perceptual term)      (:900-904)
  reg_loss   = flow-matching of v_reg toward the student distribution
               (:935-958)

The perceptual term defaults to a gradient-domain L1 proxy; real LPIPS
(utils/lpips.py, from scratch) plugs in via ``make_lpips_perceptual_fn``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.flux.lora import merge_lora
from ..models.sd3.config import SD3Config
from ..models.sd3.lora import init_sd3_lora
from ..models.sd3.model import sd3_forward


@dataclasses.dataclass(frozen=True)
class TSDTrainConfig:
    rank: int = 64
    learning_rate: float = 1e-5
    reg_learning_rate: float = 1e-5
    guidance_scale: float = 7.5
    lambda_tsd: float = 0.7
    max_grad_norm: float = 1.0
    num_train_timesteps: int = 1000
    shift: float = 3.0
    t_min: int = 50
    t_max: int = 950


def _sigma(t: jnp.ndarray, shift: float = 3.0) -> jnp.ndarray:
    """Flow-match sigma for timestep t in [0, 1000] with SD3's shift."""
    u = t / 1000.0
    return shift * u / (1.0 + (shift - 1.0) * u)


def make_lpips_perceptual_fn(lpips_params, decode_fn: Callable) -> Callable:
    """Build a ``perceptual_fn`` for ``tsd_student_loss`` from real LPIPS
    (utils/lpips.py) — the reference computes pyiqa LPIPS on the DECODED
    student image vs the HR image (train.py:900-904), so the hook decodes
    both latents through ``decode_fn(latents) -> [B, H, W, 3] in [0, 1]``."""
    from ..utils.lpips import lpips_image01

    def perceptual(latent_stu, latent_hr):
        img_stu = decode_fn(latent_stu)
        img_hr = jax.lax.stop_gradient(decode_fn(latent_hr))
        return lpips_image01(lpips_params, img_stu, img_hr).mean()

    return perceptual


def gradient_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Gradient-domain L1 — the perceptual-proxy term."""
    def grads(x):
        return (x[:, 1:] - x[:, :-1]), (x[:, :, 1:] - x[:, :, :-1])

    ay, ax = grads(a)
    by, bx = grads(b)
    return jnp.abs(ay - by).mean() + jnp.abs(ax - bx).mean()


def _cfg_forward(params, cfg, z, t, prompt, pooled, prompt_null, pooled_null, scale):
    """Classifier-free guided velocity (train.py compute_with_cfg)."""
    z2 = jnp.concatenate([z, z], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    p2 = jnp.concatenate([prompt_null, prompt], axis=0)
    pl2 = jnp.concatenate([pooled_null, pooled], axis=0)
    out = sd3_forward(params, cfg, z2, p2, t2, pl2)
    uncond, cond = jnp.split(out, 2, axis=0)
    return uncond + scale * (cond - uncond)


def tsd_student_loss(
    student_lora: Dict[str, Any],
    reg_lora: Dict[str, Any],
    base_params: Dict[str, Any],
    cfg: SD3Config,
    tcfg: TSDTrainConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    perceptual_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Student phase: TSD + data loss.  batch: 'latent_lr', 'latent_hr'
    [B, h, w, C], 'prompt_embeds', 'pooled_embeds' (+_null variants)."""
    z_lr = batch["latent_lr"]
    z_hr = batch["latent_hr"]
    B = z_lr.shape[0]
    k_t, k_noise = jax.random.split(key)

    student = merge_lora(base_params, [(student_lora, 1.0)])
    t_stu = jnp.full((B,), 1000.0)
    v_stu = sd3_forward(
        student, cfg, z_lr, batch["prompt_embeds"], t_stu, batch["pooled_embeds"]
    )
    sigma_stu = _sigma(t_stu, tcfg.shift)[:, None, None, None]
    latent_stu = z_lr - sigma_stu * v_stu

    # teacher/regularizer comparison at a random mid trajectory point
    t_tea = jax.random.randint(k_t, (B,), tcfg.t_min, tcfg.t_max).astype(jnp.float32)
    sigma_tea = _sigma(t_tea, tcfg.shift)[:, None, None, None]
    noise = jax.random.normal(k_noise, z_lr.shape)
    noisy_stu = sigma_tea * noise + (1.0 - sigma_tea) * latent_stu
    noisy_hr = sigma_tea * noise + (1.0 - sigma_tea) * z_hr

    regularizer = merge_lora(base_params, [(reg_lora, 1.0)])
    args = (
        batch["prompt_embeds"], batch["pooled_embeds"],
        batch["prompt_embeds_null"], batch["pooled_embeds_null"],
        tcfg.guidance_scale,
    )
    v_tea = jax.lax.stop_gradient(
        _cfg_forward(base_params, cfg, noisy_stu, t_tea, *args)
    )
    v_tea_hr = jax.lax.stop_gradient(
        _cfg_forward(base_params, cfg, noisy_hr, t_tea, *args)
    )
    v_reg = jax.lax.stop_gradient(
        _cfg_forward(regularizer, cfg, noisy_stu, t_tea, *args)
    )

    grad_vsd = (v_tea - v_reg) * sigma_tea**2
    grad_tsm = (v_tea - v_tea_hr) * sigma_tea**2
    grad = tcfg.lambda_tsd * grad_vsd + (1.0 - tcfg.lambda_tsd) * grad_tsm
    grad = jnp.nan_to_num(grad)
    target = jax.lax.stop_gradient(latent_stu - grad)
    tsd_loss = 0.5 * jnp.mean((latent_stu - target) ** 2)

    mse_loss = jnp.mean((latent_stu - jax.lax.stop_gradient(z_hr)) ** 2)
    if perceptual_fn is not None:
        perc = perceptual_fn(latent_stu, z_hr)
    else:
        perc = gradient_l1(latent_stu, z_hr)
    data_loss = mse_loss + perc

    loss = tsd_loss + data_loss
    return loss, {
        "tsd_loss": tsd_loss,
        "data_loss": data_loss,
        "latent_stu": jax.lax.stop_gradient(latent_stu),
    }


def tsd_regularizer_loss(
    reg_lora: Dict[str, Any],
    base_params: Dict[str, Any],
    cfg: SD3Config,
    tcfg: TSDTrainConfig,
    latent_stu: jnp.ndarray,
    prompt: jnp.ndarray,
    pooled: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Regularizer phase: flow-matching v_reg toward the (frozen) student
    sample distribution (train.py:935-958)."""
    B = latent_stu.shape[0]
    k_t, k_noise = jax.random.split(key)
    t = jax.random.randint(k_t, (B,), tcfg.t_min, tcfg.t_max).astype(jnp.float32)
    sigma = _sigma(t, tcfg.shift)[:, None, None, None]
    noise = jax.random.normal(k_noise, latent_stu.shape)
    noisy = sigma * noise + (1.0 - sigma) * latent_stu

    regularizer = merge_lora(base_params, [(reg_lora, 1.0)])
    v = sd3_forward(regularizer, cfg, noisy, prompt, t, pooled)
    pred_x0 = noisy - sigma * v
    return 0.5 * jnp.mean((pred_x0 - jax.lax.stop_gradient(latent_stu)) ** 2)


@dataclasses.dataclass
class TSDTrainState:
    step: int
    student_lora: Dict[str, Any]
    reg_lora: Dict[str, Any]
    opt_state_student: Any
    opt_state_reg: Any


def create_tsd_state(
    key: jax.Array, base_params: Dict[str, Any], tcfg: TSDTrainConfig
):
    k1, k2 = jax.random.split(key)
    student = init_sd3_lora(k1, base_params, rank=tcfg.rank)
    reg = init_sd3_lora(k2, base_params, rank=tcfg.rank)
    tx_s = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(tcfg.learning_rate),
    )
    tx_r = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(tcfg.reg_learning_rate),
    )
    state = TSDTrainState(0, student, reg, tx_s.init(student), tx_r.init(reg))
    return state, tx_s, tx_r


def tsd_train_step(
    state: TSDTrainState,
    base_params: Dict[str, Any],
    cfg: SD3Config,
    tcfg: TSDTrainConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    tx_s: optax.GradientTransformation,
    tx_r: optax.GradientTransformation,
) -> Tuple[TSDTrainState, Dict[str, jnp.ndarray]]:
    """Both phases of one training iteration (student then regularizer)."""
    k_s, k_r = jax.random.split(key)
    (loss_s, aux), grads_s = jax.value_and_grad(tsd_student_loss, has_aux=True)(
        state.student_lora, state.reg_lora, base_params, cfg, tcfg, batch, k_s
    )
    upd_s, opt_s = tx_s.update(grads_s, state.opt_state_student, state.student_lora)
    student = optax.apply_updates(state.student_lora, upd_s)

    loss_r, grads_r = jax.value_and_grad(tsd_regularizer_loss)(
        state.reg_lora, base_params, cfg, tcfg,
        aux["latent_stu"], batch["prompt_embeds"], batch["pooled_embeds"], k_r,
    )
    upd_r, opt_r = tx_r.update(grads_r, state.opt_state_reg, state.reg_lora)
    reg = optax.apply_updates(state.reg_lora, upd_r)

    new_state = TSDTrainState(state.step + 1, student, reg, opt_s, opt_r)
    return new_state, {
        "loss": loss_s,
        "tsd_loss": aux["tsd_loss"],
        "data_loss": aux["data_loss"],
        "reg_loss": loss_r,
    }
