"""LoRA training for the FLUX MMDiT: flow-matching objective in optax.

TPU-native equivalent of ``PBRTrainer``
(/root/reference/flux_piplines/texturing/trainer.py:779-1209): logit-normal
timestep sampling (:832-838), flow-match interpolation z_t = (1−σ)x + σε
(:892-895), packed-token conditioning identical to inference (:921-1013),
optional random token dropping with masked loss (:1022-1065, 1108;
attention_processor.py:114-233), velocity target ε − x (:1090), and
sigma-based loss weighting.  The accelerate/DDP/NCCL machinery becomes: one
jitted ``train_step`` whose params/optimizer state carry NamedShardings —
data-parallel gradients all-reduce over ICI automatically.

Only the LoRA tree receives gradients; base params are frozen pytree
constants (trainer freezes all then adds adapters, :213-218, 276-318).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.flux.config import FluxConfig
from ..models.flux.lora import init_lora_params, merge_lora
from ..models.flux.model import flux_forward
from ..models.flux.pipeline import latent_image_ids, pack_latents


@dataclasses.dataclass(frozen=True)
class FluxLoraTrainConfig:
    rank: int = 16
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    # optimizer + schedule (trainer.py:322-408: AdamW / 8-bit / Prodigy;
    # get_scheduler constant/cosine/linear with warmup)
    optimizer: str = "adamw"             # adamw | prodigy
    lr_scheduler: str = "constant"       # constant | constant_with_warmup |
                                         # cosine | linear
    warmup_steps: int = 0
    max_train_steps: int = 10_000
    # timestep sampling (trainer.py:832-838)
    weighting_scheme: str = "none"       # none | sigma_sqrt | logit_normal
    logit_mean: float = 0.0
    logit_std: float = 1.0
    guidance_scale: float = 1.0          # guidance embed value during training
    # random token dropping (attention_processor.py:114-233)
    drop_rate: float = 0.0
    num_train_timesteps: int = 1000
    # prior-preservation regularization (trainer.py:1093-1112): the batch
    # carries [instance; prior] halves along B
    prior_preservation: bool = False
    prior_loss_weight: float = 1.0
    # preconditioning pixel loss (trainer.py:1114-1122): decode the x0
    # prediction through the (frozen) VAE and take a pixel-space MSE
    preconditioning_loss: bool = False
    preconditioning_loss_weight: float = 1.0
    # pipeline parallelism (parallel/pipeline.py): stage the block stacks
    # over this mesh axis of the AMBIENT mesh (run the step under
    # ``jax.set_mesh``), GPipe-microbatching the batch into pipe_n_micro
    # slices; pipe_data_axis additionally shards the microbatch (DP x PP)
    pipe_axis: Optional[str] = None
    pipe_n_micro: int = 1
    pipe_data_axis: Optional[str] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    lora: Dict[str, Any]
    opt_state: Any


def sample_timestep_density(
    key: jax.Array, batch: int, scheme: str, logit_mean: float, logit_std: float
) -> jnp.ndarray:
    """u in (0,1) — diffusers compute_density_for_timestep_sampling."""
    if scheme == "logit_normal":
        z = jax.random.normal(key, (batch,)) * logit_std + logit_mean
        return jax.nn.sigmoid(z)
    return jax.random.uniform(key, (batch,))


def loss_weighting(scheme: str, sigmas: jnp.ndarray) -> jnp.ndarray:
    """diffusers compute_loss_weighting_for_sd3."""
    if scheme == "sigma_sqrt":
        return (sigmas**-2.0).astype(jnp.float32)
    if scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas**2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


def flow_match_loss(
    lora: Dict[str, Any],
    base_params: Dict[str, Any],
    cfg: FluxConfig,
    tcfg: FluxLoraTrainConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    vae_params: Dict[str, Any] | None = None,
    vae_cfg=None,
) -> jnp.ndarray:
    """One flow-matching loss evaluation.

    batch:
      'latents'         [B, H, W, C]   clean VAE latents of the target image
      'cond_latents'    [B, Hc+?, Wc, C] optional control latents (packed
                        separately), or packed via 'cond_tokens'
      'cond_tokens'     [B, S_c, C*4]  optional pre-packed condition tokens
      'cond_ids'        [S_c, 3]       their position ids
      'prompt_embeds'   [B, S_t, D]    text embeddings (zeros at inference
                        parity)
      'pooled_embeds'   [B, D_p]
      'pixel_values'    [B, Hp, Wp, 3] in [0, 1] — only read when
                        tcfg.preconditioning_loss (with vae_params/vae_cfg)
    """
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    x = batch["latents"]
    B, H, W, C = x.shape

    u = sample_timestep_density(
        k_t, B, tcfg.weighting_scheme, tcfg.logit_mean, tcfg.logit_std
    )
    # sigma table: linspace over train timesteps with shift 3.0 (FLUX default
    # training config shift): sigma = shift*u / (1 + (shift-1)*u)
    shift = 3.0
    sigmas = shift * u / (1.0 + (shift - 1.0) * u)
    timesteps = sigmas  # transformer takes t in [0, 1]

    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    sig = sigmas[:, None, None, None]
    zt = (1.0 - sig) * x + sig * noise

    tokens = pack_latents(zt)
    noise_ids = latent_image_ids(H // 2, W // 2)
    S_noise = tokens.shape[1]
    S_full = S_noise
    target = pack_latents(noise - x)

    keep_idx = None
    if tcfg.drop_rate > 0.0:
        # random token dropping (trainer.py:1022-1065 + the RandomDrop
        # attention processor): a static-size random subset of the noise
        # tokens enters the sequence — condition/text tokens are kept —
        # and the loss is taken on the kept tokens only
        n_keep = max(1, int(S_noise * (1.0 - tcfg.drop_rate)))
        perm = jax.random.permutation(k_drop, S_noise)
        keep_idx = jnp.sort(perm[:n_keep])
        tokens = tokens[:, keep_idx]
        noise_ids = noise_ids[keep_idx]
        target = target[:, keep_idx]
        S_noise = n_keep

    img_ids = noise_ids
    hidden = tokens
    if "cond_tokens" in batch and batch["cond_tokens"] is not None:
        hidden = jnp.concatenate([tokens, batch["cond_tokens"]], axis=1)
        img_ids = jnp.concatenate([noise_ids, batch["cond_ids"]], axis=0)

    # lora=None → full-parameter fine-tuning (training/full_finetune.py)
    params = base_params if lora is None else merge_lora(base_params, [(lora, 1.0)])
    guidance = (
        jnp.full((B,), tcfg.guidance_scale, jnp.float32)
        if cfg.guidance_embeds
        else None
    )
    txt_ids = jnp.zeros((batch["prompt_embeds"].shape[1], 3), jnp.float32)
    if tcfg.pipe_axis is not None:
        from ..models.flux.pp import flux_forward_pp

        pred = flux_forward_pp(
            params, cfg, hidden, batch["prompt_embeds"], timesteps,
            batch["pooled_embeds"], img_ids, txt_ids, guidance=guidance,
            n_micro=tcfg.pipe_n_micro, pipe_axis=tcfg.pipe_axis,
            data_axis=tcfg.pipe_data_axis,
        )
    else:
        pred = flux_forward(
            params, cfg, hidden, batch["prompt_embeds"], timesteps,
            batch["pooled_embeds"], img_ids, txt_ids, guidance=guidance,
        )
    pred_noise = pred[:, :S_noise]

    w = loss_weighting(tcfg.weighting_scheme, sigmas)[:, None, None]
    err = (pred_noise.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if tcfg.prior_preservation:
        # [instance; prior] batch halves (trainer.py:1093-1112): the prior
        # half regularizes toward the frozen model's behavior
        if B % 2 != 0:
            raise ValueError(
                "prior_preservation needs an even batch laid out as "
                f"[instance; prior] halves, got batch size {B}"
            )
        e_main, e_prior = jnp.split(err, 2, axis=0)
        w_main, w_prior = jnp.split(w, 2, axis=0)
        loss = jnp.mean(w_main * e_main) + tcfg.prior_loss_weight * jnp.mean(
            w_prior * e_prior
        )
    else:
        loss = jnp.mean(w * err)

    if tcfg.preconditioning_loss:
        assert vae_params is not None and vae_cfg is not None, (
            "preconditioning_loss needs the frozen VAE (vae_params/vae_cfg)"
        )
        from ..models.flux.pipeline import unpack_latents
        from ..models.flux.vae import vae_decode

        if keep_idx is not None:
            # scatter kept predictions back to the full grid; dropped
            # positions predict zero velocity (x0 falls back to zt there)
            pred_full = jnp.zeros(
                (B, S_full, pred_noise.shape[-1]), pred_noise.dtype
            ).at[:, keep_idx].set(pred_noise)
        else:
            pred_full = pred_noise
        v_lat = unpack_latents(pred_full, H, W)
        # x0 prediction: zt - sigma*v (trainer.py:1117-1119); stays in the
        # SCALED latent space vae_decode expects
        latents_pred = zt - sig * v_lat
        img_pred = vae_decode(vae_params, vae_cfg, latents_pred) * 0.5 + 0.5
        pix = batch["pixel_values"].astype(jnp.float32)
        loss = loss + tcfg.preconditioning_loss_weight * jnp.mean(
            (img_pred.astype(jnp.float32) - pix) ** 2
        )
    return loss


def make_lr_schedule(tcfg: FluxLoraTrainConfig):
    lr = tcfg.learning_rate
    if tcfg.lr_scheduler == "constant":
        return lr
    if tcfg.lr_scheduler == "constant_with_warmup":
        return optax.schedules.warmup_constant_schedule(0.0, lr, tcfg.warmup_steps)
    if tcfg.lr_scheduler == "cosine":
        return optax.schedules.warmup_cosine_decay_schedule(
            0.0, lr, tcfg.warmup_steps, tcfg.max_train_steps
        )
    if tcfg.lr_scheduler == "linear":
        return optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, lr, max(tcfg.warmup_steps, 1)),
                optax.schedules.linear_schedule(
                    lr, 0.0, max(tcfg.max_train_steps - tcfg.warmup_steps, 1)
                ),
            ],
            [tcfg.warmup_steps],
        )
    raise ValueError(f"unknown lr_scheduler {tcfg.lr_scheduler!r}")


def make_optimizer(tcfg: FluxLoraTrainConfig) -> optax.GradientTransformation:
    sched = make_lr_schedule(tcfg)
    if tcfg.optimizer == "prodigy":
        opt = optax.contrib.prodigy(
            learning_rate=sched if not isinstance(sched, float) else sched,
            betas=(tcfg.adam_b1, tcfg.adam_b2),
            eps=tcfg.adam_eps,
            weight_decay=tcfg.weight_decay,
        )
    else:
        opt = optax.adamw(
            sched,
            b1=tcfg.adam_b1,
            b2=tcfg.adam_b2,
            eps=tcfg.adam_eps,
            weight_decay=tcfg.weight_decay,
        )
    return optax.chain(optax.clip_by_global_norm(tcfg.max_grad_norm), opt)


def create_train_state(
    key: jax.Array,
    base_params: Dict[str, Any],
    tcfg: FluxLoraTrainConfig,
) -> Tuple[TrainState, optax.GradientTransformation]:
    lora = init_lora_params(key, base_params, rank=tcfg.rank)
    tx = make_optimizer(tcfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        lora=lora,
        opt_state=tx.init(lora),
    )
    return state, tx


@partial(jax.jit, static_argnames=("cfg", "tcfg", "tx", "vae_cfg"))
def train_step(
    state: TrainState,
    base_params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: FluxConfig,
    tcfg: FluxLoraTrainConfig,
    tx: optax.GradientTransformation,
    vae_params: Dict[str, Any] | None = None,
    vae_cfg=None,
) -> Tuple[TrainState, jnp.ndarray]:
    loss, grads = jax.value_and_grad(flow_match_loss)(
        state.lora, base_params, cfg, tcfg, batch, key,
        vae_params=vae_params, vae_cfg=vae_cfg,
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.lora)
    lora = optax.apply_updates(state.lora, updates)
    return TrainState(step=state.step + 1, lora=lora, opt_state=opt_state), loss


@partial(jax.jit, static_argnames=("cfg", "tcfg", "tx", "vae_cfg"))
def train_step_accum(
    state: TrainState,
    base_params: Dict[str, Any],
    batches: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: FluxConfig,
    tcfg: FluxLoraTrainConfig,
    tx: optax.GradientTransformation,
    vae_params: Dict[str, Any] | None = None,
    vae_cfg=None,
) -> Tuple[TrainState, jnp.ndarray]:
    """Gradient-accumulated step (``accelerator.accumulate``,
    trainer.py:822): ``batches`` leaves carry a leading microbatch axis
    [A, B, ...]; gradients are averaged over A inside one jit via
    ``lax.scan`` (sequential — activation memory stays one microbatch)."""
    A = jax.tree.leaves(batches)[0].shape[0]
    keys = jax.random.split(key, A)

    def micro(carry, xs):
        acc, loss_sum = carry
        mb, k = xs
        loss, grads = jax.value_and_grad(flow_match_loss)(
            state.lora, base_params, cfg, tcfg, mb, k,
            vae_params=vae_params, vae_cfg=vae_cfg,
        )
        acc = jax.tree.map(jnp.add, acc, grads)
        return (acc, loss_sum + loss), None

    zeros = jax.tree.map(jnp.zeros_like, state.lora)
    (gsum, loss_sum), _ = jax.lax.scan(micro, (zeros, 0.0), (batches, keys))
    grads = jax.tree.map(lambda g: g / A, gsum)
    updates, opt_state = tx.update(grads, state.opt_state, state.lora)
    lora = optax.apply_updates(state.lora, updates)
    return TrainState(step=state.step + 1, lora=lora, opt_state=opt_state), loss_sum / A


# ------------------------------------------------------- checkpointing


def save_checkpoint(path: str, state: TrainState) -> None:
    """Orbax checkpoint of the LoRA train state (the reference saves PEFT
    safetensors per checkpoint-N dir, trainer.py:1139-1164)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, dataclasses.asdict(state)))
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, dataclasses.asdict(template))
    return TrainState(**restored)
