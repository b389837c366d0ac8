#!/usr/bin/env python
"""TSD-SR training launcher (TSD_SR/train/train.py capability: target
score distillation of a one-step SD3 SR student against a frozen CFG
teacher with a learned regularizer — training/tsdsr.py holds the math;
this script wires data, VAE encoding, and checkpoints).

  python scripts/train_tsdsr.py --lr-dir LR/ --hr-dir HR/ \
      --pretrain /ckpts --steps 10000 --output-dir runs/tsd
  python scripts/train_tsdsr.py --lr-dir LR/ --hr-dir HR/ --tiny --cpu ...

LR images are bicubic-upscaled x4 to HR size before VAE encoding (the
student operates at the target resolution, sr_pipeline.py:250); prompt
embeddings are the precomputed fixed ones from --prompt-embeds (.npz
with prompt_embeds/pooled_embeds[,_null]) or zeros (the null-embedding
convention the serving pipeline defaults to).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--hr-dir", required=True)
    ap.add_argument("--pretrain", default=None,
                    help="checkpoint root with sd3/ (transformer + vae)")
    ap.add_argument("--prompt-embeds", default=None, help=".npz path")
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny SD3+VAE (smoke runs, no weights)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--gt-size", type=int, default=None,
                    help="HR crop (multiple of 8*patch); default: full")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--reg-lr", type=float, default=1e-5)
    ap.add_argument("--output-dir", default="tsdsr_run")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from unitex_tpu.image.matlab import imresize
    from unitex_tpu.models.flux.vae import (VAEConfig, init_vae_params,
                                            vae_encode_jit)
    from unitex_tpu.models.sd3.config import SD3Config
    from unitex_tpu.training import sr_data as sd
    from unitex_tpu.training.checkpoint import CheckpointManager
    from unitex_tpu.training.tsdsr import (TSDTrainConfig, create_tsd_state,
                                           tsd_train_step)
    from unitex_tpu.utils.logging import MetricLogger

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)

    if args.tiny:
        cfg = SD3Config.tiny()
        vae_cfg = VAEConfig.tiny()
        key, k1, k2 = jax.random.split(key, 3)
        from unitex_tpu.models.sd3.model import init_sd3_params
        base_params = init_sd3_params(k1, cfg)
        vae_params = init_vae_params(k2, vae_cfg)
    else:
        if not args.pretrain:
            raise SystemExit("--pretrain required (or pass --tiny)")
        from unitex_tpu.models.sd3.sr_pipeline import TSDSRPipeline
        pipe = TSDSRPipeline(pretrain_root=args.pretrain)
        if pipe.transformer_params is None or pipe.vae_params is None:
            raise SystemExit(f"no sd3 checkpoints under {args.pretrain}")
        cfg, base_params = pipe.sd3_cfg, pipe.transformer_params
        vae_cfg, vae_params = pipe.vae_cfg, pipe.vae_params

    tcfg = TSDTrainConfig(rank=args.rank, learning_rate=args.lr,
                          reg_learning_rate=args.reg_lr)
    key, sk = jax.random.split(key)
    state, tx_s, tx_r = create_tsd_state(sk, base_params, tcfg)

    ds = sd.PairedImageDataset(sd.PairedImageConfig(
        lq_folder=args.lr_dir, gt_folder=args.hr_dir, scale=args.scale,
        phase="train" if args.gt_size else "val",
        gt_size=args.gt_size or 0, seed=args.seed))
    print(f"{len(ds)} training pairs", flush=True)

    if args.prompt_embeds:
        pe = np.load(args.prompt_embeds)
        prompt = jnp.asarray(pe["prompt_embeds"])
        pooled = jnp.asarray(pe["pooled_embeds"])
        prompt_null = jnp.asarray(pe.get("prompt_embeds_null", prompt * 0))
        pooled_null = jnp.asarray(pe.get("pooled_embeds_null", pooled * 0))
    else:
        prompt = jnp.zeros((1, 154, cfg.joint_attention_dim), jnp.float32)
        pooled = jnp.zeros((1, cfg.pooled_projection_dim), jnp.float32)
        prompt_null, pooled_null = prompt, pooled

    logger = MetricLogger(args.output_dir)
    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             save_every=args.save_every)

    def encode(img):  # [B, H, W, 3] in [0,1] -> latents
        x = jnp.asarray(img) * 2.0 - 1.0
        return vae_encode_jit(vae_params, vae_cfg, x)

    it = 0
    while it < args.steps:
        for batch_d in sd.batch_iterator(ds, args.batch, rng):
            hr = batch_d["gt"]
            lr_up = np.stack([
                np.asarray(imresize(batch_d["lq"][i],
                                    hr.shape[1] / batch_d["lq"].shape[1]))
                for i in range(hr.shape[0])])
            B = hr.shape[0]
            batch = {
                "latent_lr": encode(np.clip(lr_up, 0, 1)),
                "latent_hr": encode(hr),
                "prompt_embeds": jnp.repeat(prompt, B, 0),
                "pooled_embeds": jnp.repeat(pooled, B, 0),
                "prompt_embeds_null": jnp.repeat(prompt_null, B, 0),
                "pooled_embeds_null": jnp.repeat(pooled_null, B, 0),
            }
            key_l = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), it)
            state, metrics = tsd_train_step(
                state, base_params, cfg, tcfg, batch, key_l, tx_s, tx_r)
            it += 1
            if it % args.log_every == 0 or it == args.steps:
                logger.log(it, metrics)
                msg = ", ".join(f"{k}={float(v):.4g}"
                                for k, v in metrics.items())
                print(f"step {it}/{args.steps}  {msg}", flush=True)
            if ckpt.should_save(it):
                ckpt.save(it, {"student_lora": state.student_lora,
                               "reg_lora": state.reg_lora})
            if it >= args.steps:
                break
    ckpt.save(args.steps, {"student_lora": state.student_lora,
                           "reg_lora": state.reg_lora})
    logger.close()
    print("training done", flush=True)


if __name__ == "__main__":
    main()
