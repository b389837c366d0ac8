"""FLUX LoRA training launcher.

The reference's trainers ship without a __main__ (the launch harness lives
in the external UniTEX-FLUX repo, README.md:100-101); this is the runnable
equivalent: flow-match LoRA training of the texture/delight adapters over a
(data x model) mesh with checkpointing, LR schedules, and JSONL logging.
Runs against real VAE-encoded multi-view data when a dataset dir is given,
or the synthetic geometry-rendered stream for smoke runs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the container's sitecustomize force-selects the axon platform; honor an
# explicit JAX_PLATFORMS request (e.g. cpu smoke runs)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-models", default=None)
    ap.add_argument("--output-dir", default="lora_out")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--optimizer", default="adamw", choices=["adamw", "prodigy"])
    ap.add_argument("--lr-scheduler", default="constant_with_warmup")
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--max-train-steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--drop-rate", type=float, default=0.0)
    ap.add_argument("--preconditioning-loss", action="store_true",
                    help="add a pixel-space MSE on the VAE-decoded x0 "
                         "prediction (trainer.py:1114-1122)")
    ap.add_argument("--preconditioning-loss-weight", type=float, default=1.0)
    ap.add_argument("--prior-preservation", action="store_true",
                    help="batch halves are [instance; prior]; the prior "
                         "half adds a weighted regularization term (needs "
                         "an even --batch-size and a dataset that yields "
                         "prior examples in the second half)")
    ap.add_argument("--prior-loss-weight", type=float, default=1.0)
    ap.add_argument("--checkpoint-every", type=int, default=250)
    ap.add_argument("--checkpoints-total-limit", type=int, default=3)
    ap.add_argument("--data-mesh", type=int, default=1, help="data-parallel size")
    ap.add_argument("--pipe", type=int, default=0,
                    help="pipeline-parallel stages: mesh becomes data x pipe "
                         "(instead of data x model TP) and the block stacks "
                         "run a GPipe microbatch schedule "
                         "(parallel/pipeline.py)")
    ap.add_argument("--pipe-n-micro", type=int, default=0,
                    help="GPipe microbatches (default: the batch size)")
    ap.add_argument("--data-dir", default=None,
                    help="pre-rendered dataset root (DirectoryTextureDataset "
                         "schema: per-asset dirs of pipeline artifacts); "
                         "default: the synthetic geometry-rendered stream")
    ap.add_argument("--mode", default="texture", choices=["texture", "delight"],
                    help="which adapter's data pairing to train on "
                         "(--data-dir only)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatches accumulated per optimizer step "
                         "(in-jit lax.scan, train_step_accum)")
    ap.add_argument("--full-finetune", action="store_true",
                    help="full-parameter fine-tuning with ZeRO-1 optimizer-"
                         "state sharding instead of LoRA")
    ap.add_argument("--bf16-compute", action="store_true",
                    help="bf16 forward/backward with f32 master weights "
                         "(full-finetune only)")
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--validation-steps", type=int, default=0,
                    help="render a validation image every N steps "
                         "(the reference's log_validation, trainer.py:579-625)")
    ap.add_argument("--prompt", default="[MVFLUX]",
                    help="trigger prompt embedded via the on-device CLIP/T5 "
                         "encoders when checkpoint weights exist "
                         "(trainer.py:165-181); '' or missing weights -> "
                         "the zero embeddings inference runs with")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.models.flux.config import FluxConfig
    from unitex_tpu.models.flux.model import init_flux_params
    from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params, vae_encode
    from unitex_tpu.parallel.mesh import make_mesh
    from unitex_tpu.parallel.sharding import (
        data_sharding,
        flux_param_shardings,
        shard_params,
    )
    from unitex_tpu.training.checkpoint import CheckpointManager
    from unitex_tpu.training.data import (
        DirectoryTextureDataset,
        SyntheticTextureDataset,
    )
    from unitex_tpu.training.flux_lora import (
        FluxLoraTrainConfig,
        create_train_state,
        train_step,
        train_step_accum,
    )
    from unitex_tpu.training.full_finetune import (
        FullTrainState,
        full_train_step,
        shard_opt_state_zero,
    )
    from unitex_tpu.utils import enable_compilation_cache
    from unitex_tpu.utils.logging import MetricLogger

    enable_compilation_cache()

    if args.tiny:
        cfg = dataclasses.replace(FluxConfig.tiny(), remat=True)
        vae_cfg = VAEConfig.tiny()
        tparams = init_flux_params(jax.random.key(0), cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        view_size = 32
    else:
        from unitex_tpu.models.flux.loader import load_flux_transformer, load_vae

        cfg = dataclasses.replace(FluxConfig.flux1_dev(), remat=True)
        vae_cfg = VAEConfig.flux()
        tparams = load_flux_transformer(
            os.path.join(args.pretrain_models, "flux", "transformer"), cfg
        )
        vparams = load_vae(os.path.join(args.pretrain_models, "flux", "vae"), vae_cfg)
        view_size = 512

    pipe_data = 1
    if args.pipe:
        assert not args.full_finetune, "--pipe composes with LoRA training"
        assert jax.device_count() > 1 and jax.device_count() % args.pipe == 0, (
            f"{jax.device_count()} devices not divisible by --pipe {args.pipe}")
        pipe_data = jax.device_count() // args.pipe
        assert args.data_mesh in (1, pipe_data), (
            f"--data-mesh {args.data_mesh} conflicts with --pipe "
            f"{args.pipe}: the data axis is device_count // pipe = "
            f"{pipe_data} (all devices are consumed by the data x pipe "
            f"mesh)")
        print(f"[launcher] effective mesh: data={pipe_data} x pipe={args.pipe}")
        assert args.batch_size % pipe_data == 0, (
            f"--batch-size {args.batch_size} not divisible by the data axis "
            f"{pipe_data}")
    # default: one sample per data row per microbatch
    n_micro = args.pipe_n_micro or max(1, args.batch_size // pipe_data)
    if args.pipe:
        assert args.batch_size % n_micro == 0 and (
            args.batch_size // n_micro) % pipe_data == 0, (
            f"--batch-size {args.batch_size} / --pipe-n-micro {n_micro} "
            f"microbatches must shard over the data axis {pipe_data}")

    tcfg = FluxLoraTrainConfig(
        rank=args.rank,
        learning_rate=args.learning_rate,
        optimizer=args.optimizer,
        lr_scheduler=args.lr_scheduler,
        warmup_steps=args.warmup_steps,
        max_train_steps=args.max_train_steps,
        drop_rate=args.drop_rate,
        preconditioning_loss=args.preconditioning_loss,
        preconditioning_loss_weight=args.preconditioning_loss_weight,
        prior_preservation=args.prior_preservation,
        prior_loss_weight=args.prior_loss_weight,
        pipe_axis="pipe" if args.pipe else None,
        pipe_n_micro=n_micro,
        pipe_data_axis="data" if (args.pipe and pipe_data > 1) else None,
    )
    loss_vae = (vparams, vae_cfg) if args.preconditioning_loss else (None, None)

    assert not (args.full_finetune and args.grad_accum > 1), \
        "--grad-accum composes with LoRA training only"
    assert not (args.full_finetune and args.preconditioning_loss), \
        "--preconditioning-loss composes with LoRA training only " \
        "(full_train_step does not thread the frozen VAE)"
    assert not (args.prior_preservation and args.batch_size % 2), \
        "--prior-preservation needs an even --batch-size ([instance; prior])"

    if args.pipe and jax.device_count() > 1:
        # data x pipe mesh: block stacks stage over 'pipe' inside the step
        # (shard_map in_specs split the layer axis; weights stay replicated
        # in HBM at this scale), batch shards over 'data'
        from jax.sharding import Mesh as _Mesh

        mesh = _Mesh(
            np.asarray(jax.devices()[: pipe_data * args.pipe]).reshape(
                pipe_data, args.pipe
            ),
            ("data", "pipe"),
        )
        pshard = None
    else:
        mesh = make_mesh(data=args.data_mesh, model=-1) if jax.device_count() > 1 else None
        pshard = flux_param_shardings(tparams, mesh) if mesh is not None else None
        if mesh is not None:
            tparams = shard_params(tparams, pshard)

    from contextlib import nullcontext

    def _ambient():
        """PP reaches the mesh through jax.set_mesh (the step's shard_map
        has no static mesh arg)."""
        return jax.set_mesh(mesh) if args.pipe and mesh is not None else nullcontext()

    mgr = CheckpointManager(
        args.output_dir, args.checkpoint_every, args.checkpoints_total_limit
    )
    if args.full_finetune:
        from unitex_tpu.training.flux_lora import make_optimizer

        tx = make_optimizer(tcfg)
        # ZeRO's data-axis opt resharding emits collective-permutes that
        # deadlock XLA's in-process CPU collectives when combined with
        # remat (virtual-device emulation only; measured 2026-08); fall
        # back to param-aligned opt sharding there.
        zero_ok = jax.default_backend() != "cpu" or not cfg.remat
        if mesh is not None and zero_ok:
            opt0, _ = shard_opt_state_zero(tparams, pshard, mesh, tx)
        elif mesh is not None:
            print("[launcher] cpu+remat: ZeRO opt sharding disabled "
                  "(in-process collective deadlock); opt follows param shardings")
            with jax.set_mesh(mesh):
                opt0 = jax.jit(tx.init)(tparams)
        else:
            opt0 = tx.init(tparams)
        state = FullTrainState(
            step=jnp.zeros((), jnp.int32), params=tparams, opt_state=opt0
        )
        restored = mgr.restore_latest(state.params)
        if restored is not None:
            print(f"resumed full params from step {mgr.latest_step()}")
            state = dataclasses.replace(
                state, params=restored,
                step=jnp.asarray(mgr.latest_step(), jnp.int32),
            )
    else:
        state, tx = create_train_state(jax.random.key(args.seed), tparams, tcfg)
        restored = mgr.restore_latest(state.lora)
        if restored is not None:
            print(f"resumed LoRA from step {mgr.latest_step()}")
            state = dataclasses.replace(
                state, lora=restored, step=jnp.asarray(mgr.latest_step(), jnp.int32)
            )
        if args.pipe and mesh is not None:
            # one-time pad/tag/storage-shard of both the base stacks and
            # the adapter (models/flux/pp.py): the traced step then
            # consumes the resident layout with no in-trace concatenates —
            # the per-call padding path made XLA SPMD emit an involuntary
            # full rematerialization of the block params every step.
            # Checkpoints store the STRIPPED (unpadded) adapter, so resume
            # above works for any pipe config; opt state re-inits on the
            # padded adapter (the CLI never checkpoints moments).
            from unitex_tpu.models.flux.pp import (
                prepare_flux_params_pp,
                prepare_lora_pp,
            )

            tparams = prepare_flux_params_pp(tparams, mesh)
            lora_pp = prepare_lora_pp(state.lora, mesh)
            with jax.set_mesh(mesh):
                opt_pp = jax.jit(tx.init)(lora_pp)
            state = dataclasses.replace(state, lora=lora_pp, opt_state=opt_pp)

    def _export_params(st):
        """Checkpoint payload: full params, or the portable (pipe-padding-
        stripped) adapter."""
        if args.full_finetune:
            return st.params
        if args.pipe and mesh is not None:
            from unitex_tpu.models.flux.pp import strip_lora_padding

            return strip_lora_padding(st.lora, cfg)
        return st.lora

    # fixed-prompt conditioning, computed once: the reference embeds the
    # trigger prompt with CLIP-L + T5 (trainer.py:165-181); our encoders
    # run on-device (models/text_jax.py).  Zero embeds otherwise — the
    # inference-parity null conditioning.
    seq_np = pooled_np = None
    if args.prompt and args.pretrain_models:
        from unitex_tpu.models.text_encoders import build_text_encoders

        enc = build_text_encoders(args.pretrain_models)
        if enc is not None:
            seq_np, pooled_np = enc([args.prompt])
            if (seq_np.shape[-1] != cfg.joint_attention_dim
                    or pooled_np.shape[-1] != cfg.pooled_projection_dim):
                print("[launcher] text-encoder dims do not match the model "
                      "config; using zero embeddings")
                seq_np = pooled_np = None
    if seq_np is None:
        seq_np = np.zeros((1, 512, cfg.joint_attention_dim), np.float32)
        pooled_np = np.zeros((1, cfg.pooled_projection_dim), np.float32)
    seq_e, pooled_e = jnp.asarray(seq_np[0]), jnp.asarray(pooled_np[0])

    logger = MetricLogger(args.output_dir)
    if args.data_dir:
        ds = iter(DirectoryTextureDataset(
            args.data_dir, mode=args.mode, seed=args.seed))
    else:
        ds = iter(SyntheticTextureDataset(view_size=view_size, seed=args.seed))

    step0 = int(state.step)
    for step in range(step0, args.max_train_steps):
        examples = [next(ds) for _ in range(args.batch_size * args.grad_accum)]
        target = jnp.asarray(np.stack([e["target"] for e in examples]))
        control = jnp.asarray(np.stack([e["control"] for e in examples]))
        latents = vae_encode(vparams, vae_cfg, target * 2.0 - 1.0)
        from unitex_tpu.models.flux.pipeline import latent_image_ids, pack_latents

        ctrl_lat = vae_encode(vparams, vae_cfg, control * 2.0 - 1.0)
        HL, WL = latents.shape[1], latents.shape[2]
        CH, CW = ctrl_lat.shape[1], ctrl_lat.shape[2]
        cond_tokens = pack_latents(ctrl_lat)
        # ids from the CONTROL latent's own dims, offset past the noise
        # grid — exactly inference's layout (models/flux/pipeline.py)
        cond_ids = latent_image_ids(CH // 2, CW // 2, offset_y=HL // 2)
        if all("dual" in e for e in examples):
            # reference-image tokens, offset like inference's dual stream
            # (x + WL/2, y + HL/2; models/flux/pipeline.py)
            dual = jnp.asarray(np.stack([e["dual"] for e in examples]))
            dual_lat = vae_encode(vparams, vae_cfg, dual * 2.0 - 1.0)
            DH, DW = dual_lat.shape[1], dual_lat.shape[2]
            cond_tokens = jnp.concatenate(
                [cond_tokens, pack_latents(dual_lat)], axis=1)
            cond_ids = jnp.concatenate([
                cond_ids,
                latent_image_ids(DH // 2, DW // 2,
                                 offset_x=WL // 2, offset_y=HL // 2),
            ], axis=0)
        elif any("dual" in e for e in examples):
            # mixed corpus: conditioning must be shape-static per step —
            # drop the dual stream rather than crash or skew the batch
            print("warning: batch mixes samples with/without the dual "
                  "reference image; dual tokens dropped this step")
        batch = {
            "latents": latents,
            "cond_tokens": cond_tokens,
            "cond_ids": cond_ids,
            "prompt_embeds": jnp.broadcast_to(
                seq_e, (latents.shape[0], *seq_e.shape)),
            "pooled_embeds": jnp.broadcast_to(
                pooled_e, (latents.shape[0], *pooled_e.shape)),
        }
        if args.preconditioning_loss:
            batch["pixel_values"] = target
        if args.grad_accum > 1:
            # [A*B, ...] -> [A, B, ...] microbatch axis for the scan;
            # cond_ids is per-sequence (unbatched) and just broadcasts
            batch = {
                k: (jnp.broadcast_to(v, (args.grad_accum, *v.shape))
                    if k == "cond_ids" else
                    v.reshape(args.grad_accum, args.batch_size, *v.shape[1:]))
                for k, v in batch.items()
            }
        if mesh is not None:
            def _put(k, v):
                if k == "cond_ids":  # per-sequence ids: replicate
                    return jax.device_put(
                        v, jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))
                if args.grad_accum > 1:  # [A, B, ...]: shard B over 'data'
                    spec = jax.sharding.PartitionSpec(
                        None, "data", *([None] * (v.ndim - 2)))
                    return jax.device_put(
                        v, jax.sharding.NamedSharding(mesh, spec))
                return jax.device_put(v, data_sharding(mesh, v.ndim))

            batch = {k: _put(k, v) for k, v in batch.items()}
        if args.full_finetune:
            state, loss = full_train_step(
                state, batch, jax.random.key(1000 + step), cfg, tcfg, tx,
                bf16_compute=args.bf16_compute,
            )
        elif args.grad_accum > 1:
            with _ambient():
                state, loss = train_step_accum(
                    state, tparams, batch, jax.random.key(1000 + step), cfg, tcfg, tx,
                    vae_params=loss_vae[0], vae_cfg=loss_vae[1],
                )
        else:
            with _ambient():
                state, loss = train_step(
                    state, tparams, batch, jax.random.key(1000 + step), cfg, tcfg, tx,
                    vae_params=loss_vae[0], vae_cfg=loss_vae[1],
                )
        logger.log(step, {"loss": float(loss)})
        if step % 10 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
        if mgr.should_save(step):
            mgr.save(step, _export_params(state))
        if args.validation_steps and step > 0 and step % args.validation_steps == 0:
            from unitex_tpu.models.flux.lora import merge_lora
            from unitex_tpu.models.flux.pipeline import (
                FluxPipelineConfig,
                run_flux_pipeline,
            )
            from unitex_tpu.utils.image_io import save_image

            merged = (
                state.params if args.full_finetune
                else merge_lora(tparams, [(state.lora, 1.0)])
            )
            val_forward = None
            if args.pipe and mesh is not None:
                # merged params are the prepared (padded, _valid-tagged,
                # pipe-sharded) layout — only flux_forward_pp consumes it
                from functools import partial as _partial

                from unitex_tpu.models.flux.pp import flux_forward_pp

                # batch is 1 here: single microbatch, no data sharding
                val_forward = _partial(flux_forward_pp, mesh=mesh, n_micro=1)
            gh, gw = control.shape[1], control.shape[2]
            img = run_flux_pipeline(
                merged, cfg, vparams, vae_cfg, jax.random.key(args.seed),
                FluxPipelineConfig(
                    height=gh, width=gw, num_inference_steps=8,
                    max_sequence_length=8 if args.tiny else 512,
                ),
                control_image=control[0],
                forward_fn=val_forward,
            )
            save_image(
                os.path.join(args.output_dir, f"validation_{step}.png"), img
            )
    mgr.save(args.max_train_steps, _export_params(state))
    logger.close()


if __name__ == "__main__":
    main()
