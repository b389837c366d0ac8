import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unitex_tpu.models.flux.config import FluxConfig
from unitex_tpu.models.flux.lora import init_lora_params, merge_lora
from unitex_tpu.models.flux.model import flux_forward, init_flux_params
from unitex_tpu.models.flux.pipeline import latent_image_ids, pack_latents
from unitex_tpu.parallel.mesh import make_mesh
from unitex_tpu.parallel.sharding import (
    data_sharding,
    flux_param_shardings,
    shard_params,
)
from unitex_tpu.training.flux_lora import (
    FluxLoraTrainConfig,
    create_train_state,
    flow_match_loss,
    train_step,
)


def _tiny_batch(cfg, B=2, H=8, W=8, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    C = cfg.in_channels // 4
    return {
        "latents": jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)),
        "prompt_embeds": jnp.zeros((B, 8, cfg.joint_attention_dim)),
        "pooled_embeds": jnp.zeros((B, cfg.pooled_projection_dim)),
    }


class TestLora:
    def test_zero_lora_is_identity(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        lora = init_lora_params(jax.random.key(1), params, rank=4)
        merged = merge_lora(params, [(lora, 1.0)])
        # b is zero-init so merge must be a no-op
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), params, merged
        )
        assert max(jax.tree.leaves(diff)) == 0.0

    def test_lora_changes_kernels_only_targets(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        lora = init_lora_params(jax.random.key(1), params, rank=4)
        # make b nonzero
        lora = jax.tree.map(lambda x: x + 0.1, lora)
        merged = merge_lora(params, [(lora, 1.0)])
        q0 = params["dual_blocks"]["attn"]["to_q"]["kernel"]
        q1 = merged["dual_blocks"]["attn"]["to_q"]["kernel"]
        assert float(jnp.abs(q1 - q0).max()) > 0
        # non-target (x_embedder) untouched
        np.testing.assert_array_equal(
            np.asarray(params["x_embedder"]["kernel"]),
            np.asarray(merged["x_embedder"]["kernel"]),
        )
        # dual-adapter weighted merge: [1,0] keeps only adapter one
        lora2 = init_lora_params(jax.random.key(2), params, rank=4)
        m2 = merge_lora(params, [(lora, 1.0), (lora2, 0.0)])
        np.testing.assert_allclose(
            np.asarray(m2["dual_blocks"]["attn"]["to_q"]["kernel"]),
            np.asarray(q1),
            atol=1e-6,
        )


class TestTraining:
    def test_loss_finite_and_decreases(self):
        cfg = FluxConfig.tiny()
        tcfg = FluxLoraTrainConfig(rank=4, learning_rate=1e-2)
        base = init_flux_params(jax.random.key(0), cfg)
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        batch = _tiny_batch(cfg)
        losses = []
        for i in range(5):
            state, loss = train_step(
                state, base, batch, jax.random.key(100), cfg, tcfg, tx
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        # same batch + same key: loss must strictly decrease over steps
        assert losses[-1] < losses[0]

    def test_grad_only_on_lora(self):
        cfg = FluxConfig.tiny()
        tcfg = FluxLoraTrainConfig(rank=4)
        base = init_flux_params(jax.random.key(0), cfg)
        lora = init_lora_params(jax.random.key(1), base, rank=4)
        batch = _tiny_batch(cfg)
        g = jax.grad(flow_match_loss)(lora, base, cfg, tcfg, batch, jax.random.key(0))
        # gradient pytree matches lora structure and is finite
        assert jax.tree.structure(g) == jax.tree.structure(lora)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
        # b-gradients nonzero (a @ db path active even with b=0)
        gb = g["dual_blocks"]["attn"]["to_q"]["b"]
        assert float(jnp.abs(gb).max()) > 0


class TestSharding:
    def test_tp_matches_single_device(self):
        """TP-sharded forward must equal the unsharded result."""
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        B, S_img, S_txt = 2, 16, 8
        hidden = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, S_img, cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.zeros((B, S_txt, cfg.joint_attention_dim))
        ids = latent_image_ids(4, 4)
        tids = jnp.zeros((S_txt, 3))
        pooled = jnp.zeros((B, cfg.pooled_projection_dim))
        t = jnp.full((B,), 0.5)
        g = jnp.full((B,), 3.5)

        ref = flux_forward(params, cfg, hidden, ctx, t, pooled, ids, tids, g)

        mesh = make_mesh(data=2, model=4)
        shardings = flux_param_shardings(params, mesh)
        sharded = shard_params(params, shardings)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, h: flux_forward(p, cfg, h, ctx, t, pooled, ids, tids, g)
            )(sharded, jax.device_put(hidden, data_sharding(mesh, 3)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_dp_tp_train_step(self):
        """One LoRA training step over a 4x2 (data x model) mesh — the
        multi-chip dryrun configuration."""
        cfg = FluxConfig.tiny()
        tcfg = FluxLoraTrainConfig(rank=4)
        base = init_flux_params(jax.random.key(0), cfg)
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        mesh = make_mesh(data=4, model=2)
        shardings = flux_param_shardings(base, mesh)
        base_s = shard_params(base, shardings)
        batch = _tiny_batch(cfg, B=4)
        batch = {k: jax.device_put(v, data_sharding(mesh, v.ndim)) for k, v in batch.items()}
        with jax.set_mesh(mesh):
            state2, loss = train_step(
                state, base_s, batch, jax.random.key(0), cfg, tcfg, tx
            )
        assert np.isfinite(float(loss))
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.lora, state2.lora
        )
        assert max(jax.tree.leaves(moved)) > 0


class TestTokenDrop:
    def test_drop_rate_loss_finite(self):
        cfg = FluxConfig.tiny()
        tcfg = FluxLoraTrainConfig(rank=4, drop_rate=0.5)
        base = init_flux_params(jax.random.key(0), cfg)
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        batch = _tiny_batch(cfg)
        state2, loss = train_step(
            state, base, batch, jax.random.key(0), cfg, tcfg, tx
        )
        assert np.isfinite(float(loss))

    def test_kv_keep_idx_full_is_identity(self):
        """Keeping every kv token must equal the unrestricted forward."""
        from unitex_tpu.models.flux.pipeline import latent_image_ids

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        hidden = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 8, cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.zeros((1, 4, cfg.joint_attention_dim))
        ids = latent_image_ids(2, 4)
        tids = jnp.zeros((4, 3))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        t = jnp.asarray([0.5])
        g = jnp.asarray([3.5])
        from unitex_tpu.models.flux.model import flux_forward

        full = flux_forward(params, cfg, hidden, ctx, t, pooled, ids, tids, g)
        idx = jnp.arange(4 + 8)  # S_txt + S_img
        same = flux_forward(
            params, cfg, hidden, ctx, t, pooled, ids, tids, g, kv_keep_idx=idx
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(same), atol=1e-5)

    def test_kv_subset_changes_output(self):
        from unitex_tpu.models.flux.pipeline import latent_image_ids
        from unitex_tpu.models.flux.model import flux_forward

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        hidden = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 8, cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.zeros((1, 4, cfg.joint_attention_dim))
        ids = latent_image_ids(2, 4)
        tids = jnp.zeros((4, 3))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        t = jnp.asarray([0.5])
        g = jnp.asarray([3.5])
        full = flux_forward(params, cfg, hidden, ctx, t, pooled, ids, tids, g)
        sub = flux_forward(
            params, cfg, hidden, ctx, t, pooled, ids, tids, g,
            kv_keep_idx=jnp.arange(4 + 4),  # text + half the image tokens
        )
        assert np.abs(np.asarray(full) - np.asarray(sub)).max() > 1e-5


class TestShardedInference:
    def test_tp_denoise_pipeline(self):
        """run_flux_pipeline with TP-sharded transformer params on the
        8-device mesh — the production inference layout."""
        from unitex_tpu.models.flux.pipeline import (
            FluxPipelineConfig,
            run_flux_pipeline,
        )
        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_flux_params(jax.random.key(0), cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        pipe_cfg = FluxPipelineConfig(
            height=16, width=32, num_inference_steps=2, max_sequence_length=8
        )
        control = jnp.ones((16, 32, 3)) * 0.5

        ref = run_flux_pipeline(
            tparams, cfg, vparams, vae_cfg, jax.random.key(63), pipe_cfg,
            control_image=control,
        )

        mesh = make_mesh(data=1, model=8)
        sharded = shard_params(tparams, flux_param_shardings(tparams, mesh))
        with jax.set_mesh(mesh):
            out = run_flux_pipeline(
                sharded, cfg, vparams, vae_cfg, jax.random.key(63), pipe_cfg,
                control_image=control,
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


class TestLoraIO:
    def test_safetensors_roundtrip(self, tmp_path):
        from unitex_tpu.models.flux.lora import (
            load_lora_safetensors,
            save_lora_safetensors,
        )

        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        lora = init_lora_params(jax.random.key(1), base, rank=4)
        lora = jax.tree.map(lambda x: x + 0.01, lora)  # nonzero b
        path = str(tmp_path / "pytorch_lora_weights.safetensors")
        save_lora_safetensors(path, lora)
        back = load_lora_safetensors(
            path, cfg.num_layers, cfg.num_single_layers
        )
        # every saved target round-trips exactly
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), lora, back
        )
        assert max(jax.tree.leaves(diff)) < 1e-7
        # and a merge with the loaded adapter matches the original merge
        m1 = merge_lora(base, [(lora, 1.0)])
        m2 = merge_lora(base, [(back, 1.0)])
        np.testing.assert_allclose(
            np.asarray(m1["dual_blocks"]["attn"]["to_q"]["kernel"]),
            np.asarray(m2["dual_blocks"]["attn"]["to_q"]["kernel"]),
            atol=1e-7,
        )


class TestGradAccum:
    def test_accum_equals_big_batch(self):
        """A=2 microbatches of B=1 must match one B=2 step when the
        per-microbatch RNG is fixed (same timesteps/noise per sample)."""
        from unitex_tpu.training.flux_lora import train_step_accum

        cfg = FluxConfig.tiny()
        tcfg = FluxLoraTrainConfig(rank=4, learning_rate=1e-3)
        base = init_flux_params(jax.random.key(0), cfg)
        state0, tx = create_train_state(jax.random.key(1), base, tcfg)

        batch = _tiny_batch(cfg, B=2)
        micro = jax.tree.map(lambda x: x.reshape(2, 1, *x.shape[1:]), batch)
        state_a, loss_a = train_step_accum(
            state0, base, micro, jax.random.key(5), cfg, tcfg, tx
        )
        assert np.isfinite(float(loss_a))

        # manual two-microbatch average with the same split keys
        keys = jax.random.split(jax.random.key(5), 2)
        gsum = None
        for i in range(2):
            mb = jax.tree.map(lambda x: x[i], micro)
            g = jax.grad(flow_match_loss)(
                state0.lora, base, cfg, tcfg, mb, keys[i]
            )
            gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        import optax

        grads = jax.tree.map(lambda x: x / 2, gsum)
        upd, _ = tx.update(grads, state0.opt_state, state0.lora)
        want = optax.apply_updates(state0.lora, upd)
        # scan vs python-loop accumulation: identical up to float ordering
        for a, b in zip(jax.tree.leaves(state_a.lora), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestTrainerExtras:
    """Prior preservation + preconditioning pixel loss (trainer.py:
    1093-1122)."""

    def test_prior_preservation_split(self):
        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        lora = init_lora_params(jax.random.key(1), base, rank=4)
        batch = _tiny_batch(cfg, B=4)
        key = jax.random.key(2)
        # weight 0: only the first (instance) half contributes
        t0 = FluxLoraTrainConfig(
            rank=4, prior_preservation=True, prior_loss_weight=0.0
        )
        t1 = FluxLoraTrainConfig(
            rank=4, prior_preservation=True, prior_loss_weight=1.0
        )
        l0 = float(flow_match_loss(lora, base, cfg, t0, batch, key))
        l1 = float(flow_match_loss(lora, base, cfg, t1, batch, key))
        assert np.isfinite(l0) and np.isfinite(l1)
        assert l1 > l0  # the prior half adds a positive term

    def test_preconditioning_pixel_loss(self):
        from unitex_tpu.models.flux.vae import (
            VAEConfig,
            init_vae_params,
            vae_decode,
        )

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        lora = init_lora_params(jax.random.key(2), base, rank=4)
        batch = _tiny_batch(cfg, B=2)
        ds = vae_cfg.downscale
        B, H, W, _ = batch["latents"].shape
        batch["pixel_values"] = jnp.full((B, H * ds, W * ds, 3), 0.5)
        key = jax.random.key(3)

        t_off = FluxLoraTrainConfig(rank=4)
        t_on = FluxLoraTrainConfig(
            rank=4, preconditioning_loss=True, preconditioning_loss_weight=2.0
        )
        l_off = float(flow_match_loss(lora, base, cfg, t_off, batch, key))
        l_on = float(
            flow_match_loss(
                lora, base, cfg, t_on, batch, key,
                vae_params=vparams, vae_cfg=vae_cfg,
            )
        )
        assert np.isfinite(l_on) and l_on > l_off
        # gradients flow through the VAE decode into the LoRA
        g = jax.grad(flow_match_loss)(
            lora, base, cfg, t_on, batch, key,
            vae_params=vparams, vae_cfg=vae_cfg,
        )
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_preconditioning_with_token_drop(self):
        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        lora = init_lora_params(jax.random.key(2), base, rank=4)
        batch = _tiny_batch(cfg, B=2)
        ds = vae_cfg.downscale
        B, H, W, _ = batch["latents"].shape
        batch["pixel_values"] = jnp.full((B, H * ds, W * ds, 3), 0.5)
        tcfg = FluxLoraTrainConfig(
            rank=4, drop_rate=0.5, preconditioning_loss=True
        )
        loss = float(
            flow_match_loss(
                lora, base, cfg, tcfg, batch, jax.random.key(3),
                vae_params=vparams, vae_cfg=vae_cfg,
            )
        )
        assert np.isfinite(loss)
