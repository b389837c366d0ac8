"""int8 W8A8 quantized serving (the reference's quantized-serving
capability, pipeline.py:87-95 NF4 branch, rebuilt as an MXU int8 speedup)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.flux.config import FluxConfig
from unitex_tpu.models.flux.model import flux_forward, init_flux_params
from unitex_tpu.models.flux.pipeline import latent_image_ids
from unitex_tpu.ops.quant import (
    count_quantized,
    int8_matmul,
    quantize_kernel,
    quantize_linears,
)


class TestInt8Matmul:
    def test_accuracy_vs_exact(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        q, s = quantize_kernel(w)
        rel = float(jnp.linalg.norm(int8_matmul(x, q, s) - x @ w)
                    / jnp.linalg.norm(x @ w))
        assert rel < 0.02, rel

    def test_per_channel_scales_handle_column_outliers(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(128, 64)).astype(np.float32)
        w[:, 0] *= 1000.0  # one huge output channel must not wreck the rest
        q, s = quantize_kernel(jnp.asarray(w))
        x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        y = int8_matmul(x, q, s)
        ref = x @ jnp.asarray(w)
        rel_small = float(jnp.linalg.norm(y[:, 1:] - ref[:, 1:])
                          / jnp.linalg.norm(ref[:, 1:]))
        assert rel_small < 0.02, rel_small

    def test_per_token_scales_handle_row_outliers(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(16, 128)).astype(np.float32)
        x[0] *= 1000.0
        w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
        q, s = quantize_kernel(w)
        y = int8_matmul(jnp.asarray(x), q, s)
        ref = jnp.asarray(x) @ w
        rel = float(jnp.linalg.norm(y[1:] - ref[1:]) / jnp.linalg.norm(ref[1:]))
        assert rel < 0.02, rel

    def test_stacked_layer_axis(self):
        rng = np.random.default_rng(3)
        wL = jnp.asarray(rng.normal(size=(3, 64, 32)).astype(np.float32))
        qL, sL = quantize_kernel(wL)
        assert qL.shape == (3, 64, 32) and sL.shape == (3, 32)
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        for i in range(3):
            rel = float(jnp.linalg.norm(int8_matmul(x, qL[i], sL[i]) - x @ wL[i])
                        / jnp.linalg.norm(x @ wL[i]))
            assert rel < 0.02

    def test_bf16_inputs(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(8, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_kernel(w)
        y = int8_matmul(x, q, s)
        assert y.dtype == jnp.bfloat16


class TestQuantizedFlux:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = dataclasses.replace(FluxConfig.tiny(), dtype="bfloat16")
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        B, S_img, S_txt = 1, 64, 16
        args = (
            jnp.asarray(rng.normal(size=(B, S_img, cfg.in_channels)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(B, S_txt, cfg.joint_attention_dim)).astype(np.float32)),
            jnp.full((B,), 0.5),
            jnp.zeros((B, cfg.pooled_projection_dim)),
            latent_image_ids(8, 8),
            jnp.zeros((S_txt, 3)),
            jnp.full((B,), 3.5),
        )
        return cfg, params, args

    def test_only_block_projections_quantized(self, setup):
        cfg, params, _ = setup
        qparams = quantize_linears(params)
        # embedders and AdaLN modulations keep float kernels
        assert "kernel" in qparams["x_embedder"]
        assert "kernel" in qparams["norm_out"]["lin"]
        assert "kernel" in qparams["dual_blocks"]["norm1"]["lin"]
        # q/k stay bf16 (their dequant feeds the rms-norm reduction, which
        # defeats epilogue fusion — measured slower on TPU)
        assert "kernel" in qparams["dual_blocks"]["attn"]["to_q"]
        assert "kernel" in qparams["single_blocks"]["attn"]["to_k"]
        # v/out/mlp projections are int8
        assert "kernel_int8" in qparams["dual_blocks"]["attn"]["to_v"]
        assert "kernel_int8" in qparams["dual_blocks"]["ff"]["in"]
        assert "kernel_int8" in qparams["single_blocks"]["proj_out"]
        n_q, n_f = count_quantized(qparams)
        assert n_q > n_f  # most parameters ride the int8 path

    def test_forward_close_to_bf16(self, setup):
        cfg, params, args = setup
        qparams = quantize_linears(params)
        out_bf = flux_forward(params, cfg, *args)
        out_q = flux_forward(qparams, cfg, *args)
        rel = float(jnp.linalg.norm(out_q - out_bf) / jnp.linalg.norm(out_bf))
        cos = float(jnp.sum(out_q * out_bf)
                    / (jnp.linalg.norm(out_q) * jnp.linalg.norm(out_bf)))
        # int8 deviation stays below bf16's own deviation from f32 (~0.7%)
        assert rel < 0.02, rel
        assert cos > 0.999, cos

    def test_jits_and_is_deterministic(self, setup):
        cfg, params, args = setup
        qparams = quantize_linears(params)
        f = jax.jit(lambda p, *a: flux_forward(p, cfg, *a))
        a = f(qparams, *args)
        b = f(qparams, *args)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedQuantizedFlux:
    def test_fusion_is_exact_and_int8_close(self):
        import dataclasses as dc
        from unitex_tpu.models.flux.quantize import (
            fuse_flux_projections,
            quantize_flux_params,
        )

        cfg = dc.replace(FluxConfig.tiny(), dtype="bfloat16")
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        args = (
            jnp.asarray(rng.normal(size=(1, 64, cfg.in_channels)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 16, cfg.joint_attention_dim)).astype(np.float32)),
            jnp.full((1,), 0.5),
            jnp.zeros((1, cfg.pooled_projection_dim)),
            latent_image_ids(8, 8),
            jnp.zeros((16, 3)),
            jnp.full((1,), 3.5),
        )
        out_bf = flux_forward(params, cfg, *args)
        # fusion alone is a pure reassociation: bit-exact
        out_fused = flux_forward(fuse_flux_projections(params), cfg, *args)
        np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_bf))
        # default (unfused, selective) int8 == quantize_linears
        out_q = flux_forward(quantize_flux_params(params), cfg, *args)
        out_q_unfused = flux_forward(quantize_linears(params), cfg, *args)
        np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_q_unfused))
        rel = float(jnp.linalg.norm(out_q - out_bf) / jnp.linalg.norm(out_bf))
        assert rel < 0.02, rel
        # fused int8 also stays close (different activation-quant grouping
        # for q/k/v, which ride the int8 path when fused)
        out_qf = flux_forward(quantize_flux_params(params, fuse=True), cfg, *args)
        relf = float(jnp.linalg.norm(out_qf - out_bf) / jnp.linalg.norm(out_bf))
        assert relf < 0.02, relf

    def test_fused_keys_and_removed_originals(self):
        from unitex_tpu.models.flux.quantize import quantize_flux_params

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.PRNGKey(1), cfg)
        q = quantize_flux_params(params, fuse=True)
        assert "kernel_int8" in q["dual_blocks"]["attn"]["qkv_fused"]
        assert "kernel_int8" in q["dual_blocks"]["attn"]["add_qkv_fused"]
        assert "kernel_int8" in q["single_blocks"]["qkvm_fused"]
        assert "to_q" not in q["dual_blocks"]["attn"]
        assert "proj_mlp" not in q["single_blocks"]
        # q/k rms norms survive fusion
        assert "norm_q" in q["single_blocks"]["attn"]


class TestQuantizedTP:
    def test_int8_tp_matches_single_device(self):
        """int8 serving composes with tensor parallelism: the quantized
        tree shards (kernel_int8 like kernel, col scales over 'model') and
        the TP forward equals the unsharded int8 forward."""
        from unitex_tpu.models.flux.quantize import quantize_flux_params
        from unitex_tpu.parallel.mesh import make_mesh
        from unitex_tpu.parallel.sharding import (
            data_sharding,
            flux_param_shardings,
            shard_params,
        )

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        qparams = quantize_flux_params(params)
        B, S_img, S_txt = 2, 16, 8
        hidden = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, S_img, cfg.in_channels)),
            jnp.float32)
        ctx = jnp.zeros((B, S_txt, cfg.joint_attention_dim))
        ids = latent_image_ids(4, 4)
        tids = jnp.zeros((S_txt, 3))
        pooled = jnp.zeros((B, cfg.pooled_projection_dim))
        t = jnp.full((B,), 0.5)
        g = jnp.full((B,), 3.5)

        ref = flux_forward(qparams, cfg, hidden, ctx, t, pooled, ids, tids, g)

        mesh = make_mesh(data=2, model=4)
        shardings = flux_param_shardings(qparams, mesh)
        sharded = shard_params(qparams, shardings)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, h: flux_forward(p, cfg, h, ctx, t, pooled, ids, tids, g)
            )(sharded, jax.device_put(hidden, data_sharding(mesh, 3)))
        # per-shard activation-quant scales may differ from the global ones
        # (each chip quantizes its feature slice for row-parallel inputs),
        # so agreement is approximate, not bitwise
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel


class TestQuantizedSD3:
    def test_sd3_int8_forward_close_to_bf16(self):
        """quantize_linears composes with the SD3 tree (shared 'blocks' +
        linear dispatch) — the TSD-SR int8 serving mode."""
        import dataclasses as dc

        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params, sd3_forward

        cfg = SD3Config.tiny()
        params = init_sd3_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_linears(params)
        assert "kernel_int8" in qparams["blocks"]["attn"]["to_v"]
        assert "kernel" in qparams["blocks"]["attn"]["to_q"]
        assert "kernel" in qparams["pos_embed"]["proj"]

        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(1, 8, 8, cfg.in_channels)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(1, 6, cfg.joint_attention_dim)).astype(np.float32))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        t = jnp.asarray([1000.0])
        out_bf = sd3_forward(params, cfg, lat, ctx, t, pooled)
        out_q = sd3_forward(qparams, cfg, lat, ctx, t, pooled)
        rel = float(jnp.linalg.norm(out_q - out_bf) / jnp.linalg.norm(out_bf))
        assert rel < 0.02, rel

    def test_tsdsr_pipeline_int8_flag(self):
        """TSDSRConfig.int8_serving quantizes the transformer on init and
        the pipeline still runs end to end."""
        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params
        from unitex_tpu.models.sd3.sr_pipeline import TSDSRConfig, TSDSRPipeline

        sd3_cfg = SD3Config.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_sd3_params(jax.random.PRNGKey(0), sd3_cfg)
        vparams = init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        pipe = TSDSRPipeline(
            None,
            cfg=TSDSRConfig(
                upscale=2, latent_tile=8, latent_overlap=2,
                vae_encoder_tile=64, vae_decoder_tile=64,
                align_method="adain", int8_serving=True,
            ),
            sd3_cfg=sd3_cfg,
            transformer_params=tparams,
            vae_params=vparams,
        )
        pipe.vae_cfg = vae_cfg  # tiny VAE (downscale 2, not 8)
        assert "kernel_int8" in pipe.transformer_params["blocks"]["attn"]["to_v"]
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        out = np.asarray(pipe(img))
        assert out.shape == (32, 32, 3)
        assert np.isfinite(out).all()

    def test_final_block_quantized(self):
        """SD3's final (unstacked) joint block rides the int8 path too."""
        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params

        cfg = SD3Config.tiny()
        qparams = quantize_linears(init_sd3_params(jax.random.PRNGKey(0), cfg))
        assert "kernel_int8" in qparams["final_block"]["attn"]["to_v"]
        assert "kernel" in qparams["final_block"]["norm1"]["lin"]  # AdaLN bf16


class TestWeightOnlyInt8:
    """Max-memory serving mode: q/k + AdaLN kernels stored int8, dequantized
    to bf16 at the matmul (the 12B-on-one-v5e-chip mode)."""

    def test_weight_only_matmul_accuracy(self):
        from unitex_tpu.ops.quant import int8_weight_only_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32))
        q, s = quantize_kernel(w)
        rel = float(jnp.linalg.norm(int8_weight_only_matmul(x, q, s) - x @ w)
                    / jnp.linalg.norm(x @ w))
        assert rel < 0.01, rel  # only the weight is quantized: tighter than W8A8

    def test_stacked_weight_only(self):
        from unitex_tpu.ops.quant import int8_weight_only_matmul

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 16, 12)).astype(np.float32))
        q, s = quantize_kernel(w)
        out = int8_weight_only_matmul(x, q, s)
        ref = jnp.einsum("lbi,lio->lbo", x, w)
        assert float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)) < 0.01

    def test_max_memory_flux_coverage_and_parity(self):
        from unitex_tpu.models.flux.quantize import quantize_flux_params

        cfg = dataclasses.replace(FluxConfig.tiny(), dtype="bfloat16")
        params = init_flux_params(jax.random.PRNGKey(2), cfg)
        qp = quantize_flux_params(params, weight_only_rest=True)
        # W8A8 set unchanged
        assert "kernel_int8" in qp["dual_blocks"]["attn"]["to_v"]
        # q/k and AdaLN now weight-only int8 (storage-compressed)
        assert "kernel_int8_wo" in qp["dual_blocks"]["attn"]["to_q"]
        assert "kernel_int8_wo" in qp["dual_blocks"]["norm1"]["lin"]
        assert "kernel_int8_wo" in qp["single_blocks"]["norm"]["lin"]
        # embedders outside the blocks stay float
        assert "kernel" in qp["x_embedder"]
        # every 2D+ float kernel left inside the blocks would be a miss
        n_q, n_f = count_quantized(qp)
        assert n_q > 3 * n_f

        rng = np.random.default_rng(3)
        B, S_img, S_txt = 1, 64, 16
        args = (
            jnp.asarray(rng.normal(size=(B, S_img, cfg.in_channels)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(B, S_txt, cfg.joint_attention_dim)).astype(np.float32)),
            jnp.full((B,), 0.5),
            jnp.zeros((B, cfg.pooled_projection_dim)),
            latent_image_ids(8, 8),
            jnp.zeros((S_txt, 3)),
            jnp.full((B,), 3.5),
        )
        out_bf = flux_forward(params, cfg, *args)
        out_q = flux_forward(qp, cfg, *args)
        rel = float(jnp.linalg.norm((out_q - out_bf).astype(jnp.float32))
                    / jnp.linalg.norm(out_bf.astype(jnp.float32)))
        assert rel < 0.06, rel

    def test_weight_only_tp_sharding_rules(self):
        from unitex_tpu.models.flux.quantize import quantize_flux_params
        from unitex_tpu.parallel.mesh import make_mesh
        from unitex_tpu.parallel.sharding import flux_param_shardings

        cfg = dataclasses.replace(FluxConfig.tiny(), dtype="bfloat16")
        params = init_flux_params(jax.random.PRNGKey(4), cfg)
        qp = quantize_flux_params(params, weight_only_rest=True)
        mesh = make_mesh(data=2, model=4)
        shardings = flux_param_shardings(qp, mesh)
        flat_p = jax.tree_util.tree_leaves_with_path(qp)
        flat_s = jax.tree_util.tree_leaves(shardings)
        assert len(flat_p) == len(flat_s)  # every leaf gets a sharding


class TestAttachLora:
    """Runtime-applied LoRA (lora.attach_lora): exact parity with kernel
    merging, and composition with int8 base kernels."""

    def _setup(self):
        from unitex_tpu.models.flux.lora import init_lora_params

        cfg = dataclasses.replace(FluxConfig.tiny(), dtype="bfloat16")
        params = init_flux_params(jax.random.PRNGKey(5), cfg)
        lora = init_lora_params(jax.random.key(6), params, rank=4)
        # give b nonzero values so the delta actually does something
        lora = jax.tree.map(
            lambda x: x + 0.01 * jnp.ones_like(x)
            if x.ndim == 3 and x.shape[-2] == 4 else x,
            lora,
        )
        rng = np.random.default_rng(7)
        B, S_img, S_txt = 1, 64, 16
        args = (
            jnp.asarray(rng.normal(size=(B, S_img, cfg.in_channels)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(B, S_txt, cfg.joint_attention_dim)).astype(np.float32)),
            jnp.full((B,), 0.5),
            jnp.zeros((B, cfg.pooled_projection_dim)),
            latent_image_ids(8, 8),
            jnp.zeros((S_txt, 3)),
            jnp.full((B,), 3.5),
        )
        return cfg, params, lora, args

    def test_attach_matches_merge(self):
        from unitex_tpu.models.flux.lora import attach_lora, merge_lora

        cfg, params, lora, args = self._setup()
        out_m = flux_forward(merge_lora(params, [(lora, 1.0)]), cfg, *args)
        out_a = flux_forward(attach_lora(params, [(lora, 1.0)]), cfg, *args)
        rel = float(jnp.linalg.norm((out_a - out_m).astype(jnp.float32))
                    / (jnp.linalg.norm(out_m.astype(jnp.float32)) + 1e-8))
        assert rel < 2e-2, rel  # bf16 rounding only

    def test_attach_changes_output(self):
        from unitex_tpu.models.flux.lora import attach_lora

        cfg, params, lora, args = self._setup()
        base = flux_forward(params, cfg, *args)
        out = flux_forward(attach_lora(params, [(lora, 1.0)]), cfg, *args)
        assert float(jnp.abs(out - base).max()) > 1e-4

    def test_attach_on_quantized_base(self):
        from unitex_tpu.models.flux.lora import attach_lora, merge_lora
        from unitex_tpu.models.flux.quantize import quantize_flux_params

        cfg, params, lora, args = self._setup()
        qp = quantize_flux_params(params, weight_only_rest=True)
        out_q = flux_forward(attach_lora(qp, [(lora, 1.0)]), cfg, *args)
        out_ref = flux_forward(merge_lora(params, [(lora, 1.0)]), cfg, *args)
        rel = float(jnp.linalg.norm((out_q - out_ref).astype(jnp.float32))
                    / (jnp.linalg.norm(out_ref.astype(jnp.float32)) + 1e-8))
        assert rel < 0.06, rel

    def test_two_adapters_concat_rank(self):
        from unitex_tpu.models.flux.lora import attach_lora, merge_lora
        from unitex_tpu.models.flux.lora import init_lora_params

        cfg, params, lora, args = self._setup()
        lora2 = init_lora_params(jax.random.key(8), params, rank=2)
        lora2 = jax.tree.map(
            lambda x: x - 0.02 * jnp.ones_like(x)
            if x.ndim == 3 and x.shape[-2] == 2 else x,
            lora2,
        )
        pairs = [(lora, 1.0), (lora2, 0.5)]
        out_m = flux_forward(merge_lora(params, pairs), cfg, *args)
        out_a = flux_forward(attach_lora(params, pairs), cfg, *args)
        rel = float(jnp.linalg.norm((out_a - out_m).astype(jnp.float32))
                    / (jnp.linalg.norm(out_m.astype(jnp.float32)) + 1e-8))
        assert rel < 2e-2, rel

    def test_reattach_composes(self):
        """attach_lora on an already-attached tree concatenates the deltas
        (repeated-merge semantics) instead of silently replacing them."""
        from unitex_tpu.models.flux.lora import attach_lora, merge_lora
        from unitex_tpu.models.flux.lora import init_lora_params

        cfg, params, lora, args = self._setup()
        lora2 = init_lora_params(jax.random.key(9), params, rank=2)
        lora2 = jax.tree.map(
            lambda x: x + 0.015 * jnp.ones_like(x)
            if x.ndim == 3 and x.shape[-2] == 2 else x,
            lora2,
        )
        chained = attach_lora(attach_lora(params, [(lora, 1.0)]), [(lora2, 1.0)])
        merged = merge_lora(params, [(lora, 1.0), (lora2, 1.0)])
        out_c = flux_forward(chained, cfg, *args)
        out_m = flux_forward(merged, cfg, *args)
        rel = float(jnp.linalg.norm((out_c - out_m).astype(jnp.float32))
                    / (jnp.linalg.norm(out_m.astype(jnp.float32)) + 1e-8))
        assert rel < 2e-2, rel


class TestInt4StagingPack:
    """pack_int4_tree / unpack_int4_tree: the transfer-packing format that
    halves the SD3 staging bytes (sr_pipeline.staged, stage_pack_int4)."""

    def test_kernel_roundtrip_error_bounded(self):
        from unitex_tpu.ops.quant import (
            pack_int4_kernel,
            quantize_kernel,
            unpack_int4_kernel,
        )

        rng = np.random.default_rng(0)
        w = rng.normal(size=(128, 96)).astype(np.float32) * 0.02
        packed, s4 = pack_int4_kernel(w, group=32)
        assert packed.dtype == np.uint8 and packed.shape == (64, 96)
        q8, s8 = unpack_int4_kernel(jnp.asarray(packed), jnp.asarray(s4),
                                    group=32)
        deq = np.asarray(q8, np.float32) * np.asarray(s8, np.float32)[None]
        # int4 grid: error bounded by half a step of the per-group scale
        step = np.repeat(np.asarray(s4, np.float32), 32, axis=0)
        assert np.all(np.abs(deq - w) <= 0.55 * step + 1e-7)
        # and strictly coarser than int8, but the same order of magnitude
        qi8, si8 = quantize_kernel(jnp.asarray(w))
        d8 = np.asarray(qi8, np.float32) * np.asarray(si8, np.float32)[None]
        assert np.abs(deq - w).mean() < 20 * np.abs(d8 - w).mean()

    def test_tree_roundtrip_forward_close(self):
        """int8 serving tree -> pack -> unpack must still run the shared
        linear dispatch with a small forward deviation."""
        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params, sd3_forward
        from unitex_tpu.ops.quant import pack_int4_tree, unpack_int4_tree

        cfg = SD3Config.tiny()
        params = quantize_linears(init_sd3_params(jax.random.PRNGKey(0), cfg))
        packed = pack_int4_tree(params, group=16)
        assert "kernel_int4" in packed["blocks"]["attn"]["to_v"]
        assert "kernel" in packed["blocks"]["attn"]["to_q"]  # bf16 untouched
        unpacked = jax.jit(
            lambda t: unpack_int4_tree(t, group=16))(packed)
        assert "kernel_int8" in unpacked["blocks"]["attn"]["to_v"]

        rng = np.random.default_rng(0)
        lat = jnp.asarray(
            rng.normal(size=(1, 8, 8, cfg.in_channels)).astype(np.float32))
        ctx = jnp.asarray(
            rng.normal(size=(1, 6, cfg.joint_attention_dim)).astype(np.float32))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        t = jnp.asarray([1000.0])
        out8 = sd3_forward(params, cfg, lat, ctx, t, pooled)
        out4 = sd3_forward(unpacked, cfg, lat, ctx, t, pooled)
        rel = float(jnp.linalg.norm(out4 - out8) / jnp.linalg.norm(out8))
        assert rel < 0.06, rel

    def test_staged_pipeline_with_pack(self):
        """TSDSRConfig(host_params=True, stage_pack_int4=True): the staging
        window packs, transfers, unpacks, serves, and restores host refs."""
        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params
        from unitex_tpu.models.sd3.sr_pipeline import TSDSRConfig, TSDSRPipeline

        sd3_cfg = SD3Config.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = quantize_linears(
            init_sd3_params(jax.random.PRNGKey(0), sd3_cfg))
        vparams = init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        mk = lambda pack, bf16=True: TSDSRPipeline(
            None,
            cfg=TSDSRConfig(
                upscale=2, latent_tile=8, latent_overlap=2,
                vae_encoder_tile=64, vae_decoder_tile=64,
                host_params=True, stage_pack_int4=pack,
                stage_pack_bf16=bf16,
            ),
            sd3_cfg=sd3_cfg, transformer_params=tparams, vae_params=vparams,
        )
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        pipe = mk(True)
        pipe.vae_cfg = vae_cfg
        out4 = np.asarray(pipe(img))
        assert out4.shape == (32, 32, 3) and np.isfinite(out4).all()
        # host tree restored after the window
        assert pipe.transformer_params is tparams
        ref = mk(False)
        ref.vae_cfg = vae_cfg
        out8 = np.asarray(ref(img))
        # int4 transfer grid: close to the int8-staged output (tiny
        # random-init dims exaggerate the relative error; the production
        # figure is INT4_STAGING_r05.json's 512^2->2048^2 delta)
        assert np.abs(out4 - out8).max() < 0.2, np.abs(out4 - out8).max()
        # the gentler W8A8-only grid (stage_pack_bf16=False) tracks closer
        g = mk(True, bf16=False)
        g.vae_cfg = vae_cfg
        outg = np.asarray(g(img))
        assert g.transformer_params is tparams
        assert np.abs(outg - out8).max() <= np.abs(out4 - out8).max() + 1e-6
