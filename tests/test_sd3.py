import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
from unitex_tpu.models.sd3.color_fix import (
    adain_color_fix,
    wavelet_color_fix,
    wavelet_decomposition,
)
from unitex_tpu.models.sd3.config import SD3Config
from unitex_tpu.models.sd3.model import (
    init_sd3_params,
    patchify,
    sd3_forward,
    unpatchify,
)
from unitex_tpu.models.sd3.sr_pipeline import (
    TSDSRConfig,
    TSDSRPipeline,
    _tile_offsets,
    gaussian_tile_weights,
    tiled_apply,
)


class TestSD3Model:
    def test_patchify_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 4)).astype(np.float32))
        tokens = patchify(x, 2)
        assert tokens.shape == (2, 4 * 6, 16)
        back = unpatchify(tokens, 8, 12, 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_forward_shapes(self):
        cfg = SD3Config.tiny()
        params = init_sd3_params(jax.random.key(0), cfg)
        lat = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 8, 8, cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.zeros((2, 6, cfg.joint_attention_dim))
        pooled = jnp.zeros((2, cfg.pooled_projection_dim))
        t = jnp.full((2,), 1000.0)
        out = sd3_forward(params, cfg, lat, ctx, t, pooled)
        assert out.shape == lat.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_sensitivity(self):
        cfg = SD3Config.tiny()
        params = init_sd3_params(jax.random.key(0), cfg)
        lat = jnp.ones((1, 8, 8, cfg.in_channels))
        ctx = jnp.zeros((1, 4, cfg.joint_attention_dim))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        a = sd3_forward(params, cfg, lat, ctx, jnp.asarray([0.0]), pooled)
        b = sd3_forward(params, cfg, lat, ctx, jnp.asarray([1000.0]), pooled)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


class TestTiling:
    def test_tile_offsets_cover(self):
        offs = _tile_offsets(100, 32, 8)
        assert offs[0] == 0 and offs[-1] == 68
        covered = np.zeros(100, bool)
        for o in offs:
            covered[o : o + 32] = True
        assert covered.all()

    def test_tiled_identity(self):
        """Tiling an identity function must reconstruct the input."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 96, 96, 3)).astype(np.float32))
        out = tiled_apply(lambda t: t, x, tile=32, overlap=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)

    def test_gaussian_weights_positive(self):
        w = gaussian_tile_weights(64)
        assert w.shape == (64, 64)
        assert float(w.min()) > 0
        assert float(w[32, 32]) > float(w[0, 0])


class TestColorFix:
    def test_wavelet_decomposition_sums(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        high, low = wavelet_decomposition(img, 3)
        np.testing.assert_allclose(np.asarray(high + low), np.asarray(img), atol=1e-5)

    def test_wavelet_fix_takes_source_low_freq(self):
        rng = np.random.default_rng(1)
        target = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        source = target + 0.3  # constant (low-freq) shift
        fixed = wavelet_color_fix(target, source)
        assert abs(float(fixed.mean()) - float(source.mean())) < 0.02

    def test_adain_matches_stats(self):
        rng = np.random.default_rng(2)
        t = jnp.asarray(rng.normal(2.0, 0.5, (32, 32, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(-1.0, 2.0, (32, 32, 3)).astype(np.float32))
        out = adain_color_fix(t, s)
        np.testing.assert_allclose(
            np.asarray(out.mean(axis=(0, 1))), np.asarray(s.mean(axis=(0, 1))), atol=1e-2
        )


class TestSRPipeline:
    def test_bicubic_fallback(self):
        pipe = TSDSRPipeline(None)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
        )
        out = pipe(img)
        assert out.shape == (128, 128, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 1

    def test_full_sr_tiny(self):
        """One-step SR with tiny SD3 + tiny VAE end-to-end."""
        sd3_cfg = SD3Config.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_sd3_params(jax.random.key(0), sd3_cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        cfg = TSDSRConfig(
            upscale=2, latent_tile=8, latent_overlap=2,
            vae_encoder_tile=64, vae_decoder_tile=64, align_method="adain",
        )
        pipe = TSDSRPipeline(
            None, cfg=cfg, sd3_cfg=sd3_cfg,
            transformer_params=tparams, vae_params=vparams,
        )
        # patch the VAE config to the tiny one (downscale 2 not 8)
        pipe.vae_cfg = vae_cfg

        # adjust for tiny VAE's downscale of 2: override tiled decode paths
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        )
        out = pipe(img)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestAutoDecodeBatch:
    """vae_decode_batch=0: per-process static pick from free HBM (the
    memory-adaptive VAEHook analog, reference TSD_SR/utils/vaehook.py:
    82-127)."""

    def _pipe(self):
        return TSDSRPipeline(None, cfg=TSDSRConfig(vae_decode_batch=0))

    def test_fallback_without_memory_stats(self, monkeypatch):
        import jax

        pipe = self._pipe()

        class Dev:
            def memory_stats(self):
                return None  # CPU / no stats API

        monkeypatch.setattr(jax, "devices", lambda *a: [Dev()])
        assert pipe._auto_decode_batch() == 2  # measured-safe default

    def test_picks_largest_fitting(self, monkeypatch):
        import jax

        def with_free(free):
            class Dev:
                def memory_stats(self):
                    return {"bytes_limit": int(free + 1e9),
                            "bytes_in_use": int(1e9)}
            return [Dev()]

        # ~14 GB free (empty chip): batch 8 (8 * 1.6 GB <= 0.8 * 14 GB)
        pipe = self._pipe()
        monkeypatch.setattr(jax, "devices", lambda *a: with_free(16.1e9))
        assert pipe._auto_decode_batch() == 8
        # ~2.5 GB free (12 GB FLUX co-resident): batch 1
        pipe = self._pipe()
        monkeypatch.setattr(jax, "devices", lambda *a: with_free(2.5e9))
        assert pipe._auto_decode_batch() == 1
        # ~7 GB free: batch 2 fits (2 * 1.6 <= 0.8 * 7), 4 doesn't
        pipe = self._pipe()
        monkeypatch.setattr(jax, "devices", lambda *a: with_free(7e9))
        assert pipe._auto_decode_batch() == 2
        # cached after first resolve (static shapes per process)
        monkeypatch.setattr(jax, "devices", lambda *a: with_free(16.1e9))
        assert pipe._auto_decode_batch() == 2


class TestHostParamsStaging:
    def test_host_params_round_trip(self):
        """host_params=True: weights are device_put per call and the HOST
        refs restored after (the max-memory co-residency answer) — output
        must equal the resident-params run."""
        import dataclasses

        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
        from unitex_tpu.models.sd3.model import init_sd3_params

        s_cfg = SD3Config.tiny()
        v_cfg = VAEConfig.tiny()
        sp = init_sd3_params(jax.random.key(0), s_cfg)
        vp = init_vae_params(jax.random.key(1), v_cfg)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (16, 16, 3)), jnp.float32)
        cfg = TSDSRConfig(upscale=2, latent_tile=8, latent_overlap=2,
                          vae_encoder_tile=64, vae_decoder_tile=64,
                          align_method="adain")
        a = TSDSRPipeline(None, cfg=cfg, sd3_cfg=s_cfg,
                          transformer_params=sp, vae_params=vp)
        a.vae_cfg = v_cfg
        b = TSDSRPipeline(
            None, cfg=dataclasses.replace(cfg, host_params=True),
            sd3_cfg=s_cfg, transformer_params=sp, vae_params=vp)
        b.vae_cfg = v_cfg
        oa = a(img)
        ob = b(img)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-5)
        # host refs restored (not replaced by device copies of a call)
        assert b.transformer_params is sp and b.vae_params is vp


class TestSD3Sharding:
    def test_tp_matches_single_device(self):
        """TP-sharded SD3 forward must equal the unsharded result
        (sd3_param_shardings, the TSD-SR multi-chip layout)."""
        from unitex_tpu.parallel.mesh import make_mesh
        from unitex_tpu.parallel.sharding import (
            data_sharding,
            sd3_param_shardings,
            shard_params,
        )

        cfg = SD3Config.tiny()
        params = init_sd3_params(jax.random.key(0), cfg)
        B = 2
        lat = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, 8, 8, cfg.in_channels)),
            jnp.float32,
        )
        prompt = jnp.zeros((B, 6, cfg.joint_attention_dim))
        t = jnp.full((B,), 1000.0)
        pooled = jnp.zeros((B, cfg.pooled_projection_dim))
        ref = sd3_forward(params, cfg, lat, prompt, t, pooled)

        mesh = make_mesh(data=2, model=4)
        sharded = shard_params(params, sd3_param_shardings(params, mesh))
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, x: sd3_forward(p, cfg, x, prompt, t, pooled)
            )(sharded, jax.device_put(lat, data_sharding(mesh, 4)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_pipeline_mesh_path(self):
        """TSDSRPipeline(mesh=...) output equals the single-device
        pipeline's (tiles data-parallel, transformer tensor-parallel)."""
        from unitex_tpu.parallel.mesh import make_mesh

        sd3_cfg = SD3Config.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_sd3_params(jax.random.key(0), sd3_cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        cfg = TSDSRConfig(
            upscale=2, latent_tile=8, latent_overlap=2,
            vae_encoder_tile=64, vae_decoder_tile=64, align_method="adain",
            tile_batch=4,
        )
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        )
        pipe = TSDSRPipeline(
            None, cfg=cfg, sd3_cfg=sd3_cfg,
            transformer_params=tparams, vae_params=vparams,
        )
        pipe.vae_cfg = vae_cfg
        ref = pipe(img)

        mpipe = TSDSRPipeline(
            None, cfg=cfg, sd3_cfg=sd3_cfg,
            transformer_params=tparams, vae_params=vparams,
            mesh=make_mesh(data=2, model=4),
        )
        mpipe.vae_cfg = vae_cfg
        out = mpipe(img)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4)


class TestSD3SP:
    """Ring sequence parallelism at the model level (VERDICT #5): the
    sequence-sharded SD3 forward (sd3_forward_sp) matches replicated."""

    def test_forward_sp_matches_replicated(self):
        from unitex_tpu.models.sd3.model import sd3_forward_sp
        from unitex_tpu.parallel.mesh import make_mesh

        cfg = SD3Config.tiny()
        params = init_sd3_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(3)
        lat = jnp.asarray(
            rng.normal(size=(2, 8, 8, cfg.in_channels)), jnp.float32)
        ctx = jnp.asarray(
            rng.normal(size=(2, 8, cfg.joint_attention_dim)), jnp.float32)
        pooled = jnp.asarray(
            rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32)
        t = jnp.full((2,), 400.0)
        ref = sd3_forward(params, cfg, lat, ctx, t, pooled)
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
        with jax.set_mesh(mesh):
            out = sd3_forward_sp(
                params, cfg, lat, ctx, t, pooled, seq_axis="model")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5)
