"""Quantized-serving-params disk cache (utils/param_cache.py).

The TPU analog of the reference's prequantized-NF4 checkpoint branch
(reference pipeline.py:74-96): quantize once, serve from a cached tree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.utils.param_cache import load_params, save_params


class TestParamCacheRoundTrip:
    def test_nested_tree_all_dtypes(self, tmp_path):
        tree = {
            "blocks": {
                "kernel_int8": np.arange(-8, 8, dtype=np.int8).reshape(4, 4),
                "kernel_scale": np.linspace(0.1, 1, 4, dtype=np.float32),
                "bias": jnp.arange(3, dtype=jnp.bfloat16) * 0.5,
            },
            "stack": [np.ones((2, 2), np.float32), np.zeros((1,), np.int32)],
            "empty": {},  # dropped: no leaves
        }
        path = str(tmp_path / "t.npz")
        save_params(path, tree)
        out = load_params(path)
        assert set(out) == {"blocks", "stack"}
        np.testing.assert_array_equal(
            out["blocks"]["kernel_int8"], np.asarray(tree["blocks"]["kernel_int8"])
        )
        np.testing.assert_array_equal(
            out["blocks"]["kernel_scale"], tree["blocks"]["kernel_scale"]
        )
        assert str(out["blocks"]["bias"].dtype) == "bfloat16"
        np.testing.assert_array_equal(
            out["blocks"]["bias"].view(np.uint16),
            np.asarray(tree["blocks"]["bias"]).view(np.uint16),
        )
        assert isinstance(out["stack"], list) and len(out["stack"]) == 2
        np.testing.assert_array_equal(out["stack"][1], tree["stack"][1])

    def test_atomic_overwrite_and_slash_guard(self, tmp_path):
        path = str(tmp_path / "t.npz")
        save_params(path, {"a": np.zeros(2)})
        save_params(path, {"a": np.ones(2)})  # overwrite via tmp+rename
        np.testing.assert_array_equal(load_params(path)["a"], np.ones(2))
        with pytest.raises(AssertionError):
            save_params(path, {"a/b": np.zeros(2)})

    def test_hash_key_guard(self, tmp_path):
        """Dict keys starting with '#' would round-trip as a LIST (the
        list-node encoding) — rejected at save time (ADVICE r03)."""
        path = str(tmp_path / "t.npz")
        with pytest.raises(AssertionError):
            save_params(path, {"#0": np.zeros(2), "#1": np.ones(2)})

    def test_meta_round_trip(self, tmp_path):
        from unitex_tpu.utils.param_cache import load_meta

        path = str(tmp_path / "t.npz")
        save_params(path, {"a": np.zeros(2)})
        assert load_meta(path) is None  # legacy: no fingerprint
        meta = {"version": 1, "source": "random_s0"}
        save_params(path, {"a": np.zeros(2)}, meta=meta)
        assert load_meta(path) == meta


class TestPipelineParamsCache:
    def test_second_build_hits_cache(self, tmp_path, monkeypatch):
        """Second pipeline build with the same params_cache dir must load
        the quantized tree from disk (init/quantize never called) and get
        a leaf-identical tree."""
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, DiffusionConfig, MeshConfig,
            PipelineConfig,
        )
        from unitex_tpu.models.flux import model as flux_model
        from unitex_tpu.models.flux.config import FluxConfig
        from unitex_tpu.models.flux.vae import VAEConfig
        from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

        monkeypatch.setattr(
            FluxConfig, "flux1_dev", staticmethod(FluxConfig.tiny)
        )
        monkeypatch.setattr(VAEConfig, "flux", staticmethod(VAEConfig.tiny))
        monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
        cfg = PipelineConfig(
            camera=CameraConfig(view_size=32),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
            bake=BakeConfig(uv_size=128),
            diffusion=DiffusionConfig(
                height=32, width=192, dual_size=32, num_inference_steps=2,
                max_sequence_length=8,
            ),
        )
        cache = str(tmp_path / "cache")
        kw = dict(
            pretrain_models=None, config=cfg, random_weights=True,
            int8_serving="max_memory", params_cache=cache,
        )
        p1 = CustomRGBTextureFullPipeline(**kw)
        assert os.path.exists(os.path.join(cache, "flux_random_s0_int8wo.npz"))

        def boom(*a, **k):
            raise AssertionError("init must not run on a cache hit")

        monkeypatch.setattr(flux_model, "init_flux_params_numpy", boom)
        p2 = CustomRGBTextureFullPipeline(**kw)
        l1 = jax.tree.leaves(p1.transformer_params)
        l2 = jax.tree.leaves(p2.transformer_params)
        assert len(l1) == len(l2)
        for a, b in zip(l1, l2):
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8)
            )
        # LoRA init composed with the quantized (kernel_int8) tree
        assert p2.texture_lora is not None

    def test_stale_cache_detected_and_overwritten(self, tmp_path, monkeypatch):
        """A cache whose fingerprint (quantizer version) or leaf shapes no
        longer match the config is rejected AND the rebuilt tree overwrites
        it, so the cache refreshes after a code change (ADVICE r03
        medium)."""
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, DiffusionConfig, MeshConfig,
            PipelineConfig,
        )
        from unitex_tpu.models.flux.config import FluxConfig
        from unitex_tpu.models.flux.vae import VAEConfig
        from unitex_tpu.pipeline import (
            CustomRGBTextureFullPipeline, RGBTextureFullPipelineBase,
        )
        from unitex_tpu.utils.param_cache import load_meta, save_params

        monkeypatch.setattr(
            FluxConfig, "flux1_dev", staticmethod(FluxConfig.tiny)
        )
        monkeypatch.setattr(VAEConfig, "flux", staticmethod(VAEConfig.tiny))
        monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
        cfg = PipelineConfig(
            camera=CameraConfig(view_size=32),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
            bake=BakeConfig(uv_size=128),
            diffusion=DiffusionConfig(
                height=32, width=192, dual_size=32, num_inference_steps=2,
                max_sequence_length=8,
            ),
        )
        cache = str(tmp_path / "cache")
        path = os.path.join(cache, "flux_random_s0_int8wo.npz")
        # poison the cache: right filename, wrong tree shape, old version
        save_params(path, {"bogus": np.zeros((3, 3), np.float32)},
                    meta={"version": 0, "source": "flux_random_s0"})
        p = CustomRGBTextureFullPipeline(
            pretrain_models=None, config=cfg, random_weights=True,
            int8_serving="max_memory", params_cache=cache,
        )
        assert p.transformer_params is not None
        assert "bogus" not in p.transformer_params
        # the stale file was overwritten with a valid fingerprinted tree
        meta = load_meta(path)
        assert meta == {
            "version": RGBTextureFullPipelineBase._PARAMS_CACHE_VERSION,
            "source": "flux_random_s0",
        }

    def test_legacy_cache_without_meta_accepted(self, tmp_path, monkeypatch):
        """A pre-fingerprint cache (no __meta__, e.g. the round-3 12 GB
        E2E cache) must still be accepted when its leaf shapes/dtypes match
        the config-derived expectation."""
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, DiffusionConfig, MeshConfig,
            PipelineConfig,
        )
        from unitex_tpu.models.flux import model as flux_model
        from unitex_tpu.models.flux.config import FluxConfig
        from unitex_tpu.models.flux.vae import VAEConfig
        from unitex_tpu.pipeline import CustomRGBTextureFullPipeline
        from unitex_tpu.utils.param_cache import load_meta, load_params

        monkeypatch.setattr(
            FluxConfig, "flux1_dev", staticmethod(FluxConfig.tiny)
        )
        monkeypatch.setattr(VAEConfig, "flux", staticmethod(VAEConfig.tiny))
        monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
        cfg = PipelineConfig(
            camera=CameraConfig(view_size=32),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
            bake=BakeConfig(uv_size=128),
            diffusion=DiffusionConfig(
                height=32, width=192, dual_size=32, num_inference_steps=2,
                max_sequence_length=8,
            ),
        )
        cache = str(tmp_path / "cache")
        kw = dict(
            pretrain_models=None, config=cfg, random_weights=True,
            int8_serving="max_memory", params_cache=cache,
        )
        CustomRGBTextureFullPipeline(**kw)
        path = os.path.join(cache, "flux_random_s0_int8wo.npz")
        # strip the fingerprint, simulating a legacy cache file
        tree = load_params(path)
        os.unlink(path)
        from unitex_tpu.utils.param_cache import save_params

        save_params(path, tree)  # no meta
        assert load_meta(path) is None

        def boom(*a, **k):
            raise AssertionError("legacy cache must be accepted (cache hit)")

        monkeypatch.setattr(flux_model, "init_flux_params_numpy", boom)
        p2 = CustomRGBTextureFullPipeline(**kw)
        assert p2.transformer_params is not None


class TestPipelineParamsCacheInt4:
    def test_int4_cache_round_trip_and_denoise_parity(self, tmp_path,
                                                      monkeypatch):
        """params_cache_int4: the cache stores nibble-packed kernels (half
        the bytes), a fresh process unpacks to the serving int8 form on
        placement, LoRA sizing still works, and the denoise output stays
        close to the exact-int8 pipeline's."""
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, DiffusionConfig, MeshConfig,
            PipelineConfig,
        )
        from unitex_tpu.models.flux import model as flux_model
        from unitex_tpu.models.flux.config import FluxConfig
        from unitex_tpu.models.flux.vae import VAEConfig
        from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

        monkeypatch.setattr(
            FluxConfig, "flux1_dev", staticmethod(FluxConfig.tiny)
        )
        monkeypatch.setattr(VAEConfig, "flux", staticmethod(VAEConfig.tiny))
        monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
        cfg = PipelineConfig(
            camera=CameraConfig(view_size=32),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=128),
            bake=BakeConfig(uv_size=128),
            diffusion=DiffusionConfig(
                height=32, width=192, dual_size=32, num_inference_steps=2,
                max_sequence_length=8,
            ),
        )
        cache = str(tmp_path / "cache")
        kw = dict(
            pretrain_models=None, config=cfg, random_weights=True,
            int8_serving="max_memory", params_cache=cache,
        )
        ref = CustomRGBTextureFullPipeline(**kw)           # exact int8
        p1 = CustomRGBTextureFullPipeline(**kw, params_cache_int4=True)
        p4 = os.path.join(cache, "flux_random_s0_int8wo4.npz")
        p8 = os.path.join(cache, "flux_random_s0_int8wo.npz")
        assert os.path.exists(p4) and os.path.exists(p8)
        # the int4 cache must be materially smaller (tiny dims limit the
        # ratio; production kernels halve)
        assert os.path.getsize(p4) < 0.85 * os.path.getsize(p8)
        # builder process serves EXACT int8 (packing is cache-only)
        for a, b in zip(jax.tree.leaves(ref.transformer_params),
                        jax.tree.leaves(p1.transformer_params)):
            np.testing.assert_array_equal(np.asarray(a).view(np.uint8),
                                          np.asarray(b).view(np.uint8))

        def boom(*a, **k):
            raise AssertionError("init must not run on a cache hit")

        monkeypatch.setattr(flux_model, "init_flux_params_numpy", boom)
        p2 = CustomRGBTextureFullPipeline(**kw, params_cache_int4=True)
        assert p2.texture_lora is not None
        # unpacked serving tree: same leaf structure as the exact one
        import jax.tree_util as jtu

        s1 = [k for k, _ in jtu.tree_flatten_with_path(ref.transformer_params)[0]]
        s2 = [k for k, _ in jtu.tree_flatten_with_path(p2.transformer_params)[0]]
        assert s1 == s2
        # forward parity: the int4 re-grid must track the exact pipeline
        rng = np.random.default_rng(0)
        cfgf = ref.flux_cfg
        hidden = jnp.asarray(
            rng.normal(size=(1, 8, cfgf.in_channels)).astype(np.float32))
        ctx = jnp.asarray(
            rng.normal(size=(1, 4, cfgf.joint_attention_dim)).astype(np.float32))
        ids = jnp.zeros((8, 3), jnp.int32)
        tids = jnp.zeros((4, 3), jnp.int32)

        def fwd(pipe):
            return np.asarray(flux_model.flux_forward(
                pipe.transformer_params, cfgf, hidden, ctx,
                jnp.asarray([0.5]),
                jnp.zeros((1, cfgf.pooled_projection_dim)),
                ids, tids, guidance=jnp.asarray([3.5]),
            ))

        o_ref = fwd(ref)
        o_int4 = fwd(p2)
        rel = float(np.linalg.norm(o_int4 - o_ref) /
                    max(np.linalg.norm(o_ref), 1e-9))
        assert rel < 0.2, rel
