"""JAX-native CLIP-L / T5 text encoders vs HF transformers (the training
conditioning stack, /root/reference/flux_piplines/texturing/trainer.py:
165-181) — parity against tiny random torch models, HF-state-dict
converters, config inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.text_jax import (
    CLIPTextConfig,
    T5EncoderConfig,
    clip_config_from_sd,
    clip_text_forward,
    convert_clip_text,
    convert_t5_encoder,
    init_clip_text_params,
    init_t5_encoder_params,
    t5_config_from_sd,
    t5_encoder_forward,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _ids_with_eos(rng, B, S, vocab, eos):
    """Random token rows where ``eos`` (== vocab-1) appears exactly once, so
    HF's legacy argmax pooling and the eos-position pooling agree."""
    ids = rng.integers(1, vocab - 1, size=(B, S))
    pos = rng.integers(1, S, size=B)
    for b in range(B):
        ids[b, pos[b] :] = 0
        ids[b, pos[b]] = eos
    return ids.astype(np.int64)


class TestCLIPText:
    @pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
    def test_matches_transformers(self, act):
        vocab, eos = 99, 98
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=vocab,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            hidden_act=act,
            eos_token_id=eos,
            bos_token_id=0,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = transformers.CLIPTextModel(hf_cfg).eval()

        sd = _sd_numpy(hf)
        cfg = clip_config_from_sd(sd)
        assert (cfg.vocab_size, cfg.hidden_size, cfg.num_layers, cfg.mlp_dim) == (
            vocab,
            32,
            2,
            64,
        )
        cfg = dataclasses.replace(
            cfg, num_heads=4, max_positions=16, eos_token_id=eos, hidden_act=act
        )
        params = convert_clip_text(sd, cfg)

        rng = np.random.default_rng(1)
        ids = _ids_with_eos(rng, 3, 16, vocab, eos)
        with torch.no_grad():
            out = hf(input_ids=torch.as_tensor(ids))
        hidden, pooled = clip_text_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(hidden), out.last_hidden_state.numpy(), atol=3e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooler_output.numpy(), atol=3e-5, rtol=1e-4
        )

    def test_init_forward_shapes(self):
        cfg = dataclasses.replace(
            CLIPTextConfig(),
            vocab_size=50,
            hidden_size=16,
            mlp_dim=32,
            num_layers=2,
            num_heads=2,
            max_positions=8,
            eos_token_id=49,
        )
        params = init_clip_text_params(jax.random.key(0), cfg)
        ids = jnp.full((2, 8), 3, jnp.int32).at[:, 5].set(49)
        hidden, pooled = clip_text_forward(params, cfg, ids)
        assert hidden.shape == (2, 8, 16) and pooled.shape == (2, 16)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden)[:, 5])


class TestT5Encoder:
    def _hf(self, gated: bool):
        hf_cfg = transformers.T5Config(
            vocab_size=128,
            d_model=32,
            d_kv=6,  # inner = 24 != d_model: exercises the T5 quirk
            d_ff=48,
            num_layers=2,
            num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=20,
            feed_forward_proj="gated-gelu" if gated else "relu",
            dropout_rate=0.0,
            use_cache=False,
        )
        torch.manual_seed(0)
        return transformers.T5EncoderModel(hf_cfg).eval()

    @pytest.mark.parametrize("gated", [True, False])
    def test_matches_transformers(self, gated):
        hf = self._hf(gated)
        sd = _sd_numpy(hf)
        cfg = t5_config_from_sd(sd)
        assert cfg.gated_act is gated
        assert (cfg.d_model, cfg.d_kv, cfg.d_ff, cfg.num_layers, cfg.num_heads) == (
            32,
            6,
            48,
            2,
            4,
        )
        cfg = dataclasses.replace(
            cfg, relative_buckets=8, relative_max_distance=20
        )
        params = convert_t5_encoder(sd, cfg)

        rng = np.random.default_rng(2)
        ids = rng.integers(0, 128, size=(2, 12)).astype(np.int64)
        with torch.no_grad():
            out = hf(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
        ours = t5_encoder_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(ours), out, atol=3e-5, rtol=1e-4)

    def test_attention_mask(self):
        hf = self._hf(True)
        sd = _sd_numpy(hf)
        cfg = dataclasses.replace(
            t5_config_from_sd(sd), relative_buckets=8, relative_max_distance=20
        )
        params = convert_t5_encoder(sd, cfg)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 128, size=(2, 10)).astype(np.int64)
        mask = np.ones((2, 10), np.int64)
        mask[:, 7:] = 0
        with torch.no_grad():
            out = hf(
                input_ids=torch.as_tensor(ids),
                attention_mask=torch.as_tensor(mask),
            ).last_hidden_state.numpy()
        ours = t5_encoder_forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, bool)
        )
        # masked-out key columns must match where queries are valid
        np.testing.assert_allclose(
            np.asarray(ours)[:, :7], out[:, :7], atol=3e-5, rtol=1e-4
        )

    def test_init_forward_shapes(self):
        cfg = dataclasses.replace(
            T5EncoderConfig(),
            vocab_size=64,
            d_model=16,
            d_kv=4,
            d_ff=24,
            num_layers=2,
            num_heads=4,
            relative_buckets=8,
            relative_max_distance=20,
        )
        params = init_t5_encoder_params(jax.random.key(0), cfg)
        out = t5_encoder_forward(params, cfg, jnp.zeros((1, 6), jnp.int32))
        assert out.shape == (1, 6, 16)
        assert bool(jnp.isfinite(out).all())


class TestT5Sharding:
    def test_tp_matches_single_device(self):
        """TP-sharded T5 encode must equal the unsharded result
        (t5_param_shardings — the T5-XXL multi-chip layout)."""
        from unitex_tpu.parallel.mesh import make_mesh
        from unitex_tpu.parallel.sharding import (
            shard_params,
            t5_param_shardings,
        )

        cfg = dataclasses.replace(
            T5EncoderConfig(),
            vocab_size=64,
            d_model=32,
            d_kv=8,
            d_ff=64,
            num_layers=2,
            num_heads=4,
            relative_buckets=8,
            relative_max_distance=20,
        )
        params = init_t5_encoder_params(jax.random.key(0), cfg)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, 64, size=(2, 12)), jnp.int32
        )
        ref = t5_encoder_forward(params, cfg, ids)

        mesh = make_mesh(data=2, model=4)
        sharded = shard_params(params, t5_param_shardings(params, mesh))
        out = jax.jit(lambda p, i: t5_encoder_forward(p, cfg, i))(sharded, ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestBuildFallback:
    def test_none_root(self):
        from unitex_tpu.models.text_encoders import build_text_encoders

        assert build_text_encoders(None) is None

    def test_missing_weights_fall_back(self, tmp_path):
        from unitex_tpu.models.text_encoders import build_text_encoders

        assert build_text_encoders(str(tmp_path)) is None
