"""JAX-native SigLIP vision tower vs HF transformers (the text_jax.py
parity pattern): tiny random SiglipVisionModel converted and compared."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.siglip import (
    SiglipVisionConfig,
    convert_siglip_vision,
    init_siglip_params,
    preprocess_siglip,
    siglip_config_from_sd,
    siglip_forward,
)


@pytest.fixture(scope="module")
def tiny_hf():
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(hf_cfg).eval()
    return model, hf_cfg


class TestSiglipParity:
    def test_last_hidden_state_matches_hf(self, tiny_hf):
        import torch

        model, hf_cfg = tiny_hf
        cfg = SiglipVisionConfig.tiny()
        params = convert_siglip_vision(model.state_dict(), cfg)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        ours = siglip_forward(params, cfg, jnp.asarray(x))
        assert ours.shape == ref.shape == (2, 4, 32)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_config_inferred_from_sd(self, tiny_hf):
        model, hf_cfg = tiny_hf
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        cfg = siglip_config_from_sd(sd)
        assert cfg.hidden_size == 32
        assert cfg.num_layers == 2
        assert cfg.mlp_dim == 64
        assert cfg.patch_size == 14
        assert cfg.image_size == 28
        assert cfg.num_patches == 4

    def test_preprocess_matches_hf_processor(self):
        transformers = pytest.importorskip("transformers")
        from PIL import Image

        cfg = SiglipVisionConfig.tiny()
        proc = transformers.SiglipImageProcessor(
            size={"height": 28, "width": 28}
        )
        rng = np.random.default_rng(1)
        img = Image.fromarray(
            (rng.random((40, 52, 3)) * 255).astype(np.uint8)
        )
        ref = proc(images=img, return_tensors="np")["pixel_values"]
        ours = preprocess_siglip(img, cfg)
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=2e-2)

    def test_init_shapes_so400m_tokens(self):
        cfg = SiglipVisionConfig.so400m_384()
        assert cfg.num_patches == 729  # the 27x27 Redux token grid
        tiny = SiglipVisionConfig.tiny()
        p = init_siglip_params(jax.random.key(0), tiny)
        out = siglip_forward(
            p, tiny, jnp.zeros((1, 28, 28, 3), jnp.float32))
        assert out.shape == (1, 4, 32)
        assert bool(jnp.isfinite(out).all())


class TestReduxJaxPath:
    def test_conditioner_uses_jax_tower(self, tiny_hf, tmp_path):
        """ReduxConditioner prefers the JAX tower when a safetensors
        SigLIP dir exists, and its features match the HF host path."""
        import torch
        from safetensors.numpy import save_file

        model, hf_cfg = tiny_hf
        root = tmp_path / "pretrain"
        sdir = root / "siglip"
        sdir.mkdir(parents=True)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        save_file(sd, str(sdir / "model.safetensors"))
        (sdir / "config.json").write_text(hf_cfg.to_json_string())

        from unitex_tpu.models.flux.redux import ReduxConditioner

        cond = ReduxConditioner(str(root))
        assert cond.siglip_jax is not None

        rng = np.random.default_rng(2)
        from PIL import Image

        img = Image.fromarray(
            (rng.random((28, 28, 3)) * 255).astype(np.uint8))
        feats = cond.features_from_image(img)
        x = np.asarray(preprocess_siglip(img, cond.siglip_jax[1]))
        with torch.no_grad():
            ref = model(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(feats), ref, atol=2e-5)
