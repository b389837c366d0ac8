"""FLUX img2img / inpaint modes + FastTexture helpers
(/root/reference/TextureTools/texturetools/texture/reprojection/fast_texture.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.models.flux.config import FluxConfig
from unitex_tpu.models.flux.model import init_flux_params
from unitex_tpu.models.flux.pipeline import run_flux_inpaint
from unitex_tpu.models.flux.vae import (
    VAEConfig,
    init_vae_params,
    vae_decode,
    vae_encode,
)
from unitex_tpu.texture.fast_texture import inpaint_texture, upscale_texture


def _setup():
    flux_cfg = FluxConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    tparams = init_flux_params(jax.random.key(0), flux_cfg)
    vparams = init_vae_params(jax.random.key(1), vae_cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    return flux_cfg, vae_cfg, tparams, vparams, img


def _roundtrip(vparams, vae_cfg, img):
    lat = vae_encode(vparams, vae_cfg, img[None] * 2.0 - 1.0)
    out = vae_decode(vparams, vae_cfg, lat)[0]
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)


class TestFluxInpaint:
    def test_keep_everything_is_vae_roundtrip(self):
        """mask all-zero (keep all): every step re-pins the whole latent, so
        the output equals decode(encode(img)) regardless of the model."""
        flux_cfg, vae_cfg, tparams, vparams, img = _setup()
        out = run_flux_inpaint(
            tparams, flux_cfg, vparams, vae_cfg, jax.random.key(2),
            img, mask=jnp.zeros((16, 16)), strength=1.0,
            num_inference_steps=3, max_sequence_length=8,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_roundtrip(vparams, vae_cfg, img)),
            atol=1e-5,
        )

    def test_strength_zero_is_vae_roundtrip(self):
        """img2img at strength 0 runs no steps — pure VAE roundtrip."""
        flux_cfg, vae_cfg, tparams, vparams, img = _setup()
        out = run_flux_inpaint(
            tparams, flux_cfg, vparams, vae_cfg, jax.random.key(2),
            img, mask=None, strength=0.0,
            num_inference_steps=3, max_sequence_length=8,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_roundtrip(vparams, vae_cfg, img)),
            atol=1e-5,
        )

    def test_img2img_changes_with_strength(self):
        flux_cfg, vae_cfg, tparams, vparams, img = _setup()
        base = _roundtrip(vparams, vae_cfg, img)
        outs = []
        for strength in (0.34, 1.0):
            out = run_flux_inpaint(
                tparams, flux_cfg, vparams, vae_cfg, jax.random.key(2),
                img, mask=None, strength=strength,
                num_inference_steps=3, max_sequence_length=8,
            )
            assert np.isfinite(np.asarray(out)).all()
            outs.append(np.abs(np.asarray(out) - np.asarray(base)).mean())
        # more strength -> further from the input
        assert outs[1] > outs[0] > 0

    def test_partial_mask_pins_kept_tokens_exactly(self):
        """Token-level pinning invariant: after the full denoise, tokens
        where mask == 0 equal the clean input tokens bit-exactly (the final
        re-pin uses sigma = 0); masked tokens move.  (Pixel-space locality
        does not hold — the VAE decoder's mid attention is global.)"""
        from unitex_tpu.models.flux.pipeline import (
            denoise,
            latent_image_ids,
            pack_latents,
        )
        from unitex_tpu.models.flux.scheduler import FlowMatchEulerScheduler

        flux_cfg, _, tparams, _, _ = _setup()
        rng = np.random.default_rng(1)
        C = flux_cfg.in_channels
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, C // 4)).astype(np.float32))
        x0_tokens = pack_latents(x0)          # [1, 4, C]
        noise = jnp.asarray(rng.normal(size=x0_tokens.shape).astype(np.float32))
        token_mask = jnp.asarray([[True], [False], [True], [False]])
        sched = FlowMatchEulerScheduler.create(3, 4)
        out = denoise(
            tparams, flux_cfg, noise,
            latent_image_ids(2, 2), jnp.zeros((4, 3)),
            jnp.zeros((1, 4, flux_cfg.joint_attention_dim)),
            jnp.zeros((1, flux_cfg.pooled_projection_dim)),
            sched, 3.5,
            known_tokens=x0_tokens, inpaint_mask=token_mask, fixed_noise=noise,
        )
        out = np.asarray(out)[0]
        want = np.asarray(x0_tokens)[0]
        np.testing.assert_array_equal(out[1], want[1])
        np.testing.assert_array_equal(out[3], want[3])
        assert np.abs(out[0] - want[0]).max() > 1e-4
        assert np.abs(out[2] - want[2]).max() > 1e-4


class TestFastTexture:
    def test_inpaint_texture_pins_valid_pixels_exactly(self):
        flux_cfg, vae_cfg, tparams, vparams, img = _setup()
        invalid = np.zeros((16, 16), np.float32)
        invalid[4:8, 4:12] = 1.0
        out = inpaint_texture(
            tparams, flux_cfg, vparams, vae_cfg, jax.random.key(3),
            img, jnp.asarray(invalid), num_inference_steps=3,
        )
        keep = invalid < 0.5
        np.testing.assert_array_equal(
            np.asarray(out)[keep], np.asarray(img)[keep]
        )
        assert np.abs(np.asarray(out)[~keep] - np.asarray(img)[~keep]).mean() > 1e-4

    def test_upscale_shape_and_range(self):
        flux_cfg, vae_cfg, tparams, vparams, img = _setup()
        out = upscale_texture(
            tparams, flux_cfg, vparams, vae_cfg, jax.random.key(4),
            img, scale=2, strength=0.34, num_inference_steps=3,
        )
        assert out.shape == (32, 32, 3)
        arr = np.asarray(out)
        assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1
