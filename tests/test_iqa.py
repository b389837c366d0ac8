"""Learned no-reference IQA metrics (MUSIQ / CLIP-IQA / MANIQA).

Dual-implementation parity (SURVEY.md §4 pattern) + full-path smoke with
random-init params; pretrained-weight conversion is structural-only here
(checkpoints are not bundled in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.utils import iqa_clipiqa, iqa_maniqa, iqa_musiq


class TestMUSIQ:
    def test_encoder_parity(self):
        p = iqa_musiq.init_musiq_params(
            jax.random.PRNGKey(0), hidden=48, layers=2, mlp=96
        )
        tok = np.random.default_rng(0).normal(size=(2, 11, 48)).astype(np.float32)
        got = np.asarray(iqa_musiq.encode_tokens(p, jnp.asarray(tok)))
        want = iqa_musiq.encode_tokens_reference(p, tok)
        assert np.abs(got - want).max() < 1e-4

    def test_multiscale_score(self):
        p = iqa_musiq.init_musiq_params(jax.random.PRNGKey(1), layers=2)
        img = np.random.default_rng(1).uniform(size=(96, 128, 3)).astype(np.float32)
        s = iqa_musiq.musiq(p, img)
        assert np.isfinite(s)

    def test_hse_resolution_agnostic(self):
        """Different resolutions index the same 10x10 hash grid — token dim
        and score stay well-defined at any size (the model's design point)."""
        p = iqa_musiq.init_musiq_params(jax.random.PRNGKey(2), layers=1)
        for hw in ((64, 64), (130, 70)):
            img = np.full((*hw, 3), 0.5, np.float32)
            assert np.isfinite(iqa_musiq.musiq(p, img))

    def test_tokens_contain_all_scales(self):
        p = iqa_musiq.init_musiq_params(jax.random.PRNGKey(3), layers=1)
        img = np.zeros((96, 96, 3), np.float32)
        tok = iqa_musiq.musiq_tokens(p, img)
        # CLS + native 3x3 + 384-resize 12x12 + 224-resize 7x7
        assert tok.shape == (1, 1 + 9 + 144 + 49, iqa_musiq.HIDDEN)


def _tiny_clip_params():
    """Hand-built miniature tower (1 block/stage, narrow) — the forward
    iterates the param lists, so structure defines the net."""
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 40))
    p = {
        "conv1": iqa_clipiqa._conv_p(next(ks), 3, 3, 32), "bn1": iqa_clipiqa._bn_p(32),
        "conv2": iqa_clipiqa._conv_p(next(ks), 3, 32, 32), "bn2": iqa_clipiqa._bn_p(32),
        "conv3": iqa_clipiqa._conv_p(next(ks), 3, 32, 64), "bn3": iqa_clipiqa._bn_p(64),
    }
    cin = 64
    for si, width in enumerate((16, 16, 16, 16)):
        blk = {
            "conv1": iqa_clipiqa._conv_p(next(ks), 1, cin, width),
            "bn1": iqa_clipiqa._bn_p(width),
            "conv2": iqa_clipiqa._conv_p(next(ks), 3, width, width),
            "bn2": iqa_clipiqa._bn_p(width),
            "conv3": iqa_clipiqa._conv_p(next(ks), 1, width, width * 4),
            "bn3": iqa_clipiqa._bn_p(width * 4),
            "down_conv": iqa_clipiqa._conv_p(next(ks), 1, cin, width * 4),
            "down_bn": iqa_clipiqa._bn_p(width * 4),
        }
        p[f"layer{si + 1}"] = [blk]
        cin = width * 4
    D = 64
    p["attnpool"] = {
        "pos": jax.random.normal(next(ks), (2 * 2 + 1, D)) / 8.0,
        "q": {"kernel": jax.random.normal(next(ks), (D, D)) / 8.0,
              "bias": jnp.zeros((D,))},
        "k": {"kernel": jax.random.normal(next(ks), (D, D)) / 8.0,
              "bias": jnp.zeros((D,))},
        "v": {"kernel": jax.random.normal(next(ks), (D, D)) / 8.0,
              "bias": jnp.zeros((D,))},
        "c": {"kernel": jax.random.normal(next(ks), (D, 24)) / 8.0,
              "bias": jnp.zeros((24,))},
    }
    t = jax.random.normal(next(ks), (2, 24), jnp.float32)
    p["text_features"] = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    return p


class TestCLIPIQA:
    def test_image_tower_parity(self):
        p = _tiny_clip_params()
        img = np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
        got = np.asarray(iqa_clipiqa.encode_image(p, jnp.asarray(img)))
        want = iqa_clipiqa.encode_image_reference(p, img)
        assert np.abs(got - want).max() < 1e-4
        assert np.abs(np.linalg.norm(got, axis=-1) - 1.0).max() < 1e-5

    def test_full_rn50_score(self):
        p = iqa_clipiqa.init_clipiqa_params(jax.random.PRNGKey(0))
        img = np.random.default_rng(1).uniform(size=(96, 96, 3)).astype(np.float32)
        s = iqa_clipiqa.clipiqa(p, img)
        assert 0.0 <= s <= 1.0

    def test_pos_embedding_interpolation(self):
        """Non-224 inputs resize the 7x7 positional grid instead of failing."""
        p = iqa_clipiqa.init_clipiqa_params(jax.random.PRNGKey(1))
        img = np.full((64, 128, 3), 0.3, np.float32)
        assert np.isfinite(iqa_clipiqa.clipiqa(p, img))

    def test_antonym_softmax(self):
        """Score is the softmax weight of the 'good' prompt: swapping the
        prompt features maps s -> 1-s."""
        p = _tiny_clip_params()
        img = np.random.default_rng(2).uniform(size=(64, 64, 3)).astype(np.float32)
        s = iqa_clipiqa.clipiqa(p, img)
        p2 = dict(p, text_features=p["text_features"][::-1])
        assert abs((1.0 - s) - iqa_clipiqa.clipiqa(p2, img)) < 1e-4


class TestMANIQA:
    def test_tab_block_parity(self):
        key = jax.random.PRNGKey(0)
        dim = 16
        p = {
            "q": iqa_maniqa._lin_p(jax.random.fold_in(key, 0), dim, dim),
            "k": iqa_maniqa._lin_p(jax.random.fold_in(key, 1), dim, dim),
            "v": iqa_maniqa._lin_p(jax.random.fold_in(key, 2), dim, dim),
        }
        x = np.random.default_rng(0).normal(size=(2, 6, dim)).astype(np.float32)
        got = np.asarray(iqa_maniqa.tab_block(p, jnp.asarray(x)))
        want = iqa_maniqa.tab_block_reference(p, x)
        assert np.abs(got - want).max() < 1e-5

    def test_swin_shift_mask_blocks_wraparound(self):
        """A shifted block's mask must stop tokens from attending across the
        roll seam: masked entries are -100 exactly where window regions
        differ."""
        m = iqa_maniqa._shift_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert (m == 0).any() and (m == -100.0).any()
        # unshifted interior window (top-left) is fully unmasked
        assert (m[0] == 0).all()

    def test_forward_smoke(self):
        p = iqa_maniqa.init_maniqa_params(jax.random.PRNGKey(0))
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 224, 224, 3)), jnp.float32
        )
        s = iqa_maniqa.maniqa_forward(p, img)
        assert s.shape == (1,)
        assert bool(jnp.isfinite(s[0]))

    def test_weighted_pooling(self):
        """Score is weight-normalized: scaling all weights by a constant
        leaves the score unchanged."""
        rng = np.random.default_rng(1)
        s = jnp.asarray(rng.uniform(size=(1, 10)))
        w = jnp.asarray(rng.uniform(size=(1, 10)))
        a = jnp.sum(s * w, axis=1) / (jnp.sum(w, axis=1) + 1e-8)
        b = jnp.sum(s * (3 * w), axis=1) / (jnp.sum(3 * w, axis=1) + 1e-8)
        assert abs(float(a[0] - b[0])) < 1e-6
