"""SwinIR (BasicSR swinir_arch capability): shifted-window attention SR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.swinir import (
    SwinIRConfig,
    _rel_position_index,
    _shift_mask,
    _stl_init,
    _window_attention,
    init_swinir_params,
    swinir_forward,
)


def test_forward_shape_and_finite():
    cfg = SwinIRConfig.tiny()
    params = init_swinir_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32))
    y = jax.jit(lambda p, x: swinir_forward(p, cfg, x))(params, x)
    assert y.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_unpadded_input_rejected():
    cfg = SwinIRConfig.tiny()
    params = init_swinir_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        swinir_forward(params, cfg, jnp.zeros((1, 10, 10, 3)))


def test_all_params_receive_gradient():
    cfg = SwinIRConfig.tiny()
    params = init_swinir_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 8, 8, 3)).astype(np.float32))

    def loss(p):
        return jnp.mean((swinir_forward(p, cfg, x) - 0.5) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(k) for k, v in flat if float(jnp.abs(v).max()) == 0.0]
    assert dead == [], dead


def test_window_attention_matches_full_mha_when_window_covers_image():
    """One window == plain multi-head attention with relative position bias."""
    cfg = SwinIRConfig(embed_dim=8, depths=(1,), num_heads=2, window_size=4, scale=2)
    p = _stl_init(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 4, 8)).astype(np.float32))
    ours = _window_attention(p, cfg, x, None)

    # naive reference
    C, nh = 8, 2
    hd = C // nh
    tokens = x.reshape(1, 16, C)
    qkv = tokens @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = np.split(np.asarray(qkv), 3, axis=-1)
    q = q.reshape(1, 16, nh, hd).transpose(0, 2, 1, 3) * hd**-0.5
    k = k.reshape(1, 16, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(1, 16, nh, hd).transpose(0, 2, 1, 3)
    attn = q @ k.transpose(0, 1, 3, 2)
    bias = np.asarray(p["rel_bias"])[_rel_position_index(4)]  # [16,16,nh]
    attn = attn + bias.transpose(2, 0, 1)[None]
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(1, 16, C)
    ref = (out @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"]))
    np.testing.assert_allclose(
        np.asarray(ours).reshape(1, 16, C), ref, rtol=2e-4, atol=2e-4)


def test_rel_position_index_properties():
    idx = _rel_position_index(4)
    assert idx.shape == (16, 16)
    # diagonal = zero displacement = center of the (2w-1)^2 table
    assert (np.diag(idx) == (4 - 1) * (2 * 4 - 1) + (4 - 1)).all()
    assert idx.min() >= 0 and idx.max() < 49


def test_shift_mask_blocks_cross_region_pairs():
    m = _shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # first window is interior-only: nothing masked
    assert (m[0] == 0).all()
    # the wrapped windows mask some pairs, symmetrically
    assert (m[1] < 0).any()
    np.testing.assert_array_equal(m[1], m[1].T)


def test_shifted_and_unshifted_layers_differ():
    cfg = SwinIRConfig(embed_dim=8, depths=(2,), num_heads=2, window_size=4, scale=2)
    params = init_swinir_params(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 8, 8, 3)).astype(np.float32))
    y = swinir_forward(params, cfg, x)
    assert bool(jnp.all(jnp.isfinite(y)))
    # degenerate config with depth 1 (no shifted layer) gives a different map
    cfg1 = SwinIRConfig(embed_dim=8, depths=(1,), num_heads=2, window_size=4, scale=2)
    p1 = {k: v for k, v in params.items()}
    p1["groups"] = [{
        "layers": jax.tree.map(lambda a: a[:1], params["groups"][0]["layers"]),
        "conv": params["groups"][0]["conv"],
    }]
    y1 = swinir_forward(p1, cfg1, x)
    assert float(jnp.abs(y - y1).max()) > 1e-6
