"""JAX-native CLIP-L and T5 text encoders.

The reference computes training-time prompt conditioning with host-loaded
HF transformers (CLIP-L bf16 + T5-XXL, flux_piplines/texturing/trainer.py:
165-181); inference needs none (zero embeds, texturing/pipeline.py:538-543).
``models/text_encoders.py`` keeps the host-side HF wrapper; this module is
the on-device equivalent so the WHOLE conditioning path runs on TPU — the
4.7B T5-XXL encode is a large-matmul workload that belongs on the MXU, and
its params take the same stacked [L, ...] layout as the FLUX/SD3 blocks so
``parallel.sharding`` tensor-parallel specs apply.

Both implementations follow the HF numerics exactly (parity-tested against
tiny random ``transformers`` models in tests/test_text_jax.py):

- CLIP text tower: learned token+position embeddings, pre-LN blocks with
  causal attention and quick-GELU MLP, final LN, pooled output at the
  first EOS token (CLIPTextModel.pooler_output).
- T5 v1.1 encoder: tied embedding, RMS-normed blocks with UNSCALED
  attention (T5 folds 1/sqrt(d_kv) into the weights) plus the shared
  layer-0 relative-position bucket bias, gated-GELU (or legacy ReLU) FF,
  final RMS norm.  No padding mask by default — the reference pipeline
  passes only input_ids to T5 (max_length padding, no attention_mask).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flux.layers import gelu_tanh, linear, linear_init, rms_norm, sdpa

Params = Dict[str, Any]


# --------------------------------------------------------------- CLIP text


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 77
    eos_token_id: int = 49407
    hidden_act: str = "quick_gelu"  # CLIP-L; tiny HF configs may use "gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def clip_l() -> "CLIPTextConfig":
        return CLIPTextConfig()


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_python"):
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh"):
        return gelu_tanh
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation {name!r}")


def _ln_affine(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _ln_init(d: int) -> Params:
    return {"weight": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _clip_block_init(key, cfg: CLIPTextConfig) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "ln1": _ln_init(d),
        "q": linear_init(ks[0], d, d),
        "k": linear_init(ks[1], d, d),
        "v": linear_init(ks[2], d, d),
        "out": linear_init(ks[3], d, d),
        "ln2": _ln_init(d),
        "fc1": linear_init(ks[4], d, cfg.mlp_dim),
        "fc2": linear_init(ks[5], cfg.mlp_dim, d),
    }


def init_clip_text_params(key, cfg: CLIPTextConfig) -> Params:
    k_tok, k_pos, k_blocks = jax.random.split(key, 3)
    blocks = [
        _clip_block_init(k, cfg) for k in jax.random.split(k_blocks, cfg.num_layers)
    ]
    return {
        "token_embedding": jax.random.normal(
            k_tok, (cfg.vocab_size, cfg.hidden_size), jnp.float32
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            k_pos, (cfg.max_positions, cfg.hidden_size), jnp.float32
        )
        * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "final_ln": _ln_init(cfg.hidden_size),
    }


def clip_text_forward(
    params: Params, cfg: CLIPTextConfig, input_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """input_ids [B, S] int32 -> (last_hidden_state [B, S, D] after the
    final LN, pooled [B, D] at the first EOS position)."""
    B, S = input_ids.shape
    act = _act(cfg.hidden_act)
    eps = cfg.layer_norm_eps
    x = params["token_embedding"][input_ids] + params["position_embedding"][:S]
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]

    def body(x, p):
        h = _ln_affine(p["ln1"], x, eps)
        q = linear(p["q"], h).reshape(B, S, cfg.num_heads, -1)
        k = linear(p["k"], h).reshape(B, S, cfg.num_heads, -1)
        v = linear(p["v"], h).reshape(B, S, cfg.num_heads, -1)
        attn = sdpa(q, k, v, mask=causal).reshape(B, S, -1)
        x = x + linear(p["out"], attn)
        h = _ln_affine(p["ln2"], x, eps)
        x = x + linear(p["fc2"], act(linear(p["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln_affine(params["final_ln"], x, eps)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(B), eos_pos]
    return x, pooled


def convert_clip_text(sd: Dict[str, Any], cfg: CLIPTextConfig) -> Params:
    """HF CLIPTextModel state dict (``text_model.*`` keys, torch layout)
    -> our param tree."""

    def a(k):
        return jnp.asarray(np.asarray(sd[f"text_model.{k}"]), jnp.float32)

    def lin(k):
        return {"kernel": a(f"{k}.weight").T, "bias": a(f"{k}.bias")}

    def ln(k):
        return {"weight": a(f"{k}.weight"), "bias": a(f"{k}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        blocks.append(
            {
                "ln1": ln(f"{pre}.layer_norm1"),
                "q": lin(f"{pre}.self_attn.q_proj"),
                "k": lin(f"{pre}.self_attn.k_proj"),
                "v": lin(f"{pre}.self_attn.v_proj"),
                "out": lin(f"{pre}.self_attn.out_proj"),
                "ln2": ln(f"{pre}.layer_norm2"),
                "fc1": lin(f"{pre}.mlp.fc1"),
                "fc2": lin(f"{pre}.mlp.fc2"),
            }
        )
    return {
        "token_embedding": a("embeddings.token_embedding.weight"),
        "position_embedding": a("embeddings.position_embedding.weight"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "final_ln": ln("final_layer_norm"),
    }


def clip_config_from_sd(sd: Dict[str, Any]) -> CLIPTextConfig:
    V, D = sd["text_model.embeddings.token_embedding.weight"].shape
    P = sd["text_model.embeddings.position_embedding.weight"].shape[0]
    F = sd["text_model.encoder.layers.0.mlp.fc1.weight"].shape[0]
    n = 0
    while f"text_model.encoder.layers.{n}.layer_norm1.weight" in sd:
        n += 1
    return dataclasses.replace(
        CLIPTextConfig(), vocab_size=V, hidden_size=D, mlp_dim=F, num_layers=n
    )


# ----------------------------------------------------------------- T5 enc


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_buckets: int = 32
    relative_max_distance: int = 128
    gated_act: bool = True  # v1.1 gated-GELU; False = legacy ReLU
    layer_norm_eps: float = 1e-6

    @staticmethod
    def t5_v1_1_xxl() -> "T5EncoderConfig":
        return T5EncoderConfig()


def _t5_block_init(key, cfg: T5EncoderConfig) -> Params:
    ks = jax.random.split(key, 7)
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    p = {
        "ln_attn": jnp.ones((d,), jnp.float32),
        "q": linear_init(ks[0], d, inner, bias=False),
        "k": linear_init(ks[1], d, inner, bias=False),
        "v": linear_init(ks[2], d, inner, bias=False),
        "o": linear_init(ks[3], inner, d, bias=False),
        "ln_ff": jnp.ones((d,), jnp.float32),
        "wo": linear_init(ks[4], cfg.d_ff, d, bias=False),
    }
    if cfg.gated_act:
        p["wi_0"] = linear_init(ks[5], d, cfg.d_ff, bias=False)
        p["wi_1"] = linear_init(ks[6], d, cfg.d_ff, bias=False)
    else:
        p["wi"] = linear_init(ks[5], d, cfg.d_ff, bias=False)
    return p


def init_t5_encoder_params(key, cfg: T5EncoderConfig) -> Params:
    k_emb, k_rel, k_blocks = jax.random.split(key, 3)
    blocks = [
        _t5_block_init(k, cfg) for k in jax.random.split(k_blocks, cfg.num_layers)
    ]
    return {
        "embedding": jax.random.normal(
            k_emb, (cfg.vocab_size, cfg.d_model), jnp.float32
        ),
        "relative_bias": jax.random.normal(
            k_rel, (cfg.relative_buckets, cfg.num_heads), jnp.float32
        )
        * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "final_ln": jnp.ones((cfg.d_model,), jnp.float32),
    }


def _t5_relative_buckets(S: int, num_buckets: int, max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucket ids [S, S] (HF
    _relative_position_bucket: sign half + exact small distances +
    log-spaced large distances)."""
    ctx = jnp.arange(S)[:, None]
    mem = jnp.arange(S)[None, :]
    rel = mem - ctx
    half = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * half
    rel = jnp.abs(rel)
    max_exact = half // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, half - 1)
    return buckets + jnp.where(rel < max_exact, rel, large)


def t5_encoder_forward(
    params: Params,
    cfg: T5EncoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """input_ids [B, S] int32 -> last_hidden_state [B, S, d_model].

    ``attention_mask`` [B, S] (1 = attend) is optional; the reference's
    FLUX prompt path omits it (diffusers passes input_ids only)."""
    B, S = input_ids.shape
    x = params["embedding"][input_ids]
    buckets = _t5_relative_buckets(
        S, cfg.relative_buckets, cfg.relative_max_distance
    )
    # [S, S, H] -> [1, H, S, S]; shared by every layer (computed in block 0
    # upstream, reused by reference via position_bias threading)
    bias = params["relative_bias"][buckets].transpose(2, 0, 1)[None]
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask, 0.0, -1e9)[:, None, None, :]

    def body(x, p):
        h = rms_norm(x, p["ln_attn"], cfg.layer_norm_eps)
        q = linear(p["q"], h).reshape(B, S, cfg.num_heads, cfg.d_kv)
        k = linear(p["k"], h).reshape(B, S, cfg.num_heads, cfg.d_kv)
        v = linear(p["v"], h).reshape(B, S, cfg.num_heads, cfg.d_kv)
        # T5 attention is UNSCALED (1/sqrt(d_kv) folded into init)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, -1)
        x = x + linear(p["o"], attn)
        h = rms_norm(x, p["ln_ff"], cfg.layer_norm_eps)
        if cfg.gated_act:
            ff = gelu_tanh(linear(p["wi_0"], h)) * linear(p["wi_1"], h)
        else:
            ff = jax.nn.relu(linear(p["wi"], h))
        x = x + linear(p["wo"], ff)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return rms_norm(x, params["final_ln"], cfg.layer_norm_eps)


def convert_t5_encoder(sd: Dict[str, Any], cfg: T5EncoderConfig) -> Params:
    """HF T5EncoderModel state dict -> our param tree."""

    def a(k):
        return jnp.asarray(np.asarray(sd[k]), jnp.float32)

    def lin(k):
        return {"kernel": a(f"{k}.weight").T}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        b = {
            "ln_attn": a(f"{pre}.0.layer_norm.weight"),
            "q": lin(f"{pre}.0.SelfAttention.q"),
            "k": lin(f"{pre}.0.SelfAttention.k"),
            "v": lin(f"{pre}.0.SelfAttention.v"),
            "o": lin(f"{pre}.0.SelfAttention.o"),
            "ln_ff": a(f"{pre}.1.layer_norm.weight"),
            "wo": lin(f"{pre}.1.DenseReluDense.wo"),
        }
        if cfg.gated_act:
            b["wi_0"] = lin(f"{pre}.1.DenseReluDense.wi_0")
            b["wi_1"] = lin(f"{pre}.1.DenseReluDense.wi_1")
        else:
            b["wi"] = lin(f"{pre}.1.DenseReluDense.wi")
        blocks.append(b)
    return {
        "embedding": a("shared.weight"),
        "relative_bias": a(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "final_ln": a("encoder.final_layer_norm.weight"),
    }


def t5_config_from_sd(sd: Dict[str, Any]) -> T5EncoderConfig:
    V, D = sd["shared.weight"].shape
    n_buckets, H = sd[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ].shape
    inner = sd["encoder.block.0.layer.0.SelfAttention.q.weight"].shape[0]
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in sd
    ff_key = "wi_0" if gated else "wi"
    F = sd[f"encoder.block.0.layer.1.DenseReluDense.{ff_key}.weight"].shape[0]
    n = 0
    while f"encoder.block.{n}.layer.0.layer_norm.weight" in sd:
        n += 1
    return dataclasses.replace(
        T5EncoderConfig(),
        vocab_size=V,
        d_model=D,
        d_kv=inner // H,
        d_ff=F,
        num_layers=n,
        num_heads=H,
        relative_buckets=n_buckets,
        gated_act=gated,
    )
