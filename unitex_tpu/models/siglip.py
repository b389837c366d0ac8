"""JAX-native SigLIP vision tower (the Redux image encoder backbone).

The reference's Redux path encodes the reference image with a host-torch
SigLIP (``PBRFluxPriorReduxPipeline``, flux_piplines/texturing/pipeline.py:
146-180 — SigLIP last_hidden_state -> Redux projection -> 729 image-prompt
tokens).  CLIP/T5 already run on-device (models/text_jax.py); this module
gives SigLIP the same treatment so the WHOLE Redux conditioning path is a
TPU program — a pure ViT (patch conv + 27 pre-LN blocks at 1152-wide) that
maps straight onto the MXU.  Same conventions as text_jax.py: stacked
[L, ...] block params under lax.scan (depth-constant compile), an HF
state-dict converter, parity-tested against tiny random ``transformers``
SiglipVisionModel in tests/test_siglip.py.

HF numerics followed exactly (SiglipVisionTransformer): valid-padding
patch conv + learned position embeddings (no class token), pre-LN blocks
(LN1 -> MHA -> residual, LN2 -> gelu_pytorch_tanh MLP -> residual), final
post_layernorm -> last_hidden_state.  The attention-pooling head exists in
HF but Redux consumes last_hidden_state, so it is not needed here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .flux.layers import linear, linear_init
from .text_jax import _act, _ln_affine, _ln_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    mlp_dim: int = 4304
    patch_size: int = 14
    image_size: int = 384
    num_channels: int = 3
    hidden_act: str = "gelu_pytorch_tanh"
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def so400m_384() -> "SiglipVisionConfig":
        """google/siglip-so400m-patch14-384 — the Redux backbone
        (27x27 = 729 patch tokens)."""
        return SiglipVisionConfig()

    @staticmethod
    def tiny() -> "SiglipVisionConfig":
        return SiglipVisionConfig(
            hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64,
            patch_size=14, image_size=28,
        )


def _block_init(key, cfg: SiglipVisionConfig) -> Params:
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


def init_siglip_params(key, cfg: SiglipVisionConfig) -> Params:
    k_patch, k_pos, k_blocks = jax.random.split(key, 3)
    blocks = [
        _block_init(k, cfg) for k in jax.random.split(k_blocks, cfg.num_layers)
    ]
    p = cfg.patch_size
    fan = p * p * cfg.num_channels
    return {
        "patch_embedding": {
            "w": jax.random.normal(
                k_patch, (p, p, cfg.num_channels, cfg.hidden_size), jnp.float32
            ) * (1.0 / fan) ** 0.5,
            "b": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "position_embedding": jax.random.normal(
            k_pos, (cfg.num_patches, cfg.hidden_size), jnp.float32
        ) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "post_layernorm": _ln_init(cfg.hidden_size),
    }


def siglip_forward(
    params: Params, cfg: SiglipVisionConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """pixel_values [B, H, W, 3] (NHWC, already SigLIP-normalized:
    (x/255 - 0.5) / 0.5) -> last_hidden_state [B, N, D] after the final
    post_layernorm — exactly HF SiglipVisionModel().last_hidden_state."""
    B = pixel_values.shape[0]
    eps = cfg.layer_norm_eps
    act = _act(cfg.hidden_act)
    ps = cfg.patch_size
    pe = params["patch_embedding"]
    x = jax.lax.conv_general_dilated(
        pixel_values, pe["w"],
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["b"]
    x = x.reshape(B, -1, cfg.hidden_size)
    S = x.shape[1]
    x = x + params["position_embedding"][:S]

    from .flux.layers import sdpa

    def body(x, p):
        h = _ln_affine(p["ln1"], x, eps)
        q = linear(p["q"], h).reshape(B, S, cfg.num_heads, -1)
        k = linear(p["k"], h).reshape(B, S, cfg.num_heads, -1)
        v = linear(p["v"], h).reshape(B, S, cfg.num_heads, -1)
        attn = sdpa(q, k, v).reshape(B, S, -1)
        x = x + linear(p["out"], attn)
        h = _ln_affine(p["ln2"], x, eps)
        x = x + linear(p["fc2"], act(linear(p["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _ln_affine(params["post_layernorm"], x, eps)


def preprocess_siglip(image, cfg: SiglipVisionConfig) -> jnp.ndarray:
    """PIL image (or [H, W, 3] uint8 array) -> normalized pixel batch
    [1, S, S, 3] — SiglipImageProcessor semantics: bicubic resize to the
    model's square input, rescale 1/255, normalize mean/std 0.5."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    s = cfg.image_size
    arr = np.asarray(
        image.convert("RGB").resize((s, s), Image.BICUBIC), np.float32
    )
    arr = (arr / 255.0 - 0.5) / 0.5
    return jnp.asarray(arr[None])


def convert_siglip_vision(sd: Dict[str, Any], cfg: SiglipVisionConfig) -> Params:
    """HF SiglipVisionModel state dict (``vision_model.*`` keys, torch
    layout; tensors or numpy) -> our param tree."""

    def a(k):
        v = sd[f"vision_model.{k}"]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

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
        # torch Conv2d OIHW -> HWIO
        "patch_embedding": {
            "w": jnp.transpose(a("embeddings.patch_embedding.weight"), (2, 3, 1, 0)),
            "b": a("embeddings.patch_embedding.bias"),
        },
        "position_embedding": a("embeddings.position_embedding.weight"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "post_layernorm": ln("post_layernorm"),
    }


def siglip_config_from_sd(sd: Dict[str, Any]) -> SiglipVisionConfig:
    """Infer the vision config from a state dict's shapes."""
    w = np.asarray(sd["vision_model.embeddings.patch_embedding.weight"])
    d, c, p, _ = w.shape
    n_pos = np.asarray(
        sd["vision_model.embeddings.position_embedding.weight"]
    ).shape[0]
    fc1 = np.asarray(sd["vision_model.encoder.layers.0.mlp.fc1.weight"])
    n_layers = 0
    while f"vision_model.encoder.layers.{n_layers}.layer_norm1.weight" in sd:
        n_layers += 1
    side = int(round(n_pos ** 0.5))
    heads = {1152: 16, 768: 12, 1024: 16}.get(d, max(1, d // 72))
    return SiglipVisionConfig(
        hidden_size=d, num_layers=n_layers, num_heads=heads,
        mlp_dim=fc1.shape[0], patch_size=p, image_size=side * p,
        num_channels=c,
    )


def load_siglip(path_or_dir: str):
    """Load SigLIP vision weights from a safetensors file or an HF model
    dir -> (params, config).  Head count is not recoverable from tensor
    shapes, so an HF ``config.json`` next to the weights (standard layout)
    takes precedence over the shape-inferred config."""
    import json
    import os

    from .flux.loader import iter_safetensors

    path = path_or_dir
    if os.path.isdir(path):
        sd = iter_safetensors(path)
        cfg_path = os.path.join(path, "config.json")
    else:
        from safetensors.numpy import load_file

        sd = load_file(path)
        cfg_path = os.path.join(os.path.dirname(path), "config.json")
    cfg = siglip_config_from_sd(sd)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        hf = hf.get("vision_config", hf)
        cfg = dataclasses.replace(
            cfg,
            num_heads=int(hf.get("num_attention_heads", cfg.num_heads)),
            hidden_act=hf.get("hidden_act", cfg.hidden_act),
            layer_norm_eps=float(hf.get("layer_norm_eps", cfg.layer_norm_eps)),
        )
    return convert_siglip_vision(sd, cfg), cfg
