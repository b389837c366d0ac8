"""Checkpoint loading: diffusers safetensors -> our functional param trees.

Covers the reference's model loading path (/root/reference/pipeline.py:83-104:
``FluxTransformer2DModel.from_pretrained(f"{root}/flux/transformer")`` in
bf16 + two LoRA adapters).  Torch Linear weights are [out, in] and convs
[out, in, kh, kw]; our layout is [in, out] / [kh, kw, in, out].
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Callable, Dict, Iterable, Mapping

import jax.numpy as jnp
import numpy as np

from .config import FluxConfig
from .vae import VAEConfig


def _t(x):
    return jnp.asarray(np.asarray(x).T)


def _conv(x):
    return jnp.asarray(np.asarray(x).transpose(2, 3, 1, 0))


def _vec(x):
    return jnp.asarray(np.asarray(x))


def iter_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a .safetensors file or a diffusers model dir
    (index json + shards)."""
    from safetensors import safe_open

    files: Iterable[str]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    else:
        files = [path]
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as fh:
            for k in fh.keys():
                sd[k] = fh.get_tensor(k)
    return sd


# ------------------------------------------------------------ transformer


def flux_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: FluxConfig
) -> Dict[str, Any]:
    """Map a diffusers FluxTransformer2DModel state dict into the
    ``init_flux_params`` tree."""

    def lin(prefix):
        p = {"kernel": _t(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = _vec(sd[f"{prefix}.bias"])
        return p

    def embedder(prefix):
        return {"in": lin(f"{prefix}.linear_1"), "out": lin(f"{prefix}.linear_2")}

    params: Dict[str, Any] = {
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_embed": embedder("time_text_embed.timestep_embedder"),
        "pooled_embed": embedder("time_text_embed.text_embedder"),
        "norm_out": {"lin": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }
    if cfg.guidance_embeds:
        params["guidance_embed"] = embedder("time_text_embed.guidance_embedder")

    from .model import stack_blocks

    dual = []
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        dual.append(
            {
                "norm1": {"lin": lin(f"{b}.norm1.linear")},
                "norm1_context": {"lin": lin(f"{b}.norm1_context.linear")},
                "attn": {
                    "to_q": lin(f"{b}.attn.to_q"),
                    "to_k": lin(f"{b}.attn.to_k"),
                    "to_v": lin(f"{b}.attn.to_v"),
                    "norm_q": _vec(sd[f"{b}.attn.norm_q.weight"]),
                    "norm_k": _vec(sd[f"{b}.attn.norm_k.weight"]),
                    "add_q_proj": lin(f"{b}.attn.add_q_proj"),
                    "add_k_proj": lin(f"{b}.attn.add_k_proj"),
                    "add_v_proj": lin(f"{b}.attn.add_v_proj"),
                    "norm_added_q": _vec(sd[f"{b}.attn.norm_added_q.weight"]),
                    "norm_added_k": _vec(sd[f"{b}.attn.norm_added_k.weight"]),
                    "to_out": lin(f"{b}.attn.to_out.0"),
                    "to_add_out": lin(f"{b}.attn.to_add_out"),
                },
                "ff": {
                    "in": lin(f"{b}.ff.net.0.proj"),
                    "out": lin(f"{b}.ff.net.2"),
                },
                "ff_context": {
                    "in": lin(f"{b}.ff_context.net.0.proj"),
                    "out": lin(f"{b}.ff_context.net.2"),
                },
            }
        )
    params["dual_blocks"] = stack_blocks(dual)

    single = []
    for i in range(cfg.num_single_layers):
        b = f"single_transformer_blocks.{i}"
        single.append(
            {
                "norm": {"lin": lin(f"{b}.norm.linear")},
                "attn": {
                    "to_q": lin(f"{b}.attn.to_q"),
                    "to_k": lin(f"{b}.attn.to_k"),
                    "to_v": lin(f"{b}.attn.to_v"),
                    "norm_q": _vec(sd[f"{b}.attn.norm_q.weight"]),
                    "norm_k": _vec(sd[f"{b}.attn.norm_k.weight"]),
                },
                "proj_mlp": lin(f"{b}.proj_mlp"),
                "proj_out": lin(f"{b}.proj_out"),
            }
        )
    params["single_blocks"] = stack_blocks(single)
    return params


def load_flux_transformer(path: str, cfg: FluxConfig) -> Dict[str, Any]:
    return flux_params_from_state_dict(iter_safetensors(path), cfg)


# ------------------------------------------------------------------- VAE


def vae_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: VAEConfig
) -> Dict[str, Any]:
    """Map a diffusers AutoencoderKL state dict into ``init_vae_params``."""

    def cv(prefix):
        return {"kernel": _conv(sd[f"{prefix}.weight"]), "bias": _vec(sd[f"{prefix}.bias"])}

    def gn(prefix):
        return {"scale": _vec(sd[f"{prefix}.weight"]), "bias": _vec(sd[f"{prefix}.bias"])}

    def lin(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": _vec(sd[f"{prefix}.bias"])}

    def resnet(prefix):
        p = {
            "norm1": gn(f"{prefix}.norm1"),
            "conv1": cv(f"{prefix}.conv1"),
            "norm2": gn(f"{prefix}.norm2"),
            "conv2": cv(f"{prefix}.conv2"),
        }
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["shortcut"] = cv(f"{prefix}.conv_shortcut")
        return p

    def attn(prefix):
        return {
            "norm": gn(f"{prefix}.group_norm"),
            "q": lin(f"{prefix}.to_q"),
            "k": lin(f"{prefix}.to_k"),
            "v": lin(f"{prefix}.to_v"),
            "o": lin(f"{prefix}.to_out.0"),
        }

    n_levels = len(cfg.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": cv("encoder.conv_in")}
    down = []
    for i in range(n_levels):
        level = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            level["downsample"] = cv(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        down.append(level)
    enc["down"] = down
    enc["mid"] = {
        "res1": resnet("encoder.mid_block.resnets.0"),
        "attn": attn("encoder.mid_block.attentions.0"),
        "res2": resnet("encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = gn("encoder.conv_norm_out")
    enc["conv_out"] = cv("encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": cv("decoder.conv_in")}
    dec["mid"] = {
        "res1": resnet("decoder.mid_block.resnets.0"),
        "attn": attn("decoder.mid_block.attentions.0"),
        "res2": resnet("decoder.mid_block.resnets.1"),
    }
    up = []
    for i in range(n_levels):
        level = {
            "resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            level["upsample"] = cv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = gn("decoder.conv_norm_out")
    dec["conv_out"] = cv("decoder.conv_out")
    return {"encoder": enc, "decoder": dec}


def load_vae(path: str, cfg: VAEConfig) -> Dict[str, Any]:
    return vae_params_from_state_dict(iter_safetensors(path), cfg)
