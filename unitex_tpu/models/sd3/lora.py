"""LoRA for the SD3 MMDiT (+ VAE encoder), as TSD-SR uses it:
rank-64 adapters on the transformer and the VAE encoder
(/root/reference/TSD_SR/sr_pipeline.py:185-215)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..flux.lora import merge_lora  # generic {a,b} tree merge walk

SD3_BLOCK_TARGETS = (
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"), ("attn", "to_out"),
    ("attn", "add_q_proj"), ("attn", "add_k_proj"), ("attn", "add_v_proj"),
    ("attn", "to_add_out"),
    ("ff", "in"), ("ff", "out"),
    ("ff_context", "in"), ("ff_context", "out"),
)
SD3_FINAL_TARGETS = (
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"), ("attn", "to_out"),
    ("attn", "add_q_proj"), ("attn", "add_k_proj"), ("attn", "add_v_proj"),
    ("ff", "in"), ("ff", "out"),
)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _ensure_set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def init_sd3_lora(key, params: Dict[str, Any], rank: int = 64) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))

    def make(kernel):
        shape = kernel.shape
        if len(shape) == 3:
            L, d_in, d_out = shape
            a_shape, b_shape = (L, d_in, rank), (L, rank, d_out)
        else:
            d_in, d_out = shape
            a_shape, b_shape = (d_in, rank), (rank, d_out)
        return {
            "a": jax.random.normal(next(keys), a_shape, jnp.float32) / np.sqrt(rank),
            "b": jnp.zeros(b_shape, jnp.float32),
        }

    lora: Dict[str, Any] = {"blocks": {}, "final_block": {}}
    for path in SD3_BLOCK_TARGETS:
        _ensure_set(lora["blocks"], path, make(_get(params["blocks"], path)["kernel"]))
    for path in SD3_FINAL_TARGETS:
        _ensure_set(
            lora["final_block"], path, make(_get(params["final_block"], path)["kernel"])
        )
    return lora


def init_vae_encoder_lora(key, vae_params: Dict[str, Any], rank: int = 64) -> Dict[str, Any]:
    """LoRA on the VAE encoder's mid-block attention projections (the
    1x1-conv-equivalent linears — the meaningful low-rank targets in a conv
    encoder)."""
    keys = iter(jax.random.split(key, 16))

    def make(kernel):
        d_in, d_out = kernel.shape
        return {
            "a": jax.random.normal(next(keys), (d_in, rank), jnp.float32) / np.sqrt(rank),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }

    attn = vae_params["encoder"]["mid"]["attn"]
    return {
        "encoder": {
            "mid": {
                "attn": {
                    name: make(attn[name]["kernel"]) for name in ("q", "k", "v", "o")
                }
            }
        }
    }


__all__ = [
    "init_sd3_lora",
    "init_vae_encoder_lora",
    "merge_lora",
    "SD3_BLOCK_TARGETS",
    "SD3_FINAL_TARGETS",
]
