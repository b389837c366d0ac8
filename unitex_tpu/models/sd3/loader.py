"""diffusers SD3Transformer2DModel state dict -> our param tree."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..flux.model import stack_blocks
from .config import SD3Config


def _t(x):
    return jnp.asarray(np.asarray(x).T)


def _vec(x):
    return jnp.asarray(np.asarray(x))


def sd3_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: SD3Config
) -> Dict[str, Any]:
    def lin(prefix):
        p = {"kernel": _t(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = _vec(sd[f"{prefix}.bias"])
        return p

    def embedder(prefix):
        return {"in": lin(f"{prefix}.linear_1"), "out": lin(f"{prefix}.linear_2")}

    ps = cfg.patch_size
    # PatchEmbed conv [d, C, ps, ps] -> linear over (C, ph, pw)-flattened patches
    conv_w = np.asarray(sd["pos_embed.proj.weight"])
    d = conv_w.shape[0]
    proj_kernel = jnp.asarray(conv_w.reshape(d, -1).T)
    pos = np.asarray(sd["pos_embed.pos_embed"])  # [1, pmax*pmax, d]
    pmax = cfg.pos_embed_max_size

    params: Dict[str, Any] = {
        "pos_embed": {
            "proj": {"kernel": proj_kernel, "bias": _vec(sd["pos_embed.proj.bias"])},
            "pos": jnp.asarray(pos.reshape(pmax, pmax, d)),
        },
        "context_embedder": lin("context_embedder"),
        "time_embed": embedder("time_text_embed.timestep_embedder"),
        "pooled_embed": embedder("time_text_embed.text_embedder"),
        "norm_out": {"lin": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }

    def attn(prefix, with_ctx_out):
        p = {
            "to_q": lin(f"{prefix}.to_q"),
            "to_k": lin(f"{prefix}.to_k"),
            "to_v": lin(f"{prefix}.to_v"),
            "add_q_proj": lin(f"{prefix}.add_q_proj"),
            "add_k_proj": lin(f"{prefix}.add_k_proj"),
            "add_v_proj": lin(f"{prefix}.add_v_proj"),
            "to_out": lin(f"{prefix}.to_out.0"),
        }
        if with_ctx_out:
            p["to_add_out"] = lin(f"{prefix}.to_add_out")
        return p

    blocks = []
    for i in range(cfg.num_layers - 1):
        b = f"transformer_blocks.{i}"
        blocks.append(
            {
                "norm1": {"lin": lin(f"{b}.norm1.linear")},
                "norm1_context": {"lin": lin(f"{b}.norm1_context.linear")},
                "attn": attn(f"{b}.attn", True),
                "ff": {"in": lin(f"{b}.ff.net.0.proj"), "out": lin(f"{b}.ff.net.2")},
                "ff_context": {
                    "in": lin(f"{b}.ff_context.net.0.proj"),
                    "out": lin(f"{b}.ff_context.net.2"),
                },
            }
        )
    params["blocks"] = stack_blocks(blocks)
    i = cfg.num_layers - 1
    b = f"transformer_blocks.{i}"
    params["final_block"] = {
        "norm1": {"lin": lin(f"{b}.norm1.linear")},
        "norm1_context": {"lin": lin(f"{b}.norm1_context.linear")},
        "attn": attn(f"{b}.attn", False),
        "ff": {"in": lin(f"{b}.ff.net.0.proj"), "out": lin(f"{b}.ff.net.2")},
    }
    return params
