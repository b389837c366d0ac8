"""LoRA adapters for the FLUX transformer.

Covers the capability of the reference's PEFT setup
(/root/reference/flux_piplines/texturing/trainer.py:276-318): low-rank
deltas on attention q/k/v/out (+ add_* context projections) and both MLPs,
plus full-rank "modules_to_save" overrides for x_embedder and the AdaLN
norms; and of the inference-time dual-adapter loading with weight vectors
[1,0]/[0,1] (/root/reference/pipeline.py:96-120).

Functional: a LoRA is a pytree mirroring a subset of the param tree with
{"a": [d_in, r], "b": [r, d_out]} leaves.  ``merge_lora`` folds
``scale · a @ b`` into the base kernels — O(r·d²) per layer, negligible
next to a denoise step — so the forward pass needs no special-casing and
multiple adapters compose by summed merge (the adapter-weights semantics of
set_adapters).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# kernel paths inside a dual block targeted by the reference LoRA config
DUAL_TARGETS = (
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"), ("attn", "to_out"),
    ("attn", "add_q_proj"), ("attn", "add_k_proj"), ("attn", "add_v_proj"),
    ("attn", "to_add_out"),
    ("ff", "in"), ("ff", "out"),
    ("ff_context", "in"), ("ff_context", "out"),
)
SINGLE_TARGETS = (
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"),
    ("proj_mlp",), ("proj_out",),
)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def init_lora_params(
    key: jax.Array,
    params: Dict[str, Any],
    rank: int = 16,
    include_single: bool = True,
) -> Dict[str, Any]:
    """Zero-initialized LoRA tree (a ~ N(0, 1/r), b = 0 — PEFT default)."""
    lora: Dict[str, Any] = {"dual_blocks": [], "single_blocks": []}
    keys = iter(jax.random.split(key, 4096))

    def make(p):
        d_in, d_out = p["kernel"].shape
        return {
            "a": jax.random.normal(next(keys), (d_in, rank), jnp.float32)
            / np.sqrt(rank),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }

    for blk in params["dual_blocks"]:
        entry: Dict[str, Any] = {}
        for path in DUAL_TARGETS:
            _ensure(entry, path)
            _set(entry, path, make(_get(blk, path)))
        lora["dual_blocks"].append(entry)
    if include_single:
        for blk in params["single_blocks"]:
            entry = {}
            for path in SINGLE_TARGETS:
                _ensure(entry, path)
                _set(entry, path, make(_get(blk, path)))
            lora["single_blocks"].append(entry)
    return lora


def _ensure(tree, path):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})


def merge_lora(
    params: Dict[str, Any],
    loras: Iterable[Tuple[Dict[str, Any], float]],
) -> Dict[str, Any]:
    """Return params with each (lora, weight) folded into the kernels."""
    merged = jax.tree.map(lambda x: x, params)  # shallow copy of leaves

    def walk(base, delta, scale):
        out = {}
        for k, v in base.items():
            if isinstance(v, dict):
                if k in delta and "a" in delta[k] and "b" in delta[k]:
                    d = delta[k]
                    out[k] = dict(v)
                    out[k]["kernel"] = v["kernel"] + scale * (
                        d["a"] @ d["b"]
                    ).astype(v["kernel"].dtype)
                elif k in delta:
                    out[k] = walk(v, delta[k], scale)
                else:
                    out[k] = v
            elif isinstance(v, list):
                dl = delta.get(k, [])
                out[k] = [
                    walk(b, dl[i], scale) if i < len(dl) else b
                    for i, b in enumerate(v)
                ]
            else:
                out[k] = v
        return out

    for lora, weight in loras:
        if weight == 0.0 or lora is None:
            continue
        merged = walk(merged, lora, weight)
    return merged


# ----------------------------------------------------- PEFT safetensors IO


def _peft_key_map(n_dual: int, n_single: int):
    """Map PEFT/diffusers LoRA safetensors keys ->
    (our-tree path, 'a'|'b').  Reference key style (trainer.py:282-304):
    ``transformer.transformer_blocks.{i}.attn.to_q.lora_A.weight``."""
    mapping = {}

    def add(hf_mod: str, path: Tuple):
        for ab, hf_ab in (("a", "lora_A"), ("b", "lora_B")):
            mapping[f"{hf_mod}.{hf_ab}.weight"] = (path, ab)

    hf_names_dual = {
        ("attn", "to_q"): "attn.to_q",
        ("attn", "to_k"): "attn.to_k",
        ("attn", "to_v"): "attn.to_v",
        ("attn", "to_out"): "attn.to_out.0",
        ("attn", "add_q_proj"): "attn.add_q_proj",
        ("attn", "add_k_proj"): "attn.add_k_proj",
        ("attn", "add_v_proj"): "attn.add_v_proj",
        ("attn", "to_add_out"): "attn.to_add_out",
        ("ff", "in"): "ff.net.0.proj",
        ("ff", "out"): "ff.net.2",
        ("ff_context", "in"): "ff_context.net.0.proj",
        ("ff_context", "out"): "ff_context.net.2",
    }
    hf_names_single = {
        ("attn", "to_q"): "attn.to_q",
        ("attn", "to_k"): "attn.to_k",
        ("attn", "to_v"): "attn.to_v",
        ("proj_mlp",): "proj_mlp",
        ("proj_out",): "proj_out",
    }
    for i in range(n_dual):
        for path, hf in hf_names_dual.items():
            add(
                f"transformer.transformer_blocks.{i}.{hf}",
                ("dual_blocks", i) + path,
            )
    for i in range(n_single):
        for path, hf in hf_names_single.items():
            add(
                f"transformer.single_transformer_blocks.{i}.{hf}",
                ("single_blocks", i) + path,
            )
    return mapping


def load_lora_safetensors(
    path: str, n_dual: int = 19, n_single: int = 38
) -> Dict[str, Any]:
    """Load a PEFT LoRA safetensors file into our tree layout.  PEFT stores
    lora_A as [r, d_in] and lora_B as [d_out, r] (torch out-first); we
    transpose into [d_in, r] / [r, d_out]."""
    from safetensors import safe_open

    mapping = _peft_key_map(n_dual, n_single)
    lora: Dict[str, Any] = {"dual_blocks": [{} for _ in range(n_dual)],
                            "single_blocks": [{} for _ in range(n_single)]}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            k = key
            if k.startswith("transformer."):
                pass
            elif k.startswith("base_model.model."):
                k = "transformer." + k[len("base_model.model."):]
            if k not in mapping:
                continue
            path_t, ab = mapping[k]
            arr = jnp.asarray(np.asarray(f.get_tensor(key)).T, jnp.float32)
            node = lora
            for p in path_t[:-1]:
                if isinstance(p, int):
                    node = node[p]
                else:
                    node = node.setdefault(p, {}) if isinstance(node, dict) else node[p]
            leaf = node.setdefault(path_t[-1], {})
            leaf[ab] = arr
    return lora
