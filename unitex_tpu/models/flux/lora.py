"""LoRA adapters for the FLUX transformer.

Covers the capability of the reference's PEFT setup
(/root/reference/flux_piplines/texturing/trainer.py:276-318): low-rank
deltas on attention q/k/v/out (+ add_* context projections) and both MLPs;
and of the inference-time dual-adapter loading with weight vectors
[1,0]/[0,1] (/root/reference/pipeline.py:96-120).

Functional and layer-stacked: block kernels are [L, d_in, d_out], so a LoRA
leaf is {"a": [L, d_in, r], "b": [L, r, d_out]} and ``merge_lora`` folds
``scale · a @ b`` in with one batched matmul per target — O(L·r·d²),
negligible next to a denoise step.  Multiple adapters compose by summed
merge (the set_adapters weights semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

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


def _ensure_set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def init_lora_params(
    key: jax.Array,
    params: Dict[str, Any],
    rank: int = 16,
    include_single: bool = True,
) -> Dict[str, Any]:
    """Zero-effect LoRA tree (a ~ N(0, 1/r), b = 0 — PEFT default)."""
    keys = iter(jax.random.split(key, 256))

    def make(kernel):
        L, d_in, d_out = kernel.shape
        return {
            "a": jax.random.normal(next(keys), (L, d_in, rank), jnp.float32)
            / np.sqrt(rank),
            "b": jnp.zeros((L, rank, d_out), jnp.float32),
        }

    def kernel_of(node):
        # only the SHAPE is read — a quantized serving tree (kernel_int8 /
        # kernel_int8_wo + scale, same [L, d_in, d_out] kernel layout)
        # works too, so LoRA init composes with a params_cache'd tree
        for k in ("kernel", "kernel_int8", "kernel_int8_wo"):
            if k in node:
                return node[k]
        raise KeyError(f"no kernel leaf among {sorted(node)}")

    lora: Dict[str, Any] = {"dual_blocks": {}, "single_blocks": {}}
    for path in DUAL_TARGETS:
        _ensure_set(lora["dual_blocks"], path,
                    make(kernel_of(_get(params["dual_blocks"], path))))
    if include_single:
        for path in SINGLE_TARGETS:
            _ensure_set(lora["single_blocks"], path,
                        make(kernel_of(_get(params["single_blocks"], path))))
    return lora


def merge_lora(
    params: Dict[str, Any],
    loras: Iterable[Tuple[Dict[str, Any], float]],
) -> Dict[str, Any]:
    """Return params with each (lora, weight) folded into the kernels."""

    def walk(base, delta, scale):
        out = {}
        for k, v in base.items():
            if isinstance(v, dict):
                if k in delta and "a" in delta[k] and "b" in delta[k]:
                    d = delta[k]
                    out[k] = dict(v)
                    out[k]["kernel"] = v["kernel"] + scale * jnp.matmul(
                        d["a"], d["b"]
                    ).astype(v["kernel"].dtype)
                elif k in delta:
                    out[k] = walk(v, delta[k], scale)
                else:
                    out[k] = v
            else:
                out[k] = v
        return out

    merged = params
    for lora, weight in loras:
        if lora is None or weight == 0.0:
            continue
        merged = walk(merged, lora, weight)
    return merged


def attach_lora(
    params: Dict[str, Any],
    loras: Iterable[Tuple[Dict[str, Any], float]],
) -> Dict[str, Any]:
    """Runtime-applied (UNMERGED) LoRA: attach ``lora_a``/``lora_b`` next to
    each target so ``layers.linear`` adds ``(x @ a) @ b`` at call time.

    This is how adapters compose with int8 serving: the quantized base
    kernels stay untouched (merging would need a 12 GB dequant->requant
    round-trip, impossible in single-chip HBM) while the bf16 low-rank
    delta rides on top — exact LoRA math at <0.5% of the matmul FLOPs.
    Multiple adapters concatenate along the rank axis with their weights
    folded into ``a`` (same summed-merge semantics as ``merge_lora``)."""
    live = [(l, w) for l, w in loras if l is not None and w != 0.0]
    if not live:
        return params

    def walk(base, deltas):
        out = {}
        for k, v in base.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            pairs = [(d[k], w) for d, w in deltas if k in d]
            if pairs and all("a" in d and "b" in d for d, _ in pairs):
                out[k] = dict(v)
                new_a = [d["a"] * w for d, w in pairs]
                new_b = [d["b"] for d, _ in pairs]
                if "lora_a" in v:
                    # re-attaching composes (like repeated merge_lora):
                    # keep the already-attached delta in the concat
                    new_a.insert(0, v["lora_a"])
                    new_b.insert(0, v["lora_b"])
                out[k]["lora_a"] = jnp.concatenate(new_a, axis=-1)
                out[k]["lora_b"] = jnp.concatenate(new_b, axis=-2)
            elif pairs:
                out[k] = walk(v, pairs)
            else:
                out[k] = v
        return out

    return walk(params, live)


# ----------------------------------------------------- PEFT safetensors IO


_HF_DUAL = {
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
_HF_SINGLE = {
    ("attn", "to_q"): "attn.to_q",
    ("attn", "to_k"): "attn.to_k",
    ("attn", "to_v"): "attn.to_v",
    ("proj_mlp",): "proj_mlp",
    ("proj_out",): "proj_out",
}


def save_lora_safetensors(path: str, lora: Dict[str, Any]) -> None:
    """Write the stacked LoRA tree as a PEFT/diffusers-keyed safetensors
    file (the reference's ``pytorch_lora_weights.safetensors``,
    trainer.py:480-490) — torch layout: lora_A [r, d_in], lora_B [d_out, r]."""
    from safetensors.numpy import save_file

    tensors: Dict[str, np.ndarray] = {}

    def emit(block_kind, hf_map, tree):
        for path_t, hf in hf_map.items():
            node = tree
            for kpart in path_t:
                if kpart not in node:
                    node = None
                    break
                node = node[kpart]
            if node is None or "a" not in node:
                continue
            a = np.asarray(node["a"])  # [L, d_in, r]
            b = np.asarray(node["b"])  # [L, r, d_out]
            for i in range(a.shape[0]):
                prefix = f"transformer.{block_kind}.{i}.{hf}"
                tensors[f"{prefix}.lora_A.weight"] = a[i].T.copy()
                tensors[f"{prefix}.lora_B.weight"] = b[i].T.copy()

    emit("transformer_blocks", _HF_DUAL, lora.get("dual_blocks", {}))
    emit("single_transformer_blocks", _HF_SINGLE, lora.get("single_blocks", {}))
    save_file(tensors, path)


def load_lora_safetensors(
    path: str, n_dual: int = 19, n_single: int = 38
) -> Dict[str, Any]:
    """Load a PEFT/diffusers LoRA safetensors file into the stacked tree.
    PEFT stores lora_A as [r, d_in] and lora_B as [d_out, r] (torch
    out-first); we transpose and stack over layers.  Missing layers get
    zeros (no-op)."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            k = key
            if k.startswith("base_model.model."):
                k = "transformer." + k[len("base_model.model."):]
            tensors[k] = f.get_tensor(key)

    def collect(n_layers, hf_map, block_kind):
        out: Dict[str, Any] = {}
        for path_t, hf in hf_map.items():
            a_list, b_list = [], []
            rank = None
            for i in range(n_layers):
                prefix = f"transformer.{block_kind}.{i}.{hf}"
                a = tensors.get(f"{prefix}.lora_A.weight")
                b = tensors.get(f"{prefix}.lora_B.weight")
                if a is not None and rank is None:
                    rank = a.shape[0]
                a_list.append(a)
                b_list.append(b)
            if rank is None:
                continue  # this target not present in the file
            d_in = next(a for a in a_list if a is not None).shape[1]
            d_out = next(b for b in b_list if b is not None).shape[0]
            a_stack = np.stack(
                [
                    a.T if a is not None else np.zeros((d_in, rank), np.float32)
                    for a in a_list
                ]
            )
            b_stack = np.stack(
                [
                    b.T if b is not None else np.zeros((rank, d_out), np.float32)
                    for b in b_list
                ]
            )
            _ensure_set(
                out, path_t,
                {"a": jnp.asarray(a_stack, jnp.float32),
                 "b": jnp.asarray(b_stack, jnp.float32)},
            )
        return out

    return {
        "dual_blocks": collect(n_dual, _HF_DUAL, "transformer_blocks"),
        "single_blocks": collect(n_single, _HF_SINGLE, "single_transformer_blocks"),
    }
