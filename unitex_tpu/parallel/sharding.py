"""Tensor-parallel sharding specs for the FLUX MMDiT.

Megatron-style column/row parallelism expressed as NamedSharding
annotations on the param pytree; XLA's GSPMD propagation places the
matching collectives (psum after row-parallel projections) over ICI.
Layout per block:

* attention to_q/k/v, add_*_proj: column-parallel (shard output dim ==
  heads x head_dim over 'model') — each chip computes its head slice;
* to_out / to_add_out / ff.out / proj_out: row-parallel (shard input dim)
  -> all-reduce of the partial sums;
* ff.in / proj_mlp / AdaLN modulation projections: column-parallel (the
  AdaLN linears are ~25% of FLUX's params — they must shard);
* norms, biases of row-parallel layers, embedders: replicated.

Activations stay replicated over 'model' and sharded over 'data' on the
batch axis; the 13.8k-token joint attention thus runs with 3 heads/chip on
a v5e-8 (24 heads / 8) — Ulysses-style head parallelism without explicit
collective code.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _linear_spec(mesh, kind: str, stacked: bool = False) -> Dict[str, NamedSharding]:
    """kind: 'col' shards the output dim, 'row' shards the input dim,
    'rep' replicates.  ``stacked`` prepends the layer axis (block params
    are stacked [L, ...] for the scan-over-layers forward)."""
    lead = (None,) if stacked else ()
    if kind == "col":
        return {
            "kernel": _ns(mesh, *lead, None, "model"),
            "bias": _ns(mesh, *lead, "model"),
            # int8 serving form (ops/quant.py): scale is per-output-channel
            "scale": _ns(mesh, *lead, "model"),
        }
    if kind == "row":
        return {
            "kernel": _ns(mesh, *lead, "model", None),
            "bias": _ns(mesh, *lead, None),
            # per-out-channel scale of a row-parallel kernel: replicated
            "scale": _ns(mesh, *lead, None),
        }
    return {
        "kernel": _ns(mesh, *lead, None, None),
        "bias": _ns(mesh, *lead, None),
        "scale": _ns(mesh, *lead, None),
    }


def _match_linear(p: Dict[str, Any], spec: Dict[str, NamedSharding]):
    """Match a (possibly int8-quantized) linear param dict: ``kernel_int8``
    shards exactly like ``kernel`` (same [.., d_in, d_out] layout)."""
    out = {}
    if "kernel" in p:
        out["kernel"] = spec["kernel"]
    if "kernel_int8" in p:
        out["kernel_int8"] = spec["kernel"]
        out["scale"] = spec["scale"]
    if "kernel_int8_wo" in p:
        out["kernel_int8_wo"] = spec["kernel"]
        out["scale"] = spec["scale"]
    if "bias" in p:
        out["bias"] = spec["bias"]
    return out


def flux_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Build a NamedSharding pytree matching ``init_flux_params`` output."""
    rep = lambda p: _match_linear(p, _linear_spec(mesh, "rep"))
    col = lambda p: _match_linear(p, _linear_spec(mesh, "col", stacked=True))
    row = lambda p: _match_linear(p, _linear_spec(mesh, "row", stacked=True))
    vec = _ns(mesh, None, None)  # stacked [L, head_dim] norm weights

    def attn_spec(p):
        out = {
            "to_q": col(p["to_q"]),
            "to_k": col(p["to_k"]),
            "to_v": col(p["to_v"]),
            "norm_q": vec,
            "norm_k": vec,
        }
        if "add_q_proj" in p:
            out.update(
                {
                    "add_q_proj": col(p["add_q_proj"]),
                    "add_k_proj": col(p["add_k_proj"]),
                    "add_v_proj": col(p["add_v_proj"]),
                    "norm_added_q": vec,
                    "norm_added_k": vec,
                    "to_out": row(p["to_out"]),
                    "to_add_out": row(p["to_add_out"]),
                }
            )
        return out

    def dual_spec(p):
        return {
            "norm1": {"lin": col(p["norm1"]["lin"])},
            "norm1_context": {"lin": col(p["norm1_context"]["lin"])},
            "attn": attn_spec(p["attn"]),
            "ff": {"in": col(p["ff"]["in"]), "out": row(p["ff"]["out"])},
            "ff_context": {
                "in": col(p["ff_context"]["in"]),
                "out": row(p["ff_context"]["out"]),
            },
        }

    def single_spec(p):
        return {
            "norm": {"lin": col(p["norm"]["lin"])},
            "attn": attn_spec(p["attn"]),
            "proj_mlp": col(p["proj_mlp"]),
            "proj_out": row(p["proj_out"]),
        }

    def embed_spec(p):
        return {"in": rep(p["in"]), "out": rep(p["out"])}

    spec: Dict[str, Any] = {
        "x_embedder": rep(params["x_embedder"]),
        "context_embedder": rep(params["context_embedder"]),
        "time_embed": embed_spec(params["time_embed"]),
        "pooled_embed": embed_spec(params["pooled_embed"]),
        "norm_out": {"lin": rep(params["norm_out"]["lin"])},
        "proj_out": rep(params["proj_out"]),
        "dual_blocks": dual_spec(params["dual_blocks"]),
        "single_blocks": single_spec(params["single_blocks"]),
    }
    if "guidance_embed" in params:
        spec["guidance_embed"] = embed_spec(params["guidance_embed"])
    return spec


def sd3_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for ``init_sd3_params`` output (the TSD-SR
    backbone, models/sd3/model.py) — same Megatron column/row layout as
    FLUX: q/k/v + add_*_proj + AdaLN + ff.in column-parallel, to_out /
    to_add_out / ff.out row-parallel, embedders and norms replicated.
    The scanned ``blocks`` are stacked [L, ...]; ``final_block``
    (context_pre_only) is unstacked."""
    rep = lambda p: _match_linear(p, _linear_spec(mesh, "rep"))

    def attn_spec(p, col, row):
        out = {
            k: col(p[k])
            for k in (
                "to_q", "to_k", "to_v",
                "add_q_proj", "add_k_proj", "add_v_proj",
            )
        }
        out["to_out"] = row(p["to_out"])
        if "to_add_out" in p:
            out["to_add_out"] = row(p["to_add_out"])
        return out

    def block_spec(p, stacked: bool):
        col = lambda q: _match_linear(q, _linear_spec(mesh, "col", stacked=stacked))
        row = lambda q: _match_linear(q, _linear_spec(mesh, "row", stacked=stacked))
        out = {
            "norm1": {"lin": col(p["norm1"]["lin"])},
            "norm1_context": {"lin": col(p["norm1_context"]["lin"])},
            "attn": attn_spec(p["attn"], col, row),
            "ff": {"in": col(p["ff"]["in"]), "out": row(p["ff"]["out"])},
        }
        if "ff_context" in p:
            out["ff_context"] = {
                "in": col(p["ff_context"]["in"]),
                "out": row(p["ff_context"]["out"]),
            }
        return out

    def embed_spec(p):
        return {"in": rep(p["in"]), "out": rep(p["out"])}

    return {
        "pos_embed": {
            "proj": rep(params["pos_embed"]["proj"]),
            "pos": _ns(mesh, None, None, None),
        },
        "context_embedder": rep(params["context_embedder"]),
        "time_embed": embed_spec(params["time_embed"]),
        "pooled_embed": embed_spec(params["pooled_embed"]),
        "norm_out": {"lin": rep(params["norm_out"]["lin"])},
        "proj_out": rep(params["proj_out"]),
        "blocks": block_spec(params["blocks"], stacked=True),
        "final_block": block_spec(params["final_block"], stacked=False),
    }


def t5_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for ``init_t5_encoder_params`` output
    (models/text_jax.py) — the T5-XXL prompt encoder (4.7B params, the
    largest single model the training stack loads) in the same Megatron
    layout: q/k/v + wi_* column-parallel over 'model', o/wo row-parallel,
    embedding/rel-bias/norms replicated.  Heads must divide the 'model'
    axis (T5-XXL: 64 heads)."""
    col = lambda p: _match_linear(p, _linear_spec(mesh, "col", stacked=True))
    row = lambda p: _match_linear(p, _linear_spec(mesh, "row", stacked=True))
    vec = _ns(mesh, None, None)  # stacked [L, d_model] RMS-norm weights

    blocks = params["blocks"]
    bspec = {
        "ln_attn": vec,
        "q": col(blocks["q"]),
        "k": col(blocks["k"]),
        "v": col(blocks["v"]),
        "o": row(blocks["o"]),
        "ln_ff": vec,
        "wo": row(blocks["wo"]),
    }
    if "wi_0" in blocks:
        bspec["wi_0"] = col(blocks["wi_0"])
        bspec["wi_1"] = col(blocks["wi_1"])
    else:
        bspec["wi"] = col(blocks["wi"])
    return {
        "embedding": _ns(mesh, None, None),
        "relative_bias": _ns(mesh, None, None),
        "blocks": bspec,
        "final_ln": _ns(mesh, None),
    }


def shard_params(params, shardings):
    """Place a param pytree according to a sharding pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))
