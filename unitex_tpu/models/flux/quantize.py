"""FLUX int8 serving transform (W8A8 on the MXU's 2x int8 path).

``quantize_flux_params`` converts a (LoRA-merged) FLUX param tree into the
int8 serving form via ops/quant.quantize_linears: v/out/mlp projections
inside the scanned blocks become int8 (their dequant epilogues fuse into
elementwise consumers); q/k projections, norms, AdaLN and embedders stay
bf16 (see ops/quant._SKIP_KEYS for the measured reason).

``fuse_flux_projections`` additionally concatenates qkv (dual) or
qkv+mlp-in (single) kernels into one wide matmul — numerically exact, but
measured slower on v5e (worse MXU tiling, and XLA already CSEs the shared
activation quantization), so it is off by default.

The forward (model.py) dispatches on the param keys, so the same
flux_forward serves bf16, int8, and fused-int8 trees.

Measured on v5e (13.8k-token step, depth-reduced model, ms/step):
bf16 121.3 -> int8-all 111.9 -> int8-selective 109.5 (the shipped mode);
weights drop from 2 bytes to ~1 byte/param on the quantized projections.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ...ops.quant import quantize_linears


def _fuse(*linears: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Concat [.., d_in, d_out_i] linear params along the output axis."""
    out = {"kernel": jnp.concatenate([l["kernel"] for l in linears], axis=-1)}
    if all("bias" in l for l in linears):
        out["bias"] = jnp.concatenate([l["bias"] for l in linears], axis=-1)
    return out


def fuse_flux_projections(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new tree with qkv (dual) / qkv+mlp (single) kernels fused.
    Works on stacked [L, ...] block leaves."""
    params = dict(params)

    dual = dict(params["dual_blocks"])
    attn = dict(dual["attn"])
    attn["qkv_fused"] = _fuse(attn.pop("to_q"), attn.pop("to_k"), attn.pop("to_v"))
    attn["add_qkv_fused"] = _fuse(
        attn.pop("add_q_proj"), attn.pop("add_k_proj"), attn.pop("add_v_proj"))
    dual["attn"] = attn
    params["dual_blocks"] = dual

    single = dict(params["single_blocks"])
    sattn = dict(single["attn"])
    single["qkvm_fused"] = _fuse(
        sattn.pop("to_q"), sattn.pop("to_k"), sattn.pop("to_v"),
        single.pop("proj_mlp"))
    single["attn"] = sattn
    params["single_blocks"] = single
    return params


def quantize_flux_params(
    params: Dict[str, Any], fuse: bool = False, weight_only_rest: bool = False
) -> Dict[str, Any]:
    """LoRA-merged FLUX params -> int8 serving params.

    fuse=False by default: measured on v5e, the fused [d, 21504] matmul
    tiles *worse* than separate dots (296 vs 362 TOP/s) and XLA already
    CSEs the shared activation quantization, so fusion loses ~7 ms/step.
    The fused path stays available (and numerically identical) for
    hardware where wide tiles win.

    weight_only_rest=True is the max-memory mode: kernels that stay off
    the W8A8 path (q/k, AdaLN modulations) are stored int8 and dequantized
    to bf16 at the matmul — the full 12B transformer drops to ~1 byte/param
    (~12 GB) and fits a single 16 GB v5e chip, the TPU analog of the
    reference's NF4 small-VRAM branch (pipeline.py:87-95).  Measured on
    v5e: zero step-time cost vs W8A8-only (XLA fuses the dequant into the
    dot's operand read), and the FULL 12B model ran single-chip at
    0.502 steps/s — within 1% of the depth-reduced bench's extrapolation
    (0.506), validating bench.py's parameter-ratio scaling."""
    if fuse:
        params = fuse_flux_projections(params)
    from ...ops.quant import _in_blocks

    return quantize_linears(
        params,
        weight_only_predicate=_in_blocks if weight_only_rest else None,
    )
