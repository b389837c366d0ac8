"""int8 quantized serving (W8A8, dynamic per-token activations).

The reference ships a quantized serving mode for small-VRAM GPUs (NF4 via
bitsandbytes, /root/reference/pipeline.py:87-95) — a memory optimization.
On TPU v5e the MXU's int8 path has 2x the bf16 throughput (measured:
392 TOP/s vs 194 TF/s on this chip), so quantization here is a *compute*
optimization for the FLUX/SD3 projection matmuls:

- weights: symmetric per-output-channel int8 (static, offline),
- activations: symmetric per-token (per-row) int8, quantized dynamically
  in-graph — scales ride along, everything fuses into the surrounding
  elementwise work,
- accumulation in int32 on the MXU (``preferred_element_type``), dequant
  by the outer product of the two scales.

Norms, AdaLN modulations, embedders and attention softmax stay bf16/f32;
only the big [d_model, d_out] projections inside the scanned blocks are
quantized (they carry ~99% of the FLOPs at S=13.8k).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., d_in, d_out] f32/bf16 -> (int8 kernel, f32 scale [..., d_out]).

    Symmetric per-output-channel: scale = max|w| over d_in / 127.  Leading
    axes (the stacked-blocks layer axis) quantize independently."""
    w = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_weight_only_matmul(
    x: jnp.ndarray, kernel_int8: jnp.ndarray, kernel_scale: jnp.ndarray
) -> jnp.ndarray:
    """x [..., d_in] @ dequantized int8 kernel — bf16 MXU matmul, int8
    STORAGE.  For the projections where W8A8 is counterproductive (q/k
    feeding the qk-norm reduction, AdaLN modulations): halves their HBM
    footprint without touching the activation path.  With this applied to
    the whole transformer the full 12B FLUX fits a single 16 GB v5e chip
    (the TPU analog of the reference's NF4 small-VRAM mode,
    pipeline.py:87-95)."""
    w = kernel_int8.astype(x.dtype) * kernel_scale.astype(x.dtype)[..., None, :]
    return x @ w


def int8_matmul(
    x: jnp.ndarray, kernel_int8: jnp.ndarray, kernel_scale: jnp.ndarray
) -> jnp.ndarray:
    """x [..., d_in] @ int8 kernel [d_in, d_out] with dynamic per-row
    activation quantization; returns x.dtype [..., d_out]."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_int8,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s_x * kernel_scale).astype(x.dtype)


# q/k projections feed the per-head RMS-norm, a reduction the dequant
# epilogue cannot fuse into — quantizing them *costs* time (measured on
# v5e: attention sub-graph 24.9 -> 27.7 ms with int8 q/k; the int32+f32
# intermediates materialize).  v/out/mlp dequants feed elementwise
# consumers and fuse cleanly.
_SKIP_KEYS = frozenset({"to_q", "to_k", "add_q_proj", "add_k_proj"})


def _should_quantize(path: Tuple[Any, ...]) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    # final_block: SD3's last joint block lives outside the stacked scan
    if not any(
        k in ("dual_blocks", "single_blocks", "blocks", "final_block")
        for k in keys
    ):
        return False
    if any(k in _SKIP_KEYS for k in keys):
        return False
    # AdaLN modulation projections live under norm* subtrees; tiny matmuls
    # (S=1) and quality-sensitive — keep bf16
    return not any(isinstance(k, str) and k.startswith("norm") for k in keys)


def _in_blocks(path: Tuple[Any, ...]) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return any(
        k in ("dual_blocks", "single_blocks", "blocks", "final_block")
        for k in keys
    )


def quantize_linears(
    params: Dict[str, Any],
    predicate: Optional[Callable[[Tuple[Any, ...]], bool]] = None,
    weight_only_predicate: Optional[Callable[[Tuple[Any, ...]], bool]] = None,
) -> Dict[str, Any]:
    """Replace ``{"kernel": w}`` dicts with ``{"kernel_int8", "scale"}``
    wherever ``predicate(path)`` holds (default: projection matmuls inside
    the scanned transformer blocks), and with weight-only int8
    (``{"kernel_int8_wo", "scale"}``) where ``weight_only_predicate``
    holds.  ``layers.linear`` dispatches on the key set, so forwards are
    unchanged.  Pass ``weight_only_predicate=_in_blocks`` (or a custom
    one) for the max-memory serving mode: the W8A8 set keeps the 2x-MXU
    path, everything else in the blocks is storage-compressed."""
    predicate = predicate or _should_quantize

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and predicate(path):
                q, s = quantize_kernel(node["kernel"])
                new = {"kernel_int8": q, "scale": s}
                if "bias" in node:
                    new["bias"] = node["bias"]
                return new
            if (
                "kernel" in node
                and weight_only_predicate is not None
                and weight_only_predicate(path)
                and getattr(node["kernel"], "ndim", 0) >= 2
            ):
                q, s = quantize_kernel(node["kernel"])
                new = {"kernel_int8_wo": q, "scale": s}
                if "bias" in node:
                    new["bias"] = node["bias"]
                return new
            return {
                k: walk(v, path + (jax.tree_util.DictKey(k),))
                for k, v in node.items()
            }
        return node

    return walk(params, ())


def pack_int4_kernel(
    kernel: jnp.ndarray,
    scale_in: Optional[jnp.ndarray] = None,
    group: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., d_in, d_out] kernel -> (uint8 nibble-packed [..., d_in//2, d_out],
    bf16 group scales [..., d_in//group, d_out]).

    Symmetric per-(input-group, output-channel) int4: scale = max|w| over
    each ``group`` input rows / 7.  Values pack two-per-byte in offset-
    binary (q+8: even row in the low nibble).  ``scale_in`` dequantizes an
    already-int8 kernel first (packing the serving params cache without
    the bf16 originals; the int8->int4 re-grid error is ~0 next to int4's
    own).  This is a TRANSFER format, not a serving format: it exists to
    halve the bytes crossing the ~40 MB/s host->device staging tunnel
    (models/sd3/sr_pipeline.staged), and unpacks device-side back to the
    standard per-channel {"kernel_int8", "scale"} serving nodes — the
    TPU analog of the reference's 4-bit NF4 small-VRAM branch
    (pipeline.py:87-95), applied to transfer bandwidth instead of VRAM."""
    # pure numpy: packing runs on the HOST (under the axon platform jnp
    # ops would dispatch to the TPU — the very transfer this pack avoids)
    w = np.asarray(kernel, np.float32)
    if scale_in is not None:
        w = w * np.asarray(scale_in, np.float32)[..., None, :]
    *lead, d_in, d_out = w.shape
    assert d_in % group == 0 and group % 2 == 0, (d_in, group)
    g = w.reshape(*lead, d_in // group, group, d_out)
    amax = np.max(np.abs(g), axis=-2)
    scale = np.maximum(amax, 1e-8) / 7.0
    q = np.clip(np.round(g / scale[..., None, :]), -7, 7)
    u = (q + 8.0).astype(np.uint8).reshape(*lead, d_in, d_out)
    packed = u[..., 0::2, :] | (u[..., 1::2, :] << 4)
    import ml_dtypes  # numpy-native bf16 (no device dispatch)

    return packed, scale.astype(ml_dtypes.bfloat16)


def unpack_int4_kernel(
    packed: jnp.ndarray, scale4: jnp.ndarray, group: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`pack_int4_kernel`, producing the standard
    per-output-channel serving pair (int8 kernel, f32 scale).  Jittable —
    runs ON DEVICE right after staging (~bitwise ops + one rescale, trivial
    next to the transfer it halves)."""
    *lead, d_half, d_out = packed.shape
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    q = jnp.stack([lo, hi], axis=-2)             # [..., d_half, 2, d_out]
    q = q.reshape(*lead, d_half * 2, d_out)
    s4 = scale4.astype(jnp.float32)
    # per-channel int8 grid that loses nothing: the widest group scale
    # maps int4's ±7 to at most ±127*scale8
    scale8 = jnp.max(s4, axis=-2) * (7.0 / 127.0)
    ratio = s4 / jnp.maximum(scale8[..., None, :], 1e-20)
    ratio = jnp.repeat(ratio, group, axis=-2)
    q8 = jnp.round(q.astype(jnp.float32) * ratio)
    return jnp.clip(q8, -127, 127).astype(jnp.int8), scale8


def pack_int4_tree(
    params: Dict[str, Any], group: int = 64, pack_bf16_wo: bool = False
) -> Dict[str, Any]:
    """Nibble-pack every W8A8 node ({"kernel_int8", "scale"}) of a serving
    tree for staging transfer; other nodes pass through.  Unpack with
    :func:`unpack_int4_tree` after the device_put.

    ``pack_bf16_wo``: ALSO pack plain float ``{"kernel": w}`` linear nodes
    (2D/3D only — conv kernels are consumed via ``node["kernel"]``
    directly and must pass through) as weight-only int4, unpacking to the
    ``{"kernel_int8_wo", "scale"}`` form ``layers.linear`` already
    dispatches.  Measured motivation (INT4_STAGING_r05): the SD3 serving
    tree's W8A8 kernels are only ~1 GB of its 3.06 GB — the bf16 q/k +
    AdaLN + embedder kernels dominate the staging transfer, so packing
    only the int8 nodes saves 17% where full packing saves ~2.4x."""

    def walk(node):
        if isinstance(node, dict):
            for src, dst in (("kernel_int8", "kernel_int4"),
                             ("kernel_int8_wo", "kernel_int4_wo")):
                if src in node and node[src].shape[-2] % group == 0:
                    p, s4 = pack_int4_kernel(
                        node[src], node["scale"], group=group
                    )
                    new = {dst: np.asarray(p), "scale4": np.asarray(s4)}
                    if "bias" in node:
                        new["bias"] = node["bias"]
                    return new
            if (
                pack_bf16_wo
                and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) in (2, 3)
                and node["kernel"].shape[-2] % group == 0
            ):
                p, s4 = pack_int4_kernel(node["kernel"], group=group)
                new = {"kernel_int4_wo": np.asarray(p),
                       "scale4": np.asarray(s4)}
                for extra in ("bias",):
                    if extra in node:
                        new[extra] = node[extra]
                # any other sibling leaves (norm scales etc.) pass through
                for k, v in node.items():
                    if k not in ("kernel", "bias"):
                        new[k] = walk(v)
                return new
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def unpack_int4_tree(params: Dict[str, Any], group: int = 64) -> Dict[str, Any]:
    """Device-side inverse of :func:`pack_int4_tree` — jit the whole-tree
    call once per process; shapes are static."""

    def walk(node):
        if isinstance(node, dict):
            for src, dst in (("kernel_int4", "kernel_int8"),
                             ("kernel_int4_wo", "kernel_int8_wo")):
                if src in node:
                    q8, s8 = unpack_int4_kernel(
                        node[src], node["scale4"], group=group
                    )
                    new = {dst: q8, "scale": s8}
                    if "bias" in node:
                        new["bias"] = node["bias"]
                    return new
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def count_quantized(params: Dict[str, Any]) -> Tuple[int, int]:
    """(n int8 elements, n float kernel elements) — for memory reporting."""
    n_q = n_f = 0
    for leaf in jax.tree.leaves(params):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.int8:
            n_q += leaf.size
        elif hasattr(leaf, "ndim") and leaf.ndim >= 2:
            n_f += leaf.size
    return n_q, n_f
