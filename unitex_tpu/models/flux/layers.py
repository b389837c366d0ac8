"""Functional building blocks shared by the FLUX and SD3 MMDiTs.

Plain param-pytree style (nested dicts of jnp arrays) rather than a module
framework: explicit params make tensor-parallel NamedSharding trivial to
attach and LoRA deltas trivial to merge.  Numerics follow the diffusers
implementations the reference runs (attention_processor.py:24-110).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


# ------------------------------------------------------------ primitives


def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(d_in)
    p = {"kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_int8" in p:
        from ...ops.quant import int8_matmul

        y = int8_matmul(x, p["kernel_int8"], p["scale"])
    elif "kernel_int8_wo" in p:
        from ...ops.quant import int8_weight_only_matmul

        y = int8_weight_only_matmul(x, p["kernel_int8_wo"], p["scale"])
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "lora_a" in p:
        # runtime-applied LoRA (lora.attach_lora): exact low-rank delta on
        # top of the (possibly int8) base kernel
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm without learnable affine (elementwise_affine=False), the
    form every AdaLN block uses.  Statistics in f32 for bf16 stability."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def row_linear(p: Params, x: jnp.ndarray, tp_axis: "str | None"):
    """Megatron row-parallel linear for shard_map bodies: the kernel's
    INPUT dim is sharded over ``tp_axis`` (x carries the matching local
    slice), partial products all-reduce, bias (replicated) adds once after
    the psum.  ``tp_axis=None`` degrades to :func:`linear`."""
    if tp_axis is None:
        return linear(p, x)
    y = x @ p["kernel"].astype(x.dtype)
    if "lora_a" in p:
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    y = jax.lax.psum(y, tp_axis)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


# ------------------------------------------------------ time embeddings


def sinusoidal_embedding(
    t: jnp.ndarray, dim: int = 256, max_period: float = 10000.0, scale: float = 1000.0
) -> jnp.ndarray:
    """diffusers ``get_timestep_embedding`` with flip_sin_to_cos=True,
    downscale_freq_shift=0: emb = [cos | sin] of t*scale across dim/2 freqs."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * scale * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_embedder_init(key, d_in: int, d_hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in": linear_init(k1, d_in, d_hidden),
        "out": linear_init(k2, d_hidden, d_hidden),
    }


def mlp_embedder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["out"], jax.nn.silu(linear(p["in"], x)))


# ---------------------------------------------------------------- RoPE


def rope_freqs(
    ids: jnp.ndarray, axes_dims: Tuple[int, ...], theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-axis rotary embeddings from position ids.

    ids [S, A] -> (cos [S, D/2], sin [S, D/2]) where D = sum(axes_dims);
    matches diffusers ``FluxPosEmbed``/``get_1d_rotary_pos_embed`` with
    interleaved real/imag pairs.
    """
    cos_parts, sin_parts = [], []
    for a, d in enumerate(axes_dims):
        pos = ids[..., a].astype(jnp.float32)
        freqs = 1.0 / (
            theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        )                                                   # [d/2]
        angles = pos[..., None] * freqs                     # [S, d/2]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs: x [..., S, H, D], cos/sin [S, D/2] (interleaved pairs,
    diffusers apply_rotary_emb use_real_unbind_dim=-1)."""
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x_re, x_im = x_pairs[..., 0], x_pairs[..., 1]
    c = cos[..., None, :] if x.ndim == 4 else cos
    s = sin[..., None, :] if x.ndim == 4 else sin
    # broadcast cos/sin [S, D/2] over head axis: x is [..., S, H, D/2]
    while c.ndim < x_re.ndim:
        c = c[None]
        s = s[None]
    out_re = x_re * c - x_im * s
    out_im = x_re * s + x_im * c
    out = jnp.stack([out_re, out_im], axis=-1).reshape(xf.shape)
    return out.astype(x.dtype)


# ----------------------------------------------------------- attention


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    qk8: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, S, H, D] tensors: Pallas
    flash attention on TPU (O(S·D) memory for the 13.8k-token joint
    sequence), jnp reference on CPU.  ``qk8`` selects the serving-mode
    kernel with int8 QK^T (forward-only)."""
    from ...ops.attention import attention

    if mask is not None:
        return jax.nn.dot_product_attention(q, k, v, mask=mask)
    return attention(q, k, v, qk8=qk8)
