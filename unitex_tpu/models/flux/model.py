"""FLUX MMDiT transformer in functional JAX.

Re-implements the FluxTransformer2DModel the reference drives through
diffusers (/root/reference/pipeline.py:96-104; joint attention semantics per
flux_piplines/texturing/attention_processor.py:24-110): 19 dual-stream +
38 single-stream blocks, AdaLN-Zero conditioning from
timestep+guidance+pooled embeddings, 3-axis RoPE over token position ids,
QK RMS-norm, GELU-tanh MLPs.

Params are nested dicts of f32 arrays (cast to the compute dtype at use),
laid out for tensor parallelism: attention/MLP projection kernels are
[d_model, d_out] with d_out shardable over the 'model' mesh axis (see
parallel/sharding.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import FluxConfig
from .layers import (
    Params,
    apply_rope,
    gelu_tanh,
    layer_norm,
    linear,
    linear_init,
    mlp_embedder,
    mlp_embedder_init,
    rms_norm,
    rope_freqs,
    row_linear,
    sdpa,
    sinusoidal_embedding,
)


# ------------------------------------------------------------------ init


def _attn_init(key, dim: int, heads: int, head_dim: int, with_context: bool):
    ks = jax.random.split(key, 12)
    inner = heads * head_dim
    p = {
        "to_q": linear_init(ks[0], dim, inner),
        "to_k": linear_init(ks[1], dim, inner),
        "to_v": linear_init(ks[2], dim, inner),
        "norm_q": jnp.ones((head_dim,), jnp.float32),
        "norm_k": jnp.ones((head_dim,), jnp.float32),
    }
    if with_context:
        p.update(
            {
                "add_q_proj": linear_init(ks[3], dim, inner),
                "add_k_proj": linear_init(ks[4], dim, inner),
                "add_v_proj": linear_init(ks[5], dim, inner),
                "norm_added_q": jnp.ones((head_dim,), jnp.float32),
                "norm_added_k": jnp.ones((head_dim,), jnp.float32),
                "to_out": linear_init(ks[6], inner, dim),
                "to_add_out": linear_init(ks[7], inner, dim),
            }
        )
    return p


def _dual_block_init(key, cfg: FluxConfig):
    ks = jax.random.split(key, 8)
    d = cfg.hidden_size
    return {
        "norm1": {"lin": linear_init(ks[0], d, 6 * d)},
        "norm1_context": {"lin": linear_init(ks[1], d, 6 * d)},
        "attn": _attn_init(ks[2], d, cfg.num_attention_heads, cfg.attention_head_dim, True),
        "ff": {
            "in": linear_init(ks[3], d, cfg.mlp_dim),
            "out": linear_init(ks[4], cfg.mlp_dim, d),
        },
        "ff_context": {
            "in": linear_init(ks[5], d, cfg.mlp_dim),
            "out": linear_init(ks[6], cfg.mlp_dim, d),
        },
    }


def _single_block_init(key, cfg: FluxConfig):
    ks = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "norm": {"lin": linear_init(ks[0], d, 3 * d)},
        "attn": _attn_init(ks[1], d, cfg.num_attention_heads, cfg.attention_head_dim, False),
        "proj_mlp": linear_init(ks[2], d, cfg.mlp_dim),
        "proj_out": linear_init(ks[3], d + cfg.mlp_dim, d),
    }


def init_flux_params(key, cfg: FluxConfig) -> Params:
    """Block params are STACKED along a leading layer axis (dual_blocks is
    one pytree with [num_layers, ...] leaves) so the forward pass scans one
    compiled block body instead of unrolling 19+38 copies — compile time
    and HLO size stay constant in depth."""
    ks = jax.random.split(key, 8 + cfg.num_layers + cfg.num_single_layers)
    d = cfg.hidden_size
    params: Params = {
        "x_embedder": linear_init(ks[0], cfg.in_channels, d),
        "context_embedder": linear_init(ks[1], cfg.joint_attention_dim, d),
        "time_embed": mlp_embedder_init(ks[2], 256, d),
        "pooled_embed": mlp_embedder_init(ks[3], cfg.pooled_projection_dim, d),
        "norm_out": {"lin": linear_init(ks[5], d, 2 * d)},
        "proj_out": linear_init(ks[6], d, cfg.in_channels),
    }
    if cfg.guidance_embeds:
        params["guidance_embed"] = mlp_embedder_init(ks[4], 256, d)
    dual = [_dual_block_init(ks[8 + i], cfg) for i in range(cfg.num_layers)]
    single = [
        _single_block_init(ks[8 + cfg.num_layers + i], cfg)
        for i in range(cfg.num_single_layers)
    ]
    params["dual_blocks"] = stack_blocks(dual)
    params["single_blocks"] = stack_blocks(single)
    return params


def numpy_init(init_fn, *args, seed: int = 0, dtype="float32"):
    """Run any ``init_*_params(key, ...)`` with numpy's PCG instead of
    jax.random (GB-scale init in seconds; counter-based PRNGs cost minutes
    on CPU at 12B scale).  Same tree structure; distribution differs —
    benchmarks / smoke tests, not training reproducibility.

    The whole tree is built on the HOST cpu device: a GB-scale f32 tree
    materialized on the accelerator would coexist with the caller's
    bf16/int8 serving copy and blow HBM (a 2B-param f32+bf16 double
    residency OOMed a 16 GB chip); the caller device_puts the final
    (casted) leaves."""
    import numpy as np

    rng = np.random.default_rng(seed)
    orig_uniform = jax.random.uniform
    orig_normal = jax.random.normal
    orig_split = jax.random.split
    np_dtype = np.dtype(dtype)
    try:
        jax.random.uniform = lambda k, shape, dt, lo, hi: jnp.asarray(
            rng.uniform(lo, hi, shape).astype(np_dtype)
        )
        jax.random.normal = lambda k, shape, dt=None: jnp.asarray(
            rng.standard_normal(shape).astype(np_dtype)
        )
        jax.random.split = lambda k, n=2: [None] * n
        with jax.default_device(jax.devices("cpu")[0]):
            return init_fn(None, *args)
    finally:
        jax.random.uniform = orig_uniform
        jax.random.normal = orig_normal
        jax.random.split = orig_split


def init_flux_params_numpy(cfg: FluxConfig, seed: int = 0, dtype="float32"):
    """See :func:`numpy_init`."""
    return numpy_init(init_flux_params, cfg, seed=seed, dtype=dtype)


def stack_blocks(blocks):
    """List of per-layer param trees -> one tree with stacked [L, ...] leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def unstack_blocks(stacked):
    """Inverse of :func:`stack_blocks`."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


# --------------------------------------------------------------- forward


def _heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    B, S, _ = x.shape
    return x.reshape(B, S, heads, -1)


def _attention(cfg: FluxConfig, q, k, v) -> jnp.ndarray:
    """Attention dispatch on [B, S, H, D]: sequence-parallel when
    ``cfg.seq_axis`` names the mesh axis the sequence is sharded over
    (the forward then runs inside shard_map — see flux_forward_sp):
    ``cfg.sp_mode`` picks ulysses (head-sharded full-seq flash) or ring
    (K/V rotation); flash/jnp sdpa otherwise."""
    if cfg.seq_axis is not None:
        from ...ops.ring_attention import (
            ring_attention_local,
            ulysses_attention_local,
        )

        mode = cfg.sp_mode
        if mode == "auto":
            n = jax.lax.axis_size(cfg.seq_axis)
            mode = "ulysses" if q.shape[2] % n == 0 else "ring"
        if mode == "ulysses":
            return ulysses_attention_local(
                q, k, v, cfg.seq_axis,
                attn_fn=lambda a, b, c: sdpa(a, b, c, qk8=cfg.attn_qk8),
            )
        return ring_attention_local(q, k, v, cfg.seq_axis)
    return sdpa(q, k, v, qk8=cfg.attn_qk8)


def _joint_attention(
    p: Params,
    cfg: FluxConfig,
    hidden: jnp.ndarray,
    context: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_keep_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-stream joint attention: text tokens first in the sequence
    (attention_processor.py:74-80).  ``kv_keep_idx`` [S_kept] subselects the
    joint K/V sequence (queries stay full) — the training-time random token
    dropping of RandomDropFluxAttnProcessor2_0
    (attention_processor.py:114-233)."""
    H = cfg.num_attention_heads
    if "qkv_fused" in p:
        # int8 serving form (quantize.py): one wide matmul per stream —
        # the activation is quantized once instead of once per projection
        qf, kf, vf = jnp.split(linear(p["qkv_fused"], hidden), 3, axis=-1)
        q, k, v = _heads(qf, H), _heads(kf, H), _heads(vf, H)
        cqf, ckf, cvf = jnp.split(linear(p["add_qkv_fused"], context), 3, axis=-1)
        cq, ck, cv = _heads(cqf, H), _heads(ckf, H), _heads(cvf, H)
    else:
        q = _heads(linear(p["to_q"], hidden), H)
        k = _heads(linear(p["to_k"], hidden), H)
        v = _heads(linear(p["to_v"], hidden), H)
        cq = _heads(linear(p["add_q_proj"], context), H)
        ck = _heads(linear(p["add_k_proj"], context), H)
        cv = _heads(linear(p["add_v_proj"], context), H)
    q = rms_norm(q, p["norm_q"])
    k = rms_norm(k, p["norm_k"])
    cq = rms_norm(cq, p["norm_added_q"])
    ck = rms_norm(ck, p["norm_added_k"])
    q = jnp.concatenate([cq, q], axis=1)
    k = jnp.concatenate([ck, k], axis=1)
    v = jnp.concatenate([cv, v], axis=1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if kv_keep_idx is not None:
        k = k[:, kv_keep_idx]
        v = v[:, kv_keep_idx]
    out = _attention(cfg, q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], -1)
    S_txt = context.shape[1]
    ctx_out, img_out = out[:, :S_txt], out[:, S_txt:]
    # row-parallel under shard_map TP (cfg.tp_axis): partial products over
    # the local heads all-reduce here — one of Megatron's two per-layer
    # psums (the other is after the MLP's row projection)
    return (
        row_linear(p["to_out"], img_out, cfg.tp_axis),
        row_linear(p["to_add_out"], ctx_out, cfg.tp_axis),
    )


def _single_attention(
    p: Params,
    cfg: FluxConfig,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_keep_idx: Optional[jnp.ndarray] = None,
    qkv: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    H = cfg.num_attention_heads
    if qkv is not None:  # precomputed by the fused int8 projection
        qf, kf, vf = qkv
    else:
        qf, kf, vf = linear(p["to_q"], x), linear(p["to_k"], x), linear(p["to_v"], x)
    q = rms_norm(_heads(qf, H), p["norm_q"])
    k = rms_norm(_heads(kf, H), p["norm_k"])
    v = _heads(vf, H)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if kv_keep_idx is not None:
        k = k[:, kv_keep_idx]
        v = v[:, kv_keep_idx]
    out = _attention(cfg, q, k, v)
    return out.reshape(out.shape[0], out.shape[1], -1)


def _ada_ln_zero(p, temb, n=6):
    mods = linear(p["lin"], jax.nn.silu(temb))
    return jnp.split(mods[:, None, :], n, axis=-1)


def _dual_block(p, cfg, hidden, context, temb, cos, sin, kv_keep_idx=None):
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = _ada_ln_zero(p["norm1"], temb, 6)
    csh_a, csc_a, cg_a, csh_m, csc_m, cg_m = _ada_ln_zero(p["norm1_context"], temb, 6)
    h_norm = layer_norm(hidden) * (1 + sc_a) + sh_a
    c_norm = layer_norm(context) * (1 + csc_a) + csh_a
    h_attn, c_attn = _joint_attention(
        p["attn"], cfg, h_norm, c_norm, cos, sin, kv_keep_idx
    )
    hidden = hidden + g_a * h_attn
    context = context + cg_a * c_attn
    h_mlp = layer_norm(hidden) * (1 + sc_m) + sh_m
    hidden = hidden + g_m * row_linear(
        p["ff"]["out"], gelu_tanh(linear(p["ff"]["in"], h_mlp)), cfg.tp_axis
    )
    c_mlp = layer_norm(context) * (1 + csc_m) + csh_m
    context = context + cg_m * row_linear(
        p["ff_context"]["out"],
        gelu_tanh(linear(p["ff_context"]["in"], c_mlp)),
        cfg.tp_axis,
    )
    return hidden, context


def _single_block(p, cfg, x, temb, cos, sin, kv_keep_idx=None):
    sh, sc, gate = _ada_ln_zero(p["norm"], temb, 3)
    x_norm = layer_norm(x) * (1 + sc) + sh
    if "qkvm_fused" in p:
        d = cfg.hidden_size
        fused = linear(p["qkvm_fused"], x_norm)
        qkv = (fused[..., :d], fused[..., d : 2 * d], fused[..., 2 * d : 3 * d])
        attn_out = _single_attention(
            p["attn"], cfg, x_norm, cos, sin, kv_keep_idx, qkv=qkv)
        mlp_out = gelu_tanh(fused[..., 3 * d :])
    else:
        attn_out = _single_attention(p["attn"], cfg, x_norm, cos, sin, kv_keep_idx)
        mlp_out = gelu_tanh(linear(p["proj_mlp"], x_norm))
    po = p["proj_out"]
    if cfg.tp_axis is not None and "kernel_attn" in po:
        # shard_map TP: proj_out's input rows interleave [attn ‖ mlp], so
        # a plain leading-axis shard can't split it — the prepare step
        # (prepare_flux_params_tp_pp) pre-splits the kernel into the attn
        # and mlp row blocks, each row-sharded; partials psum, bias adds
        # once after
        part = attn_out @ po["kernel_attn"].astype(x.dtype)
        part = part + mlp_out @ po["kernel_mlp"].astype(x.dtype)
        y = jax.lax.psum(part, cfg.tp_axis)
        if "bias" in po:
            y = y + po["bias"].astype(x.dtype)
        return x + gate * y
    merged = jnp.concatenate([attn_out, mlp_out], axis=-1)
    return x + gate * linear(po, merged)


def flux_forward(
    params: Params,
    cfg: FluxConfig,
    hidden_states: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    pooled_projections: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt_ids: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    kv_keep_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Velocity prediction for the packed token sequence.

    hidden_states [B, S_img, C_in], encoder_hidden_states [B, S_txt, D_t5],
    timestep [B] (already divided by 1000), pooled [B, D_clip],
    img_ids [S_img, 3], txt_ids [S_txt, 3], guidance [B] (raw cfg scale).
    Returns [B, S_img, C_in].
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    hidden = linear(params["x_embedder"], hidden_states.astype(dtype))
    context = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))

    temb = mlp_embedder(params["time_embed"], sinusoidal_embedding(timestep).astype(dtype))
    if cfg.guidance_embeds and guidance is not None:
        temb = temb + mlp_embedder(
            params["guidance_embed"], sinusoidal_embedding(guidance).astype(dtype)
        )
    temb = temb + mlp_embedder(params["pooled_embed"], pooled_projections.astype(dtype))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_freqs(ids, cfg.axes_dims_rope, cfg.rope_theta)

    def dual_body(carry, blk):
        h, c = carry
        h, c = _dual_block(blk, cfg, h, c, temb, cos, sin, kv_keep_idx)
        return (h, c), None

    def single_body(x, blk):
        return _single_block(blk, cfg, x, temb, cos, sin, kv_keep_idx), None

    if cfg.remat:
        dual_body = jax.checkpoint(dual_body)
        single_body = jax.checkpoint(single_body)

    (hidden, context), _ = jax.lax.scan(
        dual_body, (hidden, context), params["dual_blocks"]
    )

    x = jnp.concatenate([context, hidden], axis=1)
    x, _ = jax.lax.scan(single_body, x, params["single_blocks"])
    x = x[:, context.shape[1]:]

    # AdaLayerNormContinuous chunks (scale, shift) in that order
    sc, sh = _ada_ln_zero(params["norm_out"], temb, 2)
    x = layer_norm(x) * (1 + sc) + sh
    return linear(params["proj_out"], x).astype(jnp.float32)
