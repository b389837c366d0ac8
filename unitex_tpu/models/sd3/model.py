"""SD3 MMDiT transformer (SD3Transformer2DModel) in functional JAX.

The diffusion backbone of the TSD-SR super-resolution stage
(/root/reference/TSD_SR/sr_pipeline.py:169-277).  Differences from FLUX:
learned cropped 2D position embeddings instead of RoPE, conv patchify,
joint (dual-stream) blocks throughout with the LAST block context_pre_only
(no context output), no guidance embedding.  Blocks are stacked + scanned
like the FLUX model; the final context_pre_only block is unrolled
separately since its params differ structurally.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..flux.layers import (
    Params,
    gelu_tanh,
    layer_norm,
    linear,
    linear_init,
    mlp_embedder,
    mlp_embedder_init,
    sdpa,
    sinusoidal_embedding,
)
from ..flux.model import stack_blocks
from .config import SD3Config


def _attn_init(key, d, with_ctx_out: bool):
    ks = jax.random.split(key, 10)
    p = {
        "to_q": linear_init(ks[0], d, d),
        "to_k": linear_init(ks[1], d, d),
        "to_v": linear_init(ks[2], d, d),
        "add_q_proj": linear_init(ks[3], d, d),
        "add_k_proj": linear_init(ks[4], d, d),
        "add_v_proj": linear_init(ks[5], d, d),
        "to_out": linear_init(ks[6], d, d),
    }
    if with_ctx_out:
        p["to_add_out"] = linear_init(ks[7], d, d)
    return p


def _joint_block_init(key, cfg: SD3Config, context_pre_only: bool):
    ks = jax.random.split(key, 8)
    d = cfg.hidden_size
    p = {
        "norm1": {"lin": linear_init(ks[0], d, 6 * d)},
        "attn": _attn_init(ks[2], d, not context_pre_only),
        "ff": {
            "in": linear_init(ks[3], d, cfg.mlp_dim),
            "out": linear_init(ks[4], cfg.mlp_dim, d),
        },
    }
    if context_pre_only:
        # AdaLayerNormContinuous on the context stream (2 mods)
        p["norm1_context"] = {"lin": linear_init(ks[1], d, 2 * d)}
    else:
        p["norm1_context"] = {"lin": linear_init(ks[1], d, 6 * d)}
        p["ff_context"] = {
            "in": linear_init(ks[5], d, cfg.mlp_dim),
            "out": linear_init(ks[6], cfg.mlp_dim, d),
        }
    return p


def init_sd3_params(key, cfg: SD3Config) -> Params:
    ks = jax.random.split(key, 10 + cfg.num_layers)
    d = cfg.hidden_size
    ps = cfg.patch_size
    params: Params = {
        "pos_embed": {
            "proj": linear_init(ks[0], cfg.in_channels * ps * ps, d),
            "pos": jax.random.normal(
                ks[1], (cfg.pos_embed_max_size, cfg.pos_embed_max_size, d), jnp.float32
            )
            * 0.02,
        },
        "context_embedder": linear_init(ks[2], cfg.joint_attention_dim, d),
        "time_embed": mlp_embedder_init(ks[3], 256, d),
        "pooled_embed": mlp_embedder_init(ks[4], cfg.pooled_projection_dim, d),
        "norm_out": {"lin": linear_init(ks[5], d, 2 * d)},
        "proj_out": linear_init(ks[6], d, ps * ps * cfg.out_channels),
    }
    blocks = [
        _joint_block_init(ks[10 + i], cfg, context_pre_only=False)
        for i in range(cfg.num_layers - 1)
    ]
    params["blocks"] = stack_blocks(blocks)
    params["final_block"] = _joint_block_init(
        ks[10 + cfg.num_layers - 1], cfg, context_pre_only=True
    )
    return params


def _heads(x, h):
    B, S, _ = x.shape
    return x.reshape(B, S, h, -1)


def _attention(cfg, q, k, v):
    """Sequence-parallel attention when ``cfg.seq_axis`` names the mesh
    axis the sequence is sharded over (the block stack then runs inside
    shard_map — sd3_forward_sp): ``cfg.sp_mode`` picks ulysses (head-
    sharded full-seq flash) or ring (K/V rotation); flash/jnp sdpa
    otherwise."""
    if cfg.seq_axis is not None:
        from ...ops.ring_attention import (
            ring_attention_local,
            ulysses_attention_local,
        )

        mode = getattr(cfg, "sp_mode", "auto")
        if mode == "auto":
            n = jax.lax.axis_size(cfg.seq_axis)
            mode = "ulysses" if q.shape[2] % n == 0 else "ring"
        if mode == "ulysses":
            return ulysses_attention_local(q, k, v, cfg.seq_axis, attn_fn=sdpa)
        return ring_attention_local(q, k, v, cfg.seq_axis)
    return sdpa(q, k, v)


def _joint_attention(p, cfg, hidden, context, context_out: bool):
    H = cfg.num_attention_heads
    q = _heads(linear(p["to_q"], hidden), H)
    k = _heads(linear(p["to_k"], hidden), H)
    v = _heads(linear(p["to_v"], hidden), H)
    cq = _heads(linear(p["add_q_proj"], context), H)
    ck = _heads(linear(p["add_k_proj"], context), H)
    cv = _heads(linear(p["add_v_proj"], context), H)
    q = jnp.concatenate([cq, q], axis=1)
    k = jnp.concatenate([ck, k], axis=1)
    v = jnp.concatenate([cv, v], axis=1)
    out = _attention(cfg, q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], -1)
    S_txt = context.shape[1]
    ctx_out, img_out = out[:, :S_txt], out[:, S_txt:]
    img_out = linear(p["to_out"], img_out)
    if context_out:
        return img_out, linear(p["to_add_out"], ctx_out)
    return img_out, None


def _mods(p, temb, n):
    return jnp.split(linear(p["lin"], jax.nn.silu(temb))[:, None, :], n, axis=-1)


def _joint_block(p, cfg, hidden, context, temb, context_pre_only: bool):
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = _mods(p["norm1"], temb, 6)
    h_norm = layer_norm(hidden) * (1 + sc_a) + sh_a
    if context_pre_only:
        # AdaLayerNormContinuous chunks (scale, shift)
        csc, csh = _mods(p["norm1_context"], temb, 2)
        c_norm = layer_norm(context) * (1 + csc) + csh
    else:
        csh_a, csc_a, cg_a, csh_m, csc_m, cg_m = _mods(p["norm1_context"], temb, 6)
        c_norm = layer_norm(context) * (1 + csc_a) + csh_a
    h_attn, c_attn = _joint_attention(
        p["attn"], cfg, h_norm, c_norm, context_out=not context_pre_only
    )
    hidden = hidden + g_a * h_attn
    h_mlp = layer_norm(hidden) * (1 + sc_m) + sh_m
    hidden = hidden + g_m * linear(p["ff"]["out"], gelu_tanh(linear(p["ff"]["in"], h_mlp)))
    if context_pre_only:
        return hidden, None
    context = context + cg_a * c_attn
    c_mlp = layer_norm(context) * (1 + csc_m) + csh_m
    context = context + cg_m * linear(
        p["ff_context"]["out"], gelu_tanh(linear(p["ff_context"]["in"], c_mlp))
    )
    return hidden, context


def patchify(latents: jnp.ndarray, ps: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/ps*W/ps, C*ps*ps] (conv-patchify as a linear
    over flattened patches; channel-major patch order to match torch conv)."""
    B, H, W, C = latents.shape
    x = latents.reshape(B, H // ps, ps, W // ps, ps, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (H // ps) * (W // ps), C * ps * ps)


def unpatchify(tokens: jnp.ndarray, H: int, W: int, ps: int) -> jnp.ndarray:
    B, S, Cp = tokens.shape
    C = Cp // (ps * ps)
    x = tokens.reshape(B, H // ps, W // ps, C, ps, ps)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H, W, C)


def sd3_forward(
    params: Params,
    cfg: SD3Config,
    latents: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    pooled_projections: jnp.ndarray,
) -> jnp.ndarray:
    """latents [B, H, W, C] (VAE latent space), timestep [B] in [0, 1000].
    Returns the velocity prediction [B, H, W, C]."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, H, W, C = latents.shape
    ps = cfg.patch_size
    hp, wp = H // ps, W // ps

    tokens = patchify(latents.astype(dtype), ps)
    hidden = linear(params["pos_embed"]["proj"], tokens)
    # cropped learned position embedding (diffusers PatchEmbed cropped mode)
    pmax = cfg.pos_embed_max_size
    assert hp <= pmax and wp <= pmax, (
        f"latent patch grid {hp}x{wp} exceeds pos_embed_max_size {pmax}; "
        "shrink the latent tile (a negative crop start would silently "
        "wrap the slice)")
    top = (pmax - hp) // 2
    left = (pmax - wp) // 2
    pos = params["pos_embed"]["pos"][top : top + hp, left : left + wp]
    hidden = hidden + pos.reshape(1, hp * wp, -1).astype(dtype)

    context = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))
    temb = mlp_embedder(
        params["time_embed"],
        sinusoidal_embedding(timestep.astype(jnp.float32), 256, scale=1.0).astype(dtype),
    )
    temb = temb + mlp_embedder(params["pooled_embed"], pooled_projections.astype(dtype))

    out = _sd3_token_stage(params, cfg, hidden, context, temb)
    return unpatchify(out.astype(jnp.float32), H, W, ps)


def _sd3_token_stage(params, cfg, hidden, context, temb):
    """The token-wise middle of :func:`sd3_forward` — 23 joint blocks, the
    context-pre-only final block, norm_out, proj_out.  Every op except
    attention is token-local, so this is the exact region
    :func:`sd3_forward_sp` runs sequence-sharded inside shard_map."""

    def body(carry, blk):
        h, c = carry
        h, c = _joint_block(blk, cfg, h, c, temb, context_pre_only=False)
        return (h, c), None

    (hidden, context), _ = jax.lax.scan(body, (hidden, context), params["blocks"])
    hidden, _ = _joint_block(
        params["final_block"], cfg, hidden, context, temb, context_pre_only=True
    )

    sc, sh = _mods(params["norm_out"], temb, 2)
    hidden = layer_norm(hidden) * (1 + sc) + sh
    return linear(params["proj_out"], hidden)


def sd3_forward_sp(
    params: Params,
    cfg: SD3Config,
    latents: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    pooled_projections: jnp.ndarray,
    mesh=None,
    seq_axis: "str | None" = None,
    sp_mode: "str | None" = None,
):
    """:func:`sd3_forward` with the token sequence sharded over
    ``seq_axis`` (ulysses/ring per ``sp_mode``, ops/ring_attention.py —
    overrides ``cfg.sp_mode``).  The patchify /
    embedding prologue and the unpatchify epilogue stay replicated (cheap,
    token-local); the 24-block stack runs inside shard_map with hidden and
    context sequence-sharded.  ``mesh=None`` uses the ambient mesh.  Both
    token counts (H·W/ps² and S_txt) must divide the axis size.  The
    reference has no SP — see models/flux/sp.py for the rationale."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    seq_axis = seq_axis or cfg.seq_axis
    assert seq_axis is not None, "sd3_forward_sp needs a seq axis name"
    cfg_sp = dataclasses.replace(
        cfg, seq_axis=seq_axis,
        sp_mode=sp_mode or getattr(cfg, "sp_mode", "auto"))

    if mesh is None:
        n = jax.sharding.get_abstract_mesh().shape[seq_axis]
    else:
        n = mesh.shape[seq_axis]

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, H, W, C = latents.shape
    ps = cfg.patch_size
    hp, wp = H // ps, W // ps
    S_img, S_txt = hp * wp, encoder_hidden_states.shape[1]
    assert S_img % n == 0 and S_txt % n == 0, (
        f"S_img {S_img} / S_txt {S_txt} must divide the '{seq_axis}' axis "
        f"size {n}")

    tokens = patchify(latents.astype(dtype), ps)
    hidden = linear(params["pos_embed"]["proj"], tokens)
    pmax = cfg.pos_embed_max_size
    assert hp <= pmax and wp <= pmax, (
        f"latent patch grid {hp}x{wp} exceeds pos_embed_max_size {pmax}; "
        "shrink the latent tile (a negative crop start would silently "
        "wrap the slice)")
    top = (pmax - hp) // 2
    left = (pmax - wp) // 2
    pos = params["pos_embed"]["pos"][top : top + hp, left : left + wp]
    hidden = hidden + pos.reshape(1, hp * wp, -1).astype(dtype)
    context = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))
    temb = mlp_embedder(
        params["time_embed"],
        sinusoidal_embedding(timestep.astype(jnp.float32), 256, scale=1.0).astype(dtype),
    )
    temb = temb + mlp_embedder(params["pooled_embed"], pooled_projections.astype(dtype))

    sm = getattr(jax, "shard_map", None)
    if sm is None:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    seq = P(None, seq_axis)
    rep = P()
    kwargs = {} if mesh is None else {"mesh": mesh}
    def local(p, h, c, t):
        out = _sd3_token_stage(p, cfg_sp, h, c, t)
        # gather the sequence shards before returning: the [B, S, Cp] ->
        # [B, hp, ps, wp, ps, C] unpatchify reshape would split a sharded
        # S axis across two output dims, which has no NamedSharding
        # expression.  psum of one-hot-placed shards is the
        # provably-replicated gather (same trick as gpipe_local's output).
        i = jax.lax.axis_index(seq_axis)
        n_sh = jax.lax.axis_size(seq_axis)
        S_loc = out.shape[1]
        full = jnp.zeros((out.shape[0], S_loc * n_sh) + out.shape[2:], out.dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, out, i * S_loc, 1)
        return jax.lax.psum(full, seq_axis)

    fn = sm(
        local,
        in_specs=(jax.tree.map(lambda _: rep, params), seq, seq, rep),
        out_specs=rep,
        **kwargs,
    )
    out = fn(params, hidden, context, temb)
    return unpatchify(out.astype(jnp.float32), H, W, ps)
