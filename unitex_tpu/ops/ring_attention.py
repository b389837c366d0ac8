"""Ring attention: sequence-parallel exact attention over a device mesh.

The reference has no sequence parallelism (SURVEY.md §5) — its 13.8k-token
joint attention fits one GPU.  For higher view counts / resolutions (the
sequence grows with views x (res/16)^2; 12 views at 1024² is ~100k tokens)
this provides the TPU-native scheme: shard the sequence over a mesh axis,
keep Q local, and rotate K/V blocks around the ring with
``jax.lax.ppermute`` while maintaining online-softmax statistics — exact
attention in n_devices steps, each overlapping an ICI transfer with local
compute.  Pure jnp + shard_map; composes with the Pallas flash kernel for
the local block product.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attention(q, k, v, scale):
    """Partial attention stats for one K/V block.

    q [B, Sq, H, D], k/v [B, Sk, H, D] ->
    (unnormalized out [B, Sq, H, D], row max m [B, Sq, H, 1],
     row sum l [B, Sq, H, 1])."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    m = logits.max(axis=-1, keepdims=True)                      # [B,H,Sq,1]
    p = jnp.exp(logits - m)
    l = p.sum(axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    # rearrange stats to [B, Sq, H, 1]
    m = jnp.moveaxis(m, 1, 2)
    l = jnp.moveaxis(l, 1, 2)
    return out.astype(jnp.float32), m, l


def ring_attention_local(q, k, v, axis_name: str, scale: Optional[float] = None):
    """The per-shard body: q/k/v are the LOCAL sequence blocks
    [B, S_local, H, D]; must run inside shard_map over ``axis_name``."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = jax.lax.axis_size(axis_name)

    out0, m0, l0 = _block_attention(q, k, v, scale)

    def body(i, carry):
        out, m, l, kc, vc = carry
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        out_i, m_i, l_i = _block_attention(q, kc, vc, scale)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        out = out * alpha + out_i * beta
        l = l * alpha + l_i * beta
        return out, m_new, l, kc, vc

    out, m, l, _, _ = jax.lax.fori_loop(0, n_dev - 1, body, (out0, m0, l0, k, v))
    return (out / jnp.maximum(l, 1e-20)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Exact attention with q/k/v [B, S, H, D] sequence-sharded over
    ``axis_name``.  S must divide by the axis size."""
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        partial(ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def ulysses_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    attn_fn=None,
):
    """Ulysses (DeepSpeed-style) sequence parallelism: two ``all_to_all``
    reshards instead of a K/V ring.

    The per-shard body for q/k/v [B, S_local, H, D] inside shard_map over
    ``axis_name``: all_to_all gathers the FULL sequence while splitting the
    head axis (-> [B, S, H/n, D]), full attention runs locally — through
    the tuned Pallas flash kernel via ``attn_fn`` — and a second
    all_to_all restores the token sharding.  Exact for any head-sharded
    full attention; H must divide the axis size.  At UniTEX's 13.8k-token
    joint sequence this moves 2·S·H·D/n elements per device per attention
    vs the ring's (n-1)·2·S·H·D/n for K+V — and the local compute is ONE
    flash call instead of n online-softmax block merges, which is why it
    is the default ``sp_mode`` (SURVEY §5: head-sharding is the natural
    fit at this length; the ring remains for sequences whose K/V no longer
    fit a chip, >100k tokens).
    """
    n_dev = jax.lax.axis_size(axis_name)
    H = q.shape[2]
    assert H % n_dev == 0, (
        f"ulysses needs heads {H} divisible by the '{axis_name}' axis "
        f"size {n_dev}")
    if attn_fn is None:
        def attn_fn(q_, k_, v_):
            scale = 1.0 / math.sqrt(q_.shape[-1])
            logits = jnp.einsum("bqhd,bkhd->bhqk", q_, k_)
            w = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v_.dtype), v_)

    def a2a(x, split_axis, concat_axis):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=split_axis, concat_axis=concat_axis,
            tiled=True,
        )

    # [B, S/n, H, D] -> [B, S, H/n, D]: every device sees the full
    # sequence for its head slice
    q_h = a2a(q, 2, 1)
    k_h = a2a(k, 2, 1)
    v_h = a2a(v, 2, 1)
    out = attn_fn(q_h, k_h, v_h)
    # [B, S, H/n, D] -> [B, S/n, H, D]
    return a2a(out, 1, 2)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Exact attention with q/k/v [B, S, H, D] sequence-sharded over
    ``axis_name`` via two all_to_all reshards (see
    :func:`ulysses_attention_local`).  S and H must divide the axis size."""
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        partial(ulysses_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
