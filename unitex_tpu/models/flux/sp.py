"""Sequence-parallel FLUX forward: ring attention over a mesh axis.

The reference has no sequence parallelism (SURVEY.md §5) — its 13.8k-token
joint attention fits one GPU.  This is the TPU framework's long-context
answer for >6-view / higher-res grids (12 views at 1024² is ~100k joint
tokens): shard the token sequence over a mesh axis and run the UNCHANGED
:func:`~unitex_tpu.models.flux.model.flux_forward` inside shard_map —
every non-attention op (linears, norms, RoPE, AdaLN) is token-local, and
attention rotates K/V blocks around the ring with ``lax.ppermute``
(:mod:`unitex_tpu.ops.ring_attention`), exact in ``n_devices`` steps each
overlapping an ICI hop with local compute.

Layout note: text and image shards are concatenated locally, so the global
token order is block-interleaved ``[txt_0‖img_0‖txt_1‖img_1‖…]`` — a
permutation of the replicated order.  Full (non-causal) attention is
permutation-equivariant and every token carries its own RoPE position id,
so the result is exact; the local ``[:, :S_txt_local]`` splits in the model
unpermute the output shard-by-shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ...parallel.pipeline import _shard_map
from .config import FluxConfig
from .model import Params, flux_forward


def flux_forward_sp(
    params: Params,
    cfg: FluxConfig,
    hidden_states: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    pooled_projections: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt_ids: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    mesh: Optional[Mesh] = None,
    seq_axis: Optional[str] = None,
    sp_mode: Optional[str] = None,
    tp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """:func:`flux_forward` with the sequence sharded over ``seq_axis``
    (default ``cfg.seq_axis``).  Same numerics; S_img and S_txt must both
    divide the axis size.  ``mesh=None`` uses the ambient mesh
    (``jax.set_mesh``).  ``sp_mode`` overrides ``cfg.sp_mode``
    (ulysses/ring/auto — ops/ring_attention.py).  Token dropping
    (``kv_keep_idx``) indexes the global sequence and is not supported
    under SP.

    ``tp_axis`` composes SP with Megatron tensor parallelism on a 2-axis
    mesh (seq x model): the shard_map goes MANUAL over ``seq_axis`` only
    (``axis_names={seq_axis}``), so params keep their
    :func:`~unitex_tpu.parallel.sharding.flux_param_shardings`
    NamedShardings over ``tp_axis`` and the XLA SPMD partitioner inserts
    the column/row-parallel collectives inside each sequence shard — the
    >100k-token layout (12 views @ 1024²) where neither the sequence nor
    the 12B weights fit one chip.  Pass params already device_put with
    their TP shardings.
    """
    seq_axis = seq_axis or cfg.seq_axis
    assert seq_axis is not None, "flux_forward_sp needs a seq axis name"
    cfg_sp = dataclasses.replace(
        cfg, seq_axis=seq_axis, sp_mode=sp_mode or cfg.sp_mode)

    if mesh is None:
        n = jax.sharding.get_abstract_mesh().shape[seq_axis]
    else:
        n = mesh.shape[seq_axis]
    S_img, S_txt = hidden_states.shape[1], encoder_hidden_states.shape[1]
    assert S_img % n == 0 and S_txt % n == 0, (
        f"S_img {S_img} / S_txt {S_txt} must divide the '{seq_axis}' axis "
        f"size {n}")

    sm = _shard_map()
    seq = P(None, seq_axis)
    rep = P()
    param_specs = jax.tree.map(lambda _: rep, params)

    def local(p, h, c, t, pool, iid, tid, g):
        return flux_forward(p, cfg_sp, h, c, t, pool, iid, tid, g)

    kwargs = {} if mesh is None else {"mesh": mesh}
    if tp_axis is not None:
        # manual over seq only; tp_axis (and any other mesh axis) stays
        # auto so the params' TP NamedShardings drive SPMD partitioning
        assert tp_axis != seq_axis, "tp_axis must differ from seq_axis"
        import inspect

        assert "axis_names" in inspect.signature(sm).parameters, (
            "SP x TP composition needs jax.shard_map with axis_names "
            "(jax >= 0.9)"
        )
        kwargs["axis_names"] = frozenset({seq_axis})
    fn = sm(
        local,
        in_specs=(param_specs, seq, seq, rep, rep, P(seq_axis), P(seq_axis),
                  rep),
        out_specs=seq,
        **kwargs,
    )
    return fn(
        params, hidden_states, encoder_hidden_states, timestep,
        pooled_projections, img_ids, txt_ids, guidance,
    )
