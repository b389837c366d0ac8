"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.6 — its training
stack is DDP-only via HF accelerate, /root/reference/flux_piplines/
texturing/trainer.py:262-266).  For TPU pods this completes the
parallelism matrix next to DP/TP/SP/ZeRO: the scanned block stacks
([L, ...] leaves, models/flux/model.py init_flux_params) shard their
LAYER axis over a ``pipe`` mesh axis — each device holds L/P contiguous
blocks — and microbatch activations flow stage-to-stage with
``jax.lax.ppermute``.  Compared with tensor parallelism this moves one
activation tensor per microbatch per stage over ICI/DCN instead of two
all-reduces per layer, so it is the right layout when the interconnect is
thin (multi-slice DCN) or when layers are too small to amortize TP
collectives.

Exactness: the schedule only reorders *which device* runs a block; the
math is bit-identical to the sequential scan (no resharding of the
attention/MLP math itself).  Stages run ``M + P - 1`` steps (the GPipe
bubble); devices idle in the bubble compute on clamped dummy microbatches
whose results are masked out.

Differentiability: the loop has a static trip count and every primitive
(ppermute, dynamic slice/update) has a transpose rule, so ``jax.grad``
through :func:`pipeline_apply` yields GPipe training (activations of all
in-flight microbatches are saved, as in GPipe; combine with
``jax.checkpoint`` on the stage body for 1F1B-like memory).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Params = Any


def _shard_map():
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    return sm


def pad_stacked_blocks(stacked: Params, multiple: int) -> Params:
    """Pad a stacked [L, ...] block pytree with ZERO blocks so L divides
    ``multiple`` (the pipe-axis size).

    Zero blocks are exact identities for both FLUX block types: every
    AdaLN-Zero modulation (and hence every residual gate) comes from a
    zero-initialized linear, so the residual update is ``x + 0 * attn``
    (model.py _dual_block/_single_block).  Appending them at the end
    preserves the real blocks' order under lax.scan."""
    L = jax.tree.leaves(stacked)[0].shape[0]
    pad = (-L) % multiple
    if pad == 0:
        return stacked
    return jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        ),
        stacked,
    )


def gpipe_local(
    stage_fn: Callable,
    local_params: Params,
    micro_x: jnp.ndarray,
    micro_aux: Params,
    shared: Params,
    axis_name: str,
):
    """Per-device GPipe schedule; must run inside shard_map over
    ``axis_name``.

    ``micro_x`` [M, ...] microbatch activations (replicated across the pipe
    axis), ``micro_aux`` pytree of per-microbatch side inputs with leading
    axis M (e.g. the AdaLN time embedding), ``shared`` pytree of
    microbatch-invariant side inputs (e.g. RoPE tables).
    ``stage_fn(local_params, x, aux, shared) -> y`` applies this device's
    block slice; it must preserve x's shape/dtype.

    Stage ``p`` at step ``t`` processes microbatch ``m = t - p``; the last
    stage's results are gathered with a psum so every device returns the
    full [M, ...] output."""
    P_sz = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    M = micro_x.shape[0]
    perm = [(i, (i + 1) % P_sz) for i in range(P_sz)]

    state0 = jnp.zeros_like(micro_x[0])
    out0 = jnp.zeros_like(micro_x)
    # the loop carry becomes device-varying after the first ppermute/update;
    # mark the initial zeros varying so the carry type is stable
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        state0 = pcast(state0, (axis_name,), to="varying")
        out0 = pcast(out0, (axis_name,), to="varying")

    def step(t, carry):
        state, outputs = carry
        m = jnp.clip(t - idx, 0, M - 1)
        x_own = jax.lax.dynamic_index_in_dim(micro_x, m, 0, keepdims=False)
        x_in = jnp.where(idx == 0, x_own, state)
        aux = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False),
            micro_aux,
        )
        y = stage_fn(local_params, x_in, aux, shared)
        out_m = t - (P_sz - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outputs, y.astype(outputs.dtype), jnp.maximum(out_m, 0), 0
        )
        outputs = jnp.where((idx == P_sz - 1) & (out_m >= 0), upd, outputs)
        state = jax.lax.ppermute(y, axis_name, perm)
        return state, outputs

    _, outputs = jax.lax.fori_loop(
        0, M + P_sz - 1, step, (state0, out0), unroll=False
    )
    # broadcast the last stage's buffer to every device (replicated output)
    outputs = jax.lax.psum(
        jnp.where(idx == P_sz - 1, outputs, jnp.zeros_like(outputs)), axis_name
    )
    return outputs


def gpipe_chain_local(
    stage_fn_a: Callable,
    stage_fn_b: Callable,
    params_a: Params,
    params_b: Params,
    micro_x: jnp.ndarray,
    micro_aux: Params,
    shared: Params,
    axis_name: str,
):
    """Two back-to-back pipelines (phase a then phase b) in ONE schedule.

    Chains phase a's last stage into phase b's first stage over the ring's
    natural ``P-1 -> 0`` hop (one activation per microbatch) instead of a
    full [M, ...] psum broadcast between two separate pipelines, and lets
    phase b start as soon as microbatches drain from phase a: total steps
    ``max(M, P) + M + P - 1`` vs ``2(M + P - 1)`` for two sequential
    pipelines — and a single final psum instead of two.

    Collision-free scheduling: device p runs phase a on microbatch m at
    step ``m + p`` and phase b at step ``OFF + m + p`` with
    ``OFF = max(M, P)``; the windows are disjoint, so each step applies
    exactly one stage (``lax.cond`` picks the phase), and wrapped phase-a
    outputs are buffered on device 0 until their phase-b slot."""
    P_sz = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    M = micro_x.shape[0]
    OFF = max(M, P_sz)
    perm = [(i, (i + 1) % P_sz) for i in range(P_sz)]

    state0 = jnp.zeros_like(micro_x[0])
    buf0 = jnp.zeros_like(micro_x)
    out0 = jnp.zeros_like(micro_x)
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        state0 = pcast(state0, (axis_name,), to="varying")
        buf0 = pcast(buf0, (axis_name,), to="varying")
        out0 = pcast(out0, (axis_name,), to="varying")

    def step(t, carry):
        state, buf, outputs = carry
        is_b = t >= OFF + idx
        m_a = jnp.clip(t - idx, 0, M - 1)
        m_b = jnp.clip(t - OFF - idx, 0, M - 1)
        m = jnp.where(is_b, m_b, m_a)
        # device 0 inputs: fresh microbatch (phase a) / buffered wrap (phase b)
        x_own = jax.lax.dynamic_index_in_dim(micro_x, m_a, 0, keepdims=False)
        x_buf = jax.lax.dynamic_index_in_dim(buf, m_b, 0, keepdims=False)
        x0 = jnp.where(is_b, x_buf, x_own)
        x_in = jnp.where(idx == 0, x0, state)
        aux = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False),
            micro_aux,
        )
        y = jax.lax.cond(
            is_b,
            lambda xi, au: stage_fn_b(params_b, xi, au, shared),
            lambda xi, au: stage_fn_a(params_a, xi, au, shared),
            x_in, aux,
        )
        out_m = t - OFF - (P_sz - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outputs, y.astype(outputs.dtype), jnp.clip(out_m, 0, M - 1), 0
        )
        outputs = jnp.where(
            (idx == P_sz - 1) & (out_m >= 0) & (out_m <= M - 1), upd, outputs
        )
        state = jax.lax.ppermute(y, axis_name, perm)
        # stash the wrap (phase-a output of stage P-1, microbatch t-P+1)
        # arriving at device 0 for its phase-b slot
        arr_m = t - P_sz + 1
        bupd = jax.lax.dynamic_update_index_in_dim(
            buf, state.astype(buf.dtype), jnp.clip(arr_m, 0, M - 1), 0
        )
        buf = jnp.where(
            (idx == 0) & (arr_m >= 0) & (arr_m <= M - 1), bupd, buf
        )
        return state, buf, outputs

    _, _, outputs = jax.lax.fori_loop(
        0, OFF + M + P_sz - 1, step, (state0, buf0, out0), unroll=False
    )
    outputs = jax.lax.psum(
        jnp.where(idx == P_sz - 1, outputs, jnp.zeros_like(outputs)), axis_name
    )
    return outputs


def pipeline_apply_chain(
    stage_fn_a: Callable,
    stacked_params_a: Params,
    stage_fn_b: Callable,
    stacked_params_b: Params,
    micro_x: jnp.ndarray,
    micro_aux: Params,
    shared: Params,
    mesh: Optional[Mesh] = None,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
    param_specs_a=None,
    param_specs_b=None,
) -> jnp.ndarray:
    """:func:`pipeline_apply` for two chained stacks (phase a then b) —
    one shard_map, one schedule, no intermediate activation broadcast.
    Both stacks must be padded to a multiple of the pipe-axis size.
    ``param_specs_a/b`` override the default layer-axis-only specs (the
    TPxPP composition shards kernel dims over a second axis —
    models/flux/pp.py _tp_pp_leaf_spec)."""
    sm = _shard_map()
    spec_a = param_specs_a if param_specs_a is not None else jax.tree.map(
        lambda _: P(pipe_axis), stacked_params_a)
    spec_b = param_specs_b if param_specs_b is not None else jax.tree.map(
        lambda _: P(pipe_axis), stacked_params_b)
    row = P(None, data_axis) if data_axis else P()
    aux_specs = jax.tree.map(lambda _: row, micro_aux)
    shared_specs = jax.tree.map(lambda _: P(), shared)
    kwargs = {} if mesh is None else {"mesh": mesh}
    fn = sm(
        partial(gpipe_chain_local, stage_fn_a, stage_fn_b, axis_name=pipe_axis),
        in_specs=(spec_a, spec_b, row, aux_specs, shared_specs),
        out_specs=row,
        **kwargs,
    )
    return fn(stacked_params_a, stacked_params_b, micro_x, micro_aux, shared)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params: Params,
    micro_x: jnp.ndarray,
    micro_aux: Params,
    shared: Params,
    mesh: Optional[Mesh] = None,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run ``micro_x`` [M, B_m, ...] through the stacked blocks, pipelined
    over ``pipe_axis``.  Block params must already be padded to a multiple
    of the pipe-axis size (:func:`pad_stacked_blocks`); their leading layer
    axis is sharded so each stage holds a contiguous L/P slice.

    With ``data_axis`` set, the microbatch dimension B_m additionally
    shards over it (DP x PP): pipelining happens independently per data
    row, ppermute rides only the pipe axis.

    ``mesh=None`` uses the ambient mesh (``jax.set_mesh``) — that is how
    the jitted training step reaches the pipeline without threading a Mesh
    through static args."""
    sm = _shard_map()
    param_specs = jax.tree.map(lambda _: P(pipe_axis), stacked_params)
    row = P(None, data_axis) if data_axis else P()
    aux_specs = jax.tree.map(lambda _: row, micro_aux)
    shared_specs = jax.tree.map(lambda _: P(), shared)
    kwargs = {} if mesh is None else {"mesh": mesh}
    fn = sm(
        partial(gpipe_local, stage_fn, axis_name=pipe_axis),
        in_specs=(param_specs, row, aux_specs, shared_specs),
        out_specs=row,
        **kwargs,
    )
    return fn(stacked_params, micro_x, micro_aux, shared)
