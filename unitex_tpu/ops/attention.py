"""Pallas TPU flash attention for the MMDiT joint sequence.

Replaces ``F.scaled_dot_product_attention`` in the reference's attention
processors (/root/reference/flux_piplines/texturing/attention_processor.py:89-91).
The 13.8k-token joint attention would materialize a 14336^2 logit matrix per
head under naive XLA lowering (~10 GB bf16 across 24 heads); this kernel
streams K/V through VMEM with an online softmax so memory is
O(S·D) — the standard FlashAttention-2 scheme laid out for the MXU:

* grid over (batch*heads, query blocks, key blocks) with the key axis
  innermost (sequential); online-softmax state lives in VMEM scratch;
* two MXU matmuls per step (logits, prob@V) with bf16 inputs and f32
  accumulation; blocks 1536/1536 measured at 136 TF/s on v5e (sweep in
  flash_attention docstring).

Differentiable: a ``jax.custom_vjp`` saves the per-row logsumexp from the
forward kernel; the backward recomputes P blockwise (standard
FlashAttention backward math) in two Pallas kernels — dK/dV with the
query axis sequential, dQ with the key axis sequential — streaming
blocks through VMEM.  An XLA-level chunked variant (lax.scan of einsums)
remains as the CPU / non-tiling fallback and the parity reference.

Full (non-causal) attention, no masking — the MMDiT sequence attends
globally.  A jnp reference implementation backs parity tests, and the
public ``attention`` entry point dispatches: Pallas on TPU, reference
elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale=None):
    """jnp reference: q/k/v [B, S, H, D] -> [B, S, H, D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale: float
):
    """One (head, q-block, k-block) grid step.  The k axis is the innermost
    (sequential) grid dimension; online-softmax state lives in VMEM scratch
    and persists across its steps."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # keep MXU inputs in the storage dtype (bf16 runs at 2x f32 throughput);
    # accumulation and softmax statistics stay f32
    q = q_ref[0]                                       # [BQ, D]
    k = k_ref[0]                                       # [BK, D]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )                                                  # [BQ, BK]
    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # lse is stored [BH, 8, S] (8 replicated sublanes — TPU block
        # shapes need the second-to-last dim divisible by 8)
        lse = (m_ref[:] + jnp.log(l_ref[:]))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _largest_divisor_leq(S: int, cap: int) -> int:
    """Largest divisor of S that is <= cap and a multiple of 128 (TPU lane
    tiling: the lse output block is (1, 8, bq), so blocks must divide into
    128-lane rows).  Falls back to the gcd when no such divisor exists."""
    for d in range(min(cap, S) // 128 * 128, 127, -128):
        if S % d == 0:
            return d
    return math.gcd(cap, S)


def _pick_blocks(S: int, block_q: int, block_k: int):
    # When S doesn't divide the requested block, take the LARGEST divisor
    # under it, not the gcd.  The pipeline's joint sequence S=13824 divides
    # 1536 exactly; but at other operating points — e.g. S=14336 (= 2^11·7,
    # an extra 512 tokens of conditioning) — a 1536 request gcd-collapses
    # to 512/512 (79 TF/s measured) while the largest-divisor 1024/1024
    # runs 142-156 TF/s — v5e sweep 2026-08.
    bq = block_q if S % block_q == 0 else _largest_divisor_leq(S, block_q)
    bk = block_k if S % block_k == 0 else _largest_divisor_leq(S, block_k)
    # lane-dim tiling needs multiples of 128 in both block sizes (the lse
    # output block is (1, 8, bq))
    ok = not (S % bq or S % bk or bq % 128 or bk % 128)
    return bq, bk, ok


def _flash_forward(qr, kr, vr, scale: float, bq: int, bk: int):
    """[BH, S, D] inputs -> (out [BH, S, D], lse [BH, S] f32)."""
    BH, S, D = qr.shape
    grid = (BH, S // bq, S // bk)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, bq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), qr.dtype),
            jax.ShapeDtypeStruct((BH, 8, S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=3 * BH * S * D * qr.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qr, kr, vr)
    return out, lse[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(qr, kr, vr, scale, bq, bk):
    out, _ = _flash_forward(qr, kr, vr, scale, bq, bk)
    return out


def _flash_core_fwd(qr, kr, vr, scale, bq, bk):
    out, lse = _flash_forward(qr, kr, vr, scale, bq, bk)
    return out, (qr, kr, vr, out, lse)


def _flash_core_bwd_xla(scale, bq, bk, residuals, g):
    """Chunked FlashAttention backward (recompute P blockwise from the
    saved logsumexp):
      D   = rowsum(dO ∘ O)
      P_j = exp(Q K_j^T·s − lse)
      dV_j = P_j^T dO ;  dS_j = P_j ∘ (dO V_j^T − D)
      dQ  += dS_j K_j·s ;  dK_j = dS_j^T Q·s
    Memory O(S·block) — never materializes the S×S matrix.  XLA-level
    variant (lax.scan of einsums): the fallback when the Pallas backward
    can't tile the sequence, and the parity reference for it."""
    qr, kr, vr, out, lse = residuals
    BH, S, D = qr.shape
    gf = g.astype(jnp.float32)
    Drow = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)  # [BH,S,1]
    nkb = S // bk

    ein = functools.partial(
        jnp.einsum, preferred_element_type=jnp.float32
    )

    def body(dq, j):
        # bf16 MXU inputs with f32 accumulation, like the forward kernel
        ks = jax.lax.dynamic_slice(kr, (0, j * bk, 0), (BH, bk, D))
        vs = jax.lax.dynamic_slice(vr, (0, j * bk, 0), (BH, bk, D))
        logits = ein("bqd,bkd->bqk", qr, ks) * scale
        p = jnp.exp(logits - lse[..., None])                        # [BH,S,bk]
        dp = ein("bqd,bkd->bqk", g, vs)
        ds = (p * (dp - Drow)).astype(qr.dtype)
        pb = p.astype(qr.dtype)
        dv_j = ein("bqk,bqd->bkd", pb, g)
        dk_j = ein("bqk,bqd->bkd", ds, qr) * scale
        dq = dq + ein("bqk,bkd->bqd", ds, ks) * scale
        return dq, (dk_j, dv_j)

    dq0 = jnp.zeros((BH, S, D), jnp.float32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        body, dq0, jnp.arange(nkb)
    )
    dk = jnp.moveaxis(dk_blocks, 0, 1).reshape(BH, S, D)
    dv = jnp.moveaxis(dv_blocks, 0, 1).reshape(BH, S, D)
    return dq.astype(qr.dtype), dk.astype(kr.dtype), dv.astype(vr.dtype)


# Pallas backward: streams blocks through VMEM instead of materializing
# the [BH, S, bk] f32 probability slabs the XLA variant writes to HBM
# (~2 GB per key block at the 13.8k operating point — the backward's
# real bottleneck is that traffic, not FLOPs).  Backward block sizes are
# independent of the forward's: the kernels hold [bq, bk] f32
# temporaries (p, dp, ds), so the q block stays smaller.
BWD_BLOCK_Q = 512
BWD_BLOCK_K = 1536


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dr_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float
):
    """Grid (BH, k blocks, q blocks); q innermost (sequential) —
    dk/dv accumulators for key block j live in VMEM across the q sweep."""
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                                   # [BQ, D]
    k = k_ref[0]                                   # [BK, D]
    v = v_ref[0]
    g = g_ref[0]                                   # [BQ, D]
    lse = lse_ref[0][0][:, None]                   # [BQ, 1]
    dr = dr_ref[0][0][:, None]                     # [BQ, 1] rowsum(dO*O)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(logits - lse)                      # [BQ, BK]
    pb = p.astype(v.dtype)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pb, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [BQ, BK]
    ds = (p * (dp - dr)).astype(q.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dr_ref, dq_ref, dq_acc,
    *, scale: float
):
    """Grid (BH, q blocks, k blocks); k innermost — dq accumulator for
    query block i lives in VMEM across the k sweep."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    lse = lse_ref[0][0][:, None]
    dr = dr_ref[0][0][:, None]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(logits - lse)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - dr)).astype(q.dtype)
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_backward_pallas(qr, kr, vr, out, lse, g, scale: float,
                           bq: int, bk: int):
    """[BH, S, D] residuals + cotangent -> (dq, dk, dv)."""
    BH, S, D = qr.shape
    gf = g.astype(qr.dtype)
    drow = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1)                        # [BH, S]
    # sublane-replicated [BH, 8, S] forms (same layout as the lse output)
    lse8 = jnp.broadcast_to(lse[:, None, :], (BH, 8, S))
    dr8 = jnp.broadcast_to(drow[:, None, :], (BH, 8, S))

    dkv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(BH, S // bk, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # g
            pl.BlockSpec((1, 8, bq), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, 8, bq), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),   # drow
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), kr.dtype),
            jax.ShapeDtypeStruct((BH, S, D), vr.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * S * S * D,
            bytes_accessed=4 * BH * S * D * qr.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qr, kr, vr, gf, lse8, dr8)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(BH, S // bq, S // bk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), qr.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=4 * BH * S * D * qr.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qr, kr, vr, gf, lse8, dr8)
    return dq, dkv[0], dkv[1]


def _flash_core_bwd(scale, bq, bk, residuals, g):
    """custom_vjp backward: the Pallas kernels when the sequence tiles
    into the backward blocks, the XLA chunked recompute otherwise."""
    qr, kr, vr, out, lse = residuals
    BH, S, D = qr.shape
    bqb, bkb, ok = _pick_blocks(S, BWD_BLOCK_Q, BWD_BLOCK_K)
    # CPU: the custom_vjp backward runs outside any interpret-mode
    # context the caller wrapped the forward in, so Pallas can't lower —
    # the XLA chunked recompute is the same math.  UNITEX_ATTN_BWD=xla
    # forces the fallback everywhere (escape hatch).
    import os
    if (not ok or jax.default_backend() == "cpu"
            or os.environ.get("UNITEX_ATTN_BWD") == "xla"):
        return _flash_core_bwd_xla(scale, bq, bk, residuals, g)
    return _flash_backward_pallas(qr, kr, vr, out, lse, g, scale, bqb, bkb)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _flash_kernel_qk8(
    qq_ref, kq_ref, v_ref, sq_ref, sk_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float
):
    """int8-QK variant: the logits matmul runs on the MXU's 2x int8 path
    (q/k rows symmetrically quantized outside the kernel, per-row scales
    applied to the int32 logits).  Softmax statistics and the P@V matmul
    stay f32/bf16 — serving-mode kernel (no VJP)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    qq = qq_ref[0]                                     # [BQ, D] int8
    kq = kq_ref[0]                                     # [BK, D] int8
    v = v_ref[0]
    sq = sq_ref[0][0]                                  # [BQ] f32
    sk = sk_ref[0][0]                                  # [BK] f32
    acc_i = jax.lax.dot_general(
        qq, kq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    logits = acc_i.astype(jnp.float32) * (sq[:, None] * scale) * sk[None, :]
    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        lse = (m_ref[:] + jnp.log(l_ref[:]))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _quant_rows(x):
    """[BH, S, D] -> (int8 values, scales stored [BH, 8, S] for TPU block
    tiling — same sublane-replicated layout as the lse output)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return xq, jnp.broadcast_to(s[:, None, :], (x.shape[0], 8, x.shape[1]))


def _flash_forward_qk8(qr, kr, vr, scale: float, bq: int, bk: int):
    """Serving-mode forward with int8 QK^T: [BH, S, D] -> [BH, S, D]."""
    BH, S, D = qr.shape
    qq, sq = _quant_rows(qr)
    kq, sk = _quant_rows(kr)
    grid = (BH, S // bq, S // bk)
    out, _ = pl.pallas_call(
        functools.partial(_flash_kernel_qk8, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bk), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), qr.dtype),
            jax.ShapeDtypeStruct((BH, 8, S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=3 * BH * S * D,
            transcendentals=BH * S * S,
        ),
    )(qq, kq, vr, sq, sk)
    return out


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_qk8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1536,
    block_k: int = 1536,
) -> jnp.ndarray:
    """Serving-mode flash attention with int8 QK^T (q/k per-row symmetric
    quantization; logit deviation ~0.5% — the softmax renormalizes most of
    it away).  Same layout contract as :func:`flash_attention`; falls back
    to it when blocks don't divide, and to the reference off-TPU."""
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    bq, bk, ok = _pick_blocks(S, block_q, block_k)
    if not ok:
        return attention_reference(q, k, v)
    qr = jnp.moveaxis(q, 2, 1).reshape(B * H, S, D)
    kr = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vr = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    out = _flash_forward_qk8(qr, kr, vr, scale, bq, bk)
    return jnp.moveaxis(out.reshape(B, H, S, D), 1, 2)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1536,
    block_k: int = 1536,
) -> jnp.ndarray:
    """q/k/v [B, S, H, D] -> [B, S, H, D] full bidirectional attention.
    Block defaults from a v5e sweep at S=13824: 1536/1536 = 136 TF/s vs
    131 at the old 512/1536 (512/2304 and 512/1728 regress to ~115-119).
    Sequence lengths not divisible into blocks fall back to the reference
    (padded keys would corrupt the softmax)."""
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    bq, bk, ok = _pick_blocks(S, block_q, block_k)
    if not ok:
        return attention_reference(q, k, v)

    qr = jnp.moveaxis(q, 2, 1).reshape(B * H, S, D)
    kr = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vr = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    out = _flash_core(qr, kr, vr, scale, bq, bk)
    return jnp.moveaxis(out.reshape(B, H, S, D), 1, 2)


def attention(q, k, v, qk8: bool = False):
    """Dispatch: Pallas flash attention on TPU, jnp reference on CPU.
    (Decided by the default backend — safe to call under jit.)
    ``qk8``: int8-QK serving kernel (ignored off-TPU)."""
    if jax.default_backend() != "cpu":
        if qk8:
            return flash_attention_qk8(q, k, v)
        return flash_attention(q, k, v)
    return attention_reference(q, k, v)
