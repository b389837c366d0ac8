"""Pallas TPU flash attention for the MMDiT joint sequence.

Replaces ``F.scaled_dot_product_attention`` in the reference's attention
processors (/root/reference/flux_piplines/texturing/attention_processor.py:89-91).
The 13.8k-token joint attention would materialize a 14336^2 logit matrix per
head under naive XLA lowering (~10 GB bf16 across 24 heads); this kernel
streams K/V through VMEM with an online softmax so memory is
O(S·D) — the standard FlashAttention-2 scheme laid out for the MXU:

* grid over (batch*heads, query blocks);
* K/V for one head live entirely in VMEM (14336 x 128 bf16 = 3.7 MB each,
  well under the 16 MB budget);
* the inner loop walks K in 512-wide chunks: two MXU matmuls per chunk
  (logits, then prob @ V) with f32 running max / sum / accumulator.

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
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale: float
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


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1536,
) -> jnp.ndarray:
    """q/k/v [B, S, H, D] -> [B, S, H, D] full bidirectional attention."""
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    # pad sequence to a block multiple; padded KEYS would corrupt the
    # softmax, so pad K with -inf-scoring garbage? Instead pad to block_k
    # and mask by giving padded keys a large negative via k=0 AND tracking:
    # simplest correct scheme: pad S to lcm block; padded queries are
    # discarded on return; padded keys contribute exp(logit) with logit
    # computed from zero-vectors -> constant 0*scale = 0 which IS wrong.
    # So we require S % block_k == 0 after choosing block_k adaptively.
    bq = math.gcd(block_q, S) if S % block_q else block_q
    bk = math.gcd(block_k, S) if S % block_k else block_k
    if S % bq or S % bk or bq < 8 or bk < 128:
        # awkward sequence length: fall back to reference
        return attention_reference(q, k, v)

    qr = jnp.moveaxis(q, 2, 1).reshape(B * H, S, D)
    kr = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vr = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)

    grid = (B * H, S // bq, S // bk)
    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=3 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
    )(qr, kr, vr)
    return jnp.moveaxis(out.reshape(B, H, S, D), 1, 2)


def attention(q, k, v):
    """Dispatch: Pallas flash attention on TPU, jnp reference on CPU.
    (Decided by the default backend — safe to call under jit.)"""
    if jax.default_backend() != "cpu":
        return flash_attention(q, k, v)
    return attention_reference(q, k, v)
