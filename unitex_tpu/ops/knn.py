"""K-nearest-neighbour search as tiled matmul + top-k.

The reference dispatches to GPU KD-trees (torch_kdtree / CuPy
pcd/knn/__init__.py:13-114, knn_cupy.py) for k<=8 queries over millions of
UV texels.  Pointer-chasing KD-trees are hostile to the TPU's vector units;
at the pipeline's scales (<= 4M queries x <= 256k references) a tiled
brute-force search rides the MXU instead: the distance matrix is a single
matmul via ||q - r||^2 = ||q||^2 + ||r||^2 - 2 q.r, reduced with
``lax.top_k`` per query chunk, never materializing more than
[chunk, n_ref] — the same chunking idea as the reference's
``batch_size=1024*1024`` loop (renderer_inverse.py:383).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    queries: jnp.ndarray,
    references: jnp.ndarray,
    k: int = 1,
    chunk: int = 65536,
    ref_valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """queries [Q, D], references [R, D] -> (dists [Q, k], idx [Q, k]).

    Distances are Euclidean (not squared), ascending.  ``ref_valid`` [R]
    masks out padded reference points (they sort to +inf).
    """
    Q, D = queries.shape
    R = references.shape[0]
    k = min(k, R)
    ref_sq = jnp.sum(references * references, axis=-1)          # [R]
    if ref_valid is not None:
        ref_penalty = jnp.where(ref_valid, 0.0, jnp.inf)
    else:
        ref_penalty = jnp.zeros((R,), queries.dtype)

    n_chunks = (Q + chunk - 1) // chunk
    Qp = n_chunks * chunk
    q_pad = jnp.pad(queries, ((0, Qp - Q), (0, 0)))

    def body(_, q):
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)           # [c, 1]
        d2 = q_sq + ref_sq[None, :] - 2.0 * jnp.dot(
            q, references.T, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(d2, 0.0) + ref_penalty[None, :]
        if k <= 8:
            # iterative argmin beats lax.top_k on TPU for small k over wide
            # rows (top_k sorts; argmin is a single VPU reduce per pass)
            dists_k, idx_k = [], []
            cur = d2
            rows = jnp.arange(cur.shape[0])
            for _i in range(k):
                best = jnp.argmin(cur, axis=1)
                dists_k.append(cur[rows, best])
                idx_k.append(best)
                cur = cur.at[rows, best].set(jnp.inf)
            d_sel = jnp.stack(dists_k, axis=1)
            i_sel = jnp.stack(idx_k, axis=1)
        else:
            neg_d, i_sel = jax.lax.top_k(-d2, k)
            d_sel = -neg_d
        return None, (jnp.sqrt(jnp.maximum(d_sel, 0.0)), i_sel)

    _, (dists, idx) = jax.lax.scan(
        body, None, q_pad.reshape(n_chunks, chunk, D)
    )
    return dists.reshape(Qp, k)[:Q], idx.reshape(Qp, k)[:Q].astype(jnp.int32)


@partial(jax.jit, static_argnames=("cap", "chunk"))
def query_ball(
    queries: jnp.ndarray,
    references: jnp.ndarray,
    radius: float | jnp.ndarray,
    cap: int = 32,
    chunk: int = 65536,
    ref_valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-radius neighbor search — the ``query_ball_point`` capability of
    the reference's scipy-compatible GPU KD-tree (pcd/knn/knn_cupy.py:856+),
    re-expressed with static shapes: instead of ragged per-query lists it
    returns the ``cap`` NEAREST in-radius neighbors per query plus the TRUE
    in-radius count (which may exceed ``cap``).

    queries [Q, D], references [R, D] ->
      idx [Q, cap] int32 (arbitrary value where invalid),
      mask [Q, cap] bool (within radius, valid),
      counts [Q] int32 (all references within radius, uncapped).
    Same tiled-matmul distance core as :func:`knn`.
    """
    Q, D = queries.shape
    R = references.shape[0]
    cap = min(cap, R)
    r2 = jnp.square(jnp.asarray(radius, queries.dtype))
    ref_sq = jnp.sum(references * references, axis=-1)
    if ref_valid is not None:
        ref_penalty = jnp.where(ref_valid, 0.0, jnp.inf)
    else:
        ref_penalty = jnp.zeros((R,), queries.dtype)

    n_chunks = (Q + chunk - 1) // chunk
    Qp = n_chunks * chunk
    q_pad = jnp.pad(queries, ((0, Qp - Q), (0, 0)))

    def body(_, q):
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d2 = q_sq + ref_sq[None, :] - 2.0 * jnp.dot(
            q, references.T, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(d2, 0.0) + ref_penalty[None, :]
        counts = jnp.sum(d2 <= r2, axis=1).astype(jnp.int32)
        neg_d, idx = jax.lax.top_k(-d2, cap)
        mask = (-neg_d) <= r2
        return None, (idx.astype(jnp.int32), mask, counts)

    _, (idx, mask, counts) = jax.lax.scan(
        body, None, q_pad.reshape(n_chunks, chunk, D)
    )
    return (
        idx.reshape(Qp, cap)[:Q],
        mask.reshape(Qp, cap)[:Q],
        counts.reshape(Qp)[:Q],
    )


def knn_gather_blend(
    queries: jnp.ndarray,
    references: jnp.ndarray,
    values: jnp.ndarray,
    k: int = 4,
    chunk: int = 65536,
    ref_valid: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted KNN interpolation of ``values`` [R, C] at
    ``queries`` — the fill operation used for invisible texels
    (renderer_inverse.py:383-433)."""
    dists, idx = knn(queries, references, k=k, chunk=chunk, ref_valid=ref_valid)
    w = 1.0 / (dists + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("qk,qkc->qc", w, values[idx])
