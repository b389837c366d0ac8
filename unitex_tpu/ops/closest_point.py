"""Closest point on mesh (unsigned distance + face index + barycentrics).

Capability of the reference's cuBVH ``unsigned_distance(points,
return_uvw=True)`` query (used by spatial/near-surface sampling,
TextureTools/texturetools/geometry/sampling/spatial_sampling.py:36,91).
The CUDA reference walks a BVH; pointer-chasing trees are hostile to the
TPU's vector units, so we use the same two-stage substitution as our KNN:

1. candidate faces per query via a centroid KNN (one MXU distance matmul +
   top-k, ops/knn.py);
2. exact point-triangle closest-point (Ericson, Real-Time Collision
   Detection §5.1.5) evaluated densely on the k candidates, argmin.

With enough candidates this equals the exact answer in practice; an
``exact=True`` mode scans ALL face chunks with a running best (the same
carry pattern as ops/raytrace.py) for a guaranteed result and for parity
tests.  A numpy reference mirrors the dual-implementation pattern.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ClosestPoint(NamedTuple):
    """distance [N], face index [N] int32, barycentric uvw [N, 3] (weights
    of face vertices 0/1/2), projected point [N, 3]."""

    distance: jnp.ndarray
    face: jnp.ndarray
    uvw: jnp.ndarray
    point: jnp.ndarray


def closest_point_triangle(
    p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest point on triangle (a, b, c) to p, fully vectorized.

    All inputs broadcastable [..., 3].  Returns (uvw [..., 3], squared
    distance [...]) — the seven Voronoi-region cases of Ericson §5.1.5 as a
    ``jnp.select`` cascade (first true wins), no data-dependent branching.
    """
    ab = b - a
    ac = c - a
    ap = p - a

    def dot(x, y):
        return jnp.sum(x * y, axis=-1)

    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = p - b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = p - c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    def safe_div(n, d):
        return n / jnp.where(jnp.abs(d) > 1e-30, d, 1.0)

    v_ab = safe_div(d1, d1 - d3)
    w_ac = safe_div(d2, d2 - d6)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v_in = vb * denom
    w_in = vc * denom

    conds = [
        (d1 <= 0.0) & (d2 <= 0.0),                      # vertex A
        (d3 >= 0.0) & (d4 <= d3),                       # vertex B
        (d6 >= 0.0) & (d5 <= d6),                       # vertex C
        (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0),        # edge AB
        (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0),        # edge AC
        (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0),  # edge BC
    ]
    zeros = jnp.zeros_like(d1)
    ones = jnp.ones_like(d1)
    u_cases = [ones, zeros, zeros, 1.0 - v_ab, 1.0 - w_ac, zeros]
    v_cases = [zeros, ones, zeros, v_ab, zeros, 1.0 - w_bc]
    w_cases = [zeros, zeros, ones, zeros, w_ac, w_bc]
    u = jnp.select(conds, u_cases, 1.0 - v_in - w_in)
    v = jnp.select(conds, v_cases, v_in)
    w = jnp.select(conds, w_cases, w_in)
    uvw = jnp.stack([u, v, w], axis=-1)
    q = a * u[..., None] + b * v[..., None] + c * w[..., None]
    d2q = dot(p - q, p - q)
    return uvw, d2q


@partial(jax.jit, static_argnames=("k", "chunk", "exact", "face_chunk"))
def closest_point_on_mesh(
    points: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    k: int = 8,
    chunk: int = 8192,
    exact: bool = False,
    face_chunk: int = 2048,
) -> ClosestPoint:
    """points [N, 3], vertices [V, 3], faces [F, 3] -> ClosestPoint.

    ``exact=False``: two-stage candidate search (centroid KNN top-``k`` then
    exact distance on candidates).  ``exact=True``: running-best scan over
    all face chunks (O(N·F), guaranteed)."""
    N = points.shape[0]
    F = faces.shape[0]
    tri = vertices[faces].astype(jnp.float32)  # [F, 3, 3]
    pts = points.astype(jnp.float32)

    if exact:
        nfc = (F + face_chunk - 1) // face_chunk
        Fp = nfc * face_chunk
        trip = jnp.pad(tri, ((0, Fp - F), (0, 0), (0, 0))).reshape(
            nfc, face_chunk, 3, 3
        )
        fvalid = jnp.pad(jnp.ones((F,), bool), (0, Fp - F)).reshape(nfc, face_chunk)
        bases = jnp.arange(nfc, dtype=jnp.int32) * face_chunk

        nrc = (N + chunk - 1) // chunk
        Np = nrc * chunk
        pp = jnp.pad(pts, ((0, Np - N), (0, 0))).reshape(nrc, chunk, 3)

        def point_block(p_c):
            def body(carry, fc):
                bd2, bface, buvw = carry
                t, valid, base = fc
                uvw, d2 = closest_point_triangle(
                    p_c[:, None, :], t[None, :, 0], t[None, :, 1], t[None, :, 2]
                )  # [c, m, 3], [c, m]
                d2 = jnp.where(valid[None, :], d2, jnp.inf)
                best = jnp.argmin(d2, axis=1)
                ridx = jnp.arange(d2.shape[0])
                db = d2[ridx, best]
                better = db < bd2
                return (
                    jnp.where(better, db, bd2),
                    jnp.where(better, base + best, bface),
                    jnp.where(better[:, None], uvw[ridx, best], buvw),
                ), None

            init = (
                jnp.full((chunk,), jnp.inf),
                jnp.full((chunk,), -1, jnp.int32),
                jnp.zeros((chunk, 3)),
            )
            (bd2, bface, buvw), _ = jax.lax.scan(body, init, (trip, fvalid, bases))
            return bd2, bface, buvw

        d2, face, uvw = jax.lax.map(point_block, pp)
        d2 = d2.reshape(-1)[:N]
        face = face.reshape(-1)[:N]
        uvw = uvw.reshape(-1, 3)[:N]
    else:
        from .knn import knn

        centroids = tri.mean(axis=1)  # [F, 3]
        _, cand = knn(pts, centroids, k=min(k, F), chunk=chunk)  # [N, k]
        tcand = tri[cand]  # [N, k, 3, 3]
        uvw_k, d2_k = closest_point_triangle(
            pts[:, None, :], tcand[..., 0, :], tcand[..., 1, :], tcand[..., 2, :]
        )  # [N, k, 3], [N, k]
        best = jnp.argmin(d2_k, axis=1)
        ridx = jnp.arange(N)
        d2 = d2_k[ridx, best]
        face = cand[ridx, best].astype(jnp.int32)
        uvw = uvw_k[ridx, best]

    proj = jnp.einsum("nkc,nk->nc", vertices[faces[face]], uvw)
    return ClosestPoint(jnp.sqrt(jnp.maximum(d2, 0.0)), face, uvw, proj)


def closest_point_on_mesh_ref(
    points: np.ndarray, vertices: np.ndarray, faces: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact numpy reference (independent implementation: dense barycentric
    clamp via per-edge projections, brute force over all faces) for parity
    tests.  Returns (distance [N], face [N], uvw [N, 3])."""
    tri = vertices[faces].astype(np.float64)  # [F, 3, 3]
    N = len(points)
    F = len(faces)
    dist = np.full((N,), np.inf)
    face = np.full((N,), -1, np.int64)
    uvw = np.zeros((N, 3))
    for fi in range(F):
        a, b, c = tri[fi]
        q, bary = _closest_point_triangle_np(points.astype(np.float64), a, b, c)
        d = np.linalg.norm(points - q, axis=-1)
        better = d < dist
        dist[better] = d[better]
        face[better] = fi
        uvw[better] = bary[better]
    return dist, face.astype(np.int32), uvw


def _closest_point_triangle_np(p, a, b, c):
    """Scalar-triangle / batched-point closest point: clamp the unconstrained
    barycentric solution to the triangle by checking each edge segment and
    each vertex explicitly (a different formulation than the Voronoi-region
    cascade above, so the parity test cross-checks the math)."""

    def seg(p, s0, s1):
        d = s1 - s0
        t = np.clip(((p - s0) @ d) / max(float(d @ d), 1e-30), 0.0, 1.0)
        return s0 + t[:, None] * d, t

    # unconstrained barycentric via normal equations
    e0 = b - a
    e1 = c - a
    g = np.array([[e0 @ e0, e0 @ e1], [e0 @ e1, e1 @ e1]])
    rhs = np.stack([(p - a) @ e0, (p - a) @ e1], axis=-1)  # [N, 2]
    try:
        sol = rhs @ np.linalg.inv(g).T
    except np.linalg.LinAlgError:
        sol = np.zeros_like(rhs)
    v, w = sol[:, 0], sol[:, 1]
    inside = (v >= 0) & (w >= 0) & (v + w <= 1)

    candidates = []
    barys = []
    q_in = a + v[:, None] * e0 + w[:, None] * e1
    candidates.append(np.where(inside[:, None], q_in, np.inf))
    barys.append(np.stack([1 - v - w, v, w], axis=-1))
    for (s0, s1, mk) in [
        (a, b, lambda t: np.stack([1 - t, t, np.zeros_like(t)], -1)),
        (a, c, lambda t: np.stack([1 - t, np.zeros_like(t), t], -1)),
        (b, c, lambda t: np.stack([np.zeros_like(t), 1 - t, t], -1)),
    ]:
        q, t = seg(p, s0, s1)
        candidates.append(q)
        barys.append(mk(t))
    d = np.stack([np.linalg.norm(p - q, axis=-1) for q in candidates], axis=-1)
    best = np.argmin(d, axis=-1)
    ridx = np.arange(len(p))
    q = np.stack(candidates, axis=1)[ridx, best]
    bary = np.stack(barys, axis=1)[ridx, best]
    return q, bary
