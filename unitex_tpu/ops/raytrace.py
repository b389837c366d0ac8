"""Ray-mesh intersection for TPU: brute-force Möller–Trumbore + depth-test
visibility.

The reference builds an LBVH on the GPU and stack-traverses it in Slang
(raytracing/rt_aprmis/bvhworkers/*.slang, ~1,550 LoC) to answer one query:
"which triangle does this ray hit first?" — used only for UV-texel
visibility (renderer_inverse.py:321-325).  Stack-based BVH traversal is a
scalar, divergent workload that maps terribly onto the TPU's 8x128 vector
lanes, so this module provides two TPU-shaped equivalents:

1. :func:`ray_triangle_intersect` — tiled Möller–Trumbore over (ray-chunk x
   face-chunk) blocks with a running closest-hit reduce.  O(rays x faces)
   but fully vectorized; at the pipeline's budget (<= 4M rays x 200k faces,
   chunked) this is throughput-bound, not latency-bound.  General
   ``intersects_closest`` API parity with raytracing/__init__.py:57-82.

2. Depth-test visibility (in render/renderer_inverse.py): the main path
   never needs arbitrary rays — it compares "first hit along the view ray"
   with the rasterized triangle id, and the reference itself ships a
   rasterization-emulated backend proving the substitution
   (raytracing/rt_nvdiffrast.py:20-114).  Rendering a depth map per view and
   comparing projected depths answers the same visibility bit at
   rasterization cost.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RayHits(NamedTuple):
    """Closest-hit results: hit mask [N], front-face mask [N], triangle id
    [N] (-1 = miss), location [N, 3], barycentric uv [N, 2], distance [N]."""

    hit: jnp.ndarray
    front: jnp.ndarray
    tri: jnp.ndarray
    loc: jnp.ndarray
    uv: jnp.ndarray
    t: jnp.ndarray


@partial(jax.jit, static_argnames=("ray_chunk", "face_chunk"))
def ray_triangle_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    ray_chunk: int = 8192,
    face_chunk: int = 2048,
    eps: float = 1e-9,
) -> RayHits:
    """Closest-hit Möller–Trumbore: rays_o/rays_d [N, 3], vertices [V, 3],
    faces [F, 3] -> RayHits.  Double-sided; ``front`` reports whether the
    ray hit the front face (counter-clockwise orientation toward the ray)."""
    N = rays_o.shape[0]
    F = faces.shape[0]
    tri = vertices[faces]            # [F, 3, 3]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]

    nrc = (N + ray_chunk - 1) // ray_chunk
    Np = nrc * ray_chunk
    ro = jnp.pad(rays_o, ((0, Np - N), (0, 0)))
    rd = jnp.pad(rays_d, ((0, Np - N), (0, 0)))

    nfc = (F + face_chunk - 1) // face_chunk
    Fp = nfc * face_chunk

    def padf(a):
        return jnp.pad(a, [(0, Fp - F)] + [(0, 0)] * (a.ndim - 1))

    v0p = padf(v0).reshape(nfc, face_chunk, 3)
    e1p = padf(e1).reshape(nfc, face_chunk, 3)
    e2p = padf(e2).reshape(nfc, face_chunk, 3)
    fvalid = jnp.pad(jnp.ones((F,), bool), (0, Fp - F)).reshape(nfc, face_chunk)

    big = jnp.float32(jnp.inf)

    def ray_block(ro_c, rd_c):
        # carry: best (t, tri, u, v, sign) over face chunks
        def body(carry, fchunk):
            bt, btri, bu, bv, bsgn = carry
            fv0, fe1, fe2, fval, fbase = fchunk
            # Möller–Trumbore batched: rays [c, 3] x faces [m, 3]
            pvec = jnp.cross(rd_c[:, None, :], fe2[None, :, :])       # [c, m, 3]
            det = jnp.sum(pvec * fe1[None, :, :], axis=-1)            # [c, m]
            inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
            tvec = ro_c[:, None, :] - fv0[None, :, :]
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, fe1[None, :, :])
            v = jnp.sum(qvec * rd_c[:, None, :], axis=-1) * inv_det
            t = jnp.sum(fe2[None, :, :] * qvec, axis=-1) * inv_det
            ok = (
                (jnp.abs(det) > eps)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 1e-6)
                & fval[None, :]
            )
            t_m = jnp.where(ok, t, big)
            best = jnp.argmin(t_m, axis=1)
            ridx = jnp.arange(t_m.shape[0])
            tb = t_m[ridx, best]
            better = tb < bt
            return (
                jnp.where(better, tb, bt),
                jnp.where(better, fbase + best, btri),
                jnp.where(better, u[ridx, best], bu),
                jnp.where(better, v[ridx, best], bv),
                jnp.where(better, jnp.sign(det[ridx, best]), bsgn),
            ), None

        init = (
            jnp.full((ray_chunk,), big),
            jnp.full((ray_chunk,), -1, jnp.int32),
            jnp.zeros((ray_chunk,)),
            jnp.zeros((ray_chunk,)),
            jnp.zeros((ray_chunk,)),
        )
        bases = jnp.arange(nfc, dtype=jnp.int32) * face_chunk
        (bt, btri, bu, bv, bsgn), _ = jax.lax.scan(
            body, init, (v0p, e1p, e2p, fvalid, bases)
        )
        return bt, btri, bu, bv, bsgn

    ts, tris, us, vs, sgns = jax.lax.map(
        lambda c: ray_block(c[0], c[1]),
        (ro.reshape(nrc, ray_chunk, 3), rd.reshape(nrc, ray_chunk, 3)),
    )
    t = ts.reshape(Np)[:N]
    tri_id = tris.reshape(Np)[:N]
    u = us.reshape(Np)[:N]
    v = vs.reshape(Np)[:N]
    sgn = sgns.reshape(Np)[:N]
    hit = tri_id >= 0
    loc = rays_o + rays_d * jnp.where(hit, t, 0.0)[:, None]
    return RayHits(
        hit=hit,
        front=sgn > 0,
        tri=tri_id,
        loc=loc,
        uv=jnp.stack([u, v], axis=-1),
        t=jnp.where(hit, t, jnp.inf),
    )
