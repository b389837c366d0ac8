"""Point-visibility checks via ray casting.

Capability of the reference's raytracing/check_visibility.py: classify
points as inside/occluded by scattering rays against the mesh — ``self_rt``
(a point is inner if ALL random rays from it hit something),
``cross_rt`` (a point is inner if it is occluded from ALL given outer
points), and ``sphere_rt`` (triangle ids visible from a bounding sphere).
The reference loops host-side over chunks with a cuBVH; here each check is
one jit over our Möller–Trumbore intersector (ops/raytrace.py) with static
shapes — chunking happens inside the intersector.
"""

from __future__ import annotations

from functools import partial
import math

import jax
import jax.numpy as jnp

from .raytrace import ray_triangle_intersect


@partial(jax.jit, static_argnames=("n_rays",))
def self_rt(
    points: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    n_rays: int = 32,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Inner-point mask [N]: every one of ``n_rays`` random rays from the
    point hits the mesh (check_visibility.py:9-43)."""
    if key is None:
        key = jax.random.PRNGKey(666)
    N = points.shape[0]
    rays_o = jnp.repeat(points, n_rays, axis=0)
    rays_d = jax.random.normal(key, (N * n_rays, 3), dtype=jnp.float32)
    rays_d = rays_d / jnp.maximum(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
    )
    hits = ray_triangle_intersect(rays_o, rays_d, vertices, faces)
    return hits.hit.reshape(N, n_rays).all(axis=-1)


@jax.jit
def cross_rt(
    points: jnp.ndarray,
    outer_points: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
) -> jnp.ndarray:
    """Inner-point mask [N]: the segment from every outer point [M, 3] to
    the point is blocked by the mesh (check_visibility.py:46-97, exhaustive
    mode).  A point visible from ANY outer point is outer."""
    N = points.shape[0]
    M = outer_points.shape[0]
    tgt = jnp.broadcast_to(points[:, None, :], (N, M, 3)).reshape(-1, 3)
    src = jnp.broadcast_to(outer_points[None, :, :], (N, M, 3)).reshape(-1, 3)
    d = tgt - src
    dist = jnp.linalg.norm(d, axis=-1)
    rays_d = d / jnp.maximum(dist[:, None], 1e-12)
    hits = ray_triangle_intersect(src, rays_d, vertices, faces)
    blocked = hits.hit & (hits.t < dist)
    return blocked.reshape(N, M).all(axis=-1)


@partial(jax.jit, static_argnames=("n_rays",))
def sphere_rt(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    n_rays: int = 1000,
    sample_offset: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Triangle ids hit by rays shot inward from a bounding sphere of radius
    sqrt(3)·(1+offset) (check_visibility.py:100-118).  Static shape: returns
    [n_rays] int32 with -1 for misses instead of a compacted list."""
    if key is None:
        key = jax.random.PRNGKey(666)
    radius = math.sqrt(3.0) * (1.0 + sample_offset)
    rays_d = jax.random.normal(key, (n_rays, 3), dtype=jnp.float32)
    rays_d = rays_d / jnp.maximum(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
    )
    rays_o = radius * rays_d
    hits = ray_triangle_intersect(rays_o, -rays_d, vertices, faces)
    return jnp.where(hits.hit, hits.tri, -1)


def sphere_rt_views(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    n_cameras: int = 6,
    sample_offset: float = 0.0,
) -> jnp.ndarray:
    """Axis-aligned variant (check_visibility.py:121-173): rays from ±x/±y/±z
    sphere points toward the origin (4 or 6 views).  Returns [n] tri ids,
    -1 for misses."""
    radius = math.sqrt(3.0) * (1.0 + sample_offset)
    if n_cameras == 4:
        dirs = jnp.array(
            [[-1.0, 0, 0], [0, -1.0, 0], [1.0, 0, 0], [0, 1.0, 0]], jnp.float32
        )
    elif n_cameras == 6:
        dirs = jnp.array(
            [
                [-1.0, 0, 0],
                [0, -1.0, 0],
                [1.0, 0, 0],
                [0, 1.0, 0],
                [0, 0, -1.0],
                [0, 0, 1.0],
            ],
            jnp.float32,
        )
    else:
        key = jax.random.PRNGKey(666)
        d = jax.random.normal(key, (n_cameras, 3), dtype=jnp.float32)
        dirs = -d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    rays_o = -radius * dirs
    hits = ray_triangle_intersect(rays_o, dirs, vertices, faces)
    return jnp.where(hits.hit, hits.tri, -1)
