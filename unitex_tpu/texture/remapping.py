"""Texture remapping between meshes (UV re-baking).

Capability of the reference's reprojection toolkit
(/root/reference/TextureTools/texturetools/texture/reprojection/mesh_remapping.py:25-605):
transfer a texture from a source mesh (with its own UV layout / vertex
colors) onto a target mesh's UV atlas.  TPU-shaped: rasterize the target's
UV atlas to get per-texel 3D positions, find each texel's closest point on
the source surface (KNN against a dense surface sampling carrying source
colors), and pull-push-fill the gutters.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..geometry.io.mesh_io import HostMesh
from ..geometry.mesh import Mesh
from ..geometry.sampling import sample_surface
from ..ops.image_ops import pull_push
from ..ops.knn import knn
from ..render.renderer_inverse import uv_render


def _sample_source_colors(src: HostMesh, n_samples: int, seed: int = 0):
    """Surface samples + their colors from the source's texture or vertex
    colors."""
    pts, _ = sample_surface(src, n_samples, seed)
    # colors: nearest-vertex attribute lookup via barycentric-free proxy —
    # resample by re-running surface sampling with color interpolation
    rng = np.random.default_rng(seed)
    v = src.vertices.astype(np.float64)
    f = src.faces.astype(np.int64)
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    areas = 0.5 * np.linalg.norm(n, axis=-1)
    probs = areas / areas.sum()
    face_idx = rng.choice(len(f), size=n_samples, p=probs)
    r1 = np.sqrt(rng.uniform(size=n_samples))
    r2 = rng.uniform(size=n_samples)
    bary = np.stack([1.0 - r1, r1 * (1.0 - r2), r1 * r2], axis=-1)
    pts = np.einsum("nkc,nk->nc", tri[face_idx], bary).astype(np.float32)

    if src.texture is not None and src.uv is not None and src.faces_uv is not None:
        uv_tri = src.uv[src.faces_uv.astype(np.int64)][face_idx]
        uv = np.einsum("nkc,nk->nc", uv_tri, bary)
        Ht, Wt = src.texture.shape[:2]
        px = np.clip((uv[:, 0] * Wt).astype(np.int64), 0, Wt - 1)
        py = np.clip(((1.0 - uv[:, 1]) * Ht).astype(np.int64), 0, Ht - 1)
        colors = src.texture[py, px, :3].astype(np.float32) / 255.0
    elif src.vertex_colors is not None:
        col_tri = src.vertex_colors[f][face_idx][..., :3]
        colors = np.einsum("nkc,nk->nc", col_tri, bary).astype(np.float32)
    else:
        raise ValueError("source mesh has neither texture nor vertex colors")
    return pts, colors


def remap_texture(
    src: HostMesh,
    dst: HostMesh,
    uv_size: int = 1024,
    n_samples: int = 200_000,
    k: int = 3,
    seed: int = 0,
    knn_chunk: int = 8192,
) -> np.ndarray:
    """Bake the source mesh's appearance into the target mesh's UV atlas.
    Both meshes must live in the same world frame.  Returns [uv_size,
    uv_size, 3] float texture."""
    assert dst.uv is not None and dst.faces_uv is not None, "target needs UVs"
    src_pts, src_col = _sample_source_colors(src, n_samples, seed)

    mesh = Mesh(
        jnp.asarray(dst.vertices), jnp.asarray(dst.faces),
        uv=jnp.asarray(dst.uv), faces_uv=jnp.asarray(dst.faces_uv),
    )
    uv_out = uv_render(mesh, uv_size, pixel_tile=0 if uv_size <= 512 else 512)
    pos = uv_out["position"].reshape(-1, 3)
    mask = uv_out["mask"].reshape(-1)

    d, idx = knn(pos, jnp.asarray(src_pts), k=k, chunk=knn_chunk)
    w = 1.0 / jnp.maximum(d, 1e-6)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    colors = jnp.einsum("qk,qkc->qc", w, jnp.asarray(src_col)[idx])
    tex = jnp.where(mask[:, None], colors, 0.0).reshape(uv_size, uv_size, 3)
    return np.asarray(pull_push(tex, uv_out["mask"]))


def color_transfer_v_uv(
    src: HostMesh,
    dst: Optional[HostMesh] = None,
    uv_size: int = 1024,
    n_samples: int = 200_000,
    seed: int = 0,
) -> HostMesh:
    """Transfer source vertex colors into a (possibly UV-less) destination
    mesh's texture map — the texture/transfer capability
    (/root/reference/TextureTools/texturetools/texture/transfer/transfer_kerner.py:14-55),
    which the reference runs as a blender smart-UV subprocess + a meshlab
    vertex-attribute bake; here: own UV unwrap + UV-rasterized KNN bake,
    no subprocesses.  ``dst=None`` retextures the source mesh itself.
    Returns the destination with uv/faces_uv and a uint8 texture attached."""
    from ..geometry.uv_atlas import unwrap_atlas
    import dataclasses

    if dst is None:
        dst = src
    if dst.uv is None or dst.faces_uv is None:
        dst = unwrap_atlas(dst, size=uv_size)
    tex = remap_texture(src, dst, uv_size=uv_size, n_samples=n_samples, seed=seed)
    tex_u8 = (np.clip(tex, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return dataclasses.replace(dst, texture=tex_u8)
