"""Multi-object scene rendering.

Capability of ``NVDiffRendererScene`` / ``PBRScene``
(/root/reference/TextureTools/texturetools/render/nvdiffrast/renderer_scene.py,
mesh/structure_v2.py PBRScene): several meshes with per-object transforms
and textures rendered into one z-buffered image.  TPU formulation: objects
are flattened into one concatenated mesh with a per-face object id; one
rasterization pass serves all objects, and per-object texture lookups are
masked by the id map (a python loop over the — static — object list)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.mesh import Mesh
from ..ops.grid_sample import sample_texture
from .renderer import RenderOutputs, render_views


@dataclasses.dataclass
class SceneObject:
    mesh: Mesh
    texture: Optional[jnp.ndarray] = None    # [H, W, 3]
    transform: Optional[jnp.ndarray] = None  # [4, 4] object-to-world
    base_color: Tuple[float, float, float] = (0.7, 0.7, 0.7)


def flatten_scene(objects: Sequence[SceneObject]) -> Tuple[Mesh, jnp.ndarray]:
    """Concatenate objects into one mesh (world space) + per-face object id.
    UV tables are concatenated with offset indices so each object keeps its
    own chart space."""
    vs, fs, uvs, fuvs, fids = [], [], [], [], []
    v_off = t_off = 0
    for oid, obj in enumerate(objects):
        v = obj.mesh.vertices
        if obj.transform is not None:
            # transform_points_mat4: no in-jit homogeneous concat->matmul
            # (miscompiles on the current TPU toolchain; conversion.py)
            from ..camera.conversion import transform_points_mat4

            v = transform_points_mat4(v, obj.transform)[:, :3]
        vs.append(v)
        fs.append(obj.mesh.faces + v_off)
        fids.append(jnp.full((obj.mesh.faces.shape[0],), oid, jnp.int32))
        if obj.mesh.uv is not None:
            uvs.append(obj.mesh.uv)
            fuvs.append(obj.mesh.faces_uv + t_off)
            t_off += obj.mesh.uv.shape[0]
        else:
            # placeholder chart so indices stay aligned
            uvs.append(jnp.zeros((1, 2)))
            fuvs.append(jnp.zeros_like(obj.mesh.faces))
            t_off += 1
        v_off += v.shape[0]
    merged = Mesh(
        jnp.concatenate(vs, axis=0),
        jnp.concatenate(fs, axis=0).astype(jnp.int32),
        uv=jnp.concatenate(uvs, axis=0),
        faces_uv=jnp.concatenate(fuvs, axis=0).astype(jnp.int32),
    )
    return merged, jnp.concatenate(fids, axis=0)


def render_scene(
    objects: Sequence[SceneObject],
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    render_size: Tuple[int, int],
    perspective: bool = True,
    background: float = 1.0,
    face_chunk: int = 512,
):
    """-> dict with 'rgb' [M, H, W, 3], 'alpha', 'object_id' [M, H, W]
    (-1 background), 'normal'."""
    merged, face_obj = flatten_scene(objects)
    out: RenderOutputs = render_views(
        merged, c2ws, intrinsics, render_size,
        perspective=perspective,
        render_world_normal=True,
        render_uv=True,
        face_chunk=face_chunk,
    )
    tri = out.tri
    obj_id = jnp.where(tri >= 0, face_obj[jnp.maximum(tri, 0)], -1)

    uv = (out.uv + 1.0) * 0.5  # back to [0,1] v-up
    rgb = jnp.zeros(out.alpha.shape[:3] + (3,))
    for oid, obj in enumerate(objects):
        sel = (obj_id == oid)[..., None]
        if obj.texture is not None:
            col = jax.vmap(lambda u: sample_texture(obj.texture, u))(uv)
        else:
            col = jnp.broadcast_to(jnp.asarray(obj.base_color), rgb.shape)
        rgb = jnp.where(sel, col, rgb)
    rgb = rgb * out.alpha + background * (1.0 - out.alpha)
    return {
        "rgb": rgb,
        "alpha": out.alpha,
        "object_id": obj_id,
        "normal": out.world_normal,
    }
