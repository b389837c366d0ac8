"""Unified RGB / PBR render conveniences.

Capability of the reference's ``render/unify/unified_{rgb,pbr}_renderer.py``
(bit-rotted upstream — both import a nonexistent ``renderers.nvdiffrast``
path): load a (textured) mesh, generate a camera sweep, and return rendered
frames.  Two sweeps, as upstream:

* v1 — orbit at radius 2.8 with fixed intrinsics (fov 49.1° perspective or
  ortho scale 0.85), ``generate_cameras_v1`` (unified_rgb_renderer.py:16-22);
* v2 — fixed front pose, intrinsics sweep (fov 0→90° / ortho scale 0→2),
  ``generate_cameras_v2`` (:25-40).

The PBR variant shades albedo + (ao, roughness, metallic) with the
renderutils-equivalent BSDF suite under a camera headlight and returns
{'rgb', 'diffuse', 'specular'} like ``NVDiffRendererPBR.render_pbr``
(renderer_pbr.py:58-94, with its lambda_* channel scales).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..camera.generator import generate_intrinsics, generate_orbit_views_c2ws
from ..geometry.io.mesh_io import HostMesh, load_mesh
from ..geometry.mesh import Mesh
from ..texture.pbr import frostbite_diffuse, lambert, pbr_specular
from ..utils.image_io import to_uint8
from .renderer import render_views


def generate_cameras_v1(n_frames: int = 8, perspective: bool = True):
    """Orbit sweep: [N, 4, 4] c2ws + [3, 3] intrinsics."""
    c2ws = generate_orbit_views_c2ws(n_frames + 1, radius=2.8, height=0.0)[:n_frames]
    if perspective:
        intr = generate_intrinsics(49.1, 49.1, fov=True, degree=True)
    else:
        intr = generate_intrinsics(0.85, 0.85, fov=False)
    return c2ws, intr


def generate_cameras_v2(n_frames: int = 8, perspective: bool = True):
    """Fixed front pose, intrinsics sweep: [N, 4, 4] c2ws + [N, 3, 3]."""
    c2w = generate_orbit_views_c2ws(1, radius=2.8, height=0.0)
    c2ws = jnp.broadcast_to(c2w, (n_frames, 4, 4))
    if perspective:
        fovs = np.linspace(0.0, 90.0, n_frames + 1, endpoint=True)[1:]
        intr = jnp.stack(
            [generate_intrinsics(f, f, fov=True, degree=True) for f in fovs]
        )
    else:
        scales = np.linspace(0.0, 2.0, n_frames + 1, endpoint=True)[1:]
        intr = jnp.stack(
            [generate_intrinsics(s, s, fov=False) for s in scales]
        )
    return c2ws, intr


def _prepare(mesh: Union[str, HostMesh]) -> HostMesh:
    return load_mesh(mesh) if isinstance(mesh, str) else mesh


def _device_mesh(hm: HostMesh) -> Mesh:
    kw = {}
    if hm.uv is not None and hm.faces_uv is not None:
        kw = {"uv": jnp.asarray(hm.uv), "faces_uv": jnp.asarray(hm.faces_uv)}
    return Mesh(jnp.asarray(hm.vertices), jnp.asarray(hm.faces), **kw)


def unified_rgb_render(
    mesh: Union[str, HostMesh],
    n_frames: int = 8,
    size: int = 512,
    perspective: bool = True,
    cameras: str = "v1",
    background: float = 1.0,
) -> np.ndarray:
    """Textured (or normal-shaded, if untextured) frames [N, size, size, 3]
    uint8 — ``unified_rgb_render`` capability."""
    hm = _prepare(mesh)
    c2ws, intr = (generate_cameras_v1 if cameras == "v1" else generate_cameras_v2)(
        n_frames, perspective
    )
    mesh_d = _device_mesh(hm)
    textured = hm.texture is not None and hm.uv is not None
    tex = jnp.asarray(hm.texture[..., :3], jnp.float32) / 255.0 if textured else None
    out = render_views(
        mesh_d, c2ws, intr, (size, size), perspective=perspective,
        map_attr=tex, render_uv=textured, render_map_attr=textured,
        render_world_normal=not textured,
    )
    rgb = out.map_attr if textured else out.world_normal * 0.5 + 0.5
    rgb = rgb * out.alpha + background * (1.0 - out.alpha)
    return to_uint8(np.asarray(rgb))


def unified_pbr_render(
    mesh: Union[str, HostMesh],
    n_frames: int = 8,
    size: int = 512,
    perspective: bool = True,
    cameras: str = "v1",
    background: float = 1.0,
    lambda_albedo=(1.0, 1.0, 1.0),
    lambda_metallic: float = 1.0,
    lambda_roughness: float = 1.0,
    lambda_diffuse: float = 1.0,
    lambda_specular: float = 1.0,
    bsdf: str = "lambert",
) -> Dict[str, np.ndarray]:
    """PBR-shaded frames under a camera headlight.  Returns
    {'rgb', 'diffuse', 'specular'} uint8 [N, size, size, 3]
    (``render_pbr``'s outputs and lambda_* channel scales,
    renderer_pbr.py:58-94)."""
    hm = _prepare(mesh)
    assert hm.uv is not None and hm.texture is not None, "PBR render needs UVs + albedo"
    c2ws, intr = (generate_cameras_v1 if cameras == "v1" else generate_cameras_v2)(
        n_frames, perspective
    )
    mesh_d = _device_mesh(hm)

    kd = jnp.asarray(hm.texture[..., :3], jnp.float32) / 255.0
    kd = kd * jnp.asarray(lambda_albedo, jnp.float32)
    if hm.metallic_roughness is not None:
        mr = jnp.asarray(hm.metallic_roughness, jnp.float32) / 255.0
        # glTF: g = roughness, b = metallic (r = optional occlusion)
        arm = jnp.stack(
            [jnp.ones_like(mr[..., 0]),
             mr[..., 1] * lambda_roughness,
             mr[..., 2] * lambda_metallic],
            axis=-1,
        )
    else:
        arm = jnp.broadcast_to(
            jnp.asarray([1.0, 0.5 * lambda_roughness, 0.0]), kd.shape
        )
    maps = jnp.concatenate([kd, arm], axis=-1)  # 6-channel atlas

    out = render_views(
        mesh_d, c2ws, intr, (size, size), perspective=perspective,
        map_attr=maps, render_uv=True, render_map_attr=True,
        render_world_normal=True, render_world_position=True,
    )
    kd_px = out.map_attr[..., :3]
    arm_px = out.map_attr[..., 3:6]
    view_pos = c2ws[:, None, None, :3, 3]
    # headlight: light at the camera, wo == wi (pbr_bsdf internals, split
    # into the diffuse/specular terms render_pbr returns separately)
    wo = view_pos - out.world_position
    wo = wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True), 1e-20)
    nrm = out.world_normal
    spec_str = arm_px[..., 0:1]
    roughness = arm_px[..., 1:2]
    metallic = arm_px[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd_px * metallic) * (1.0 - spec_str)
    kd_diff = kd_px * (1.0 - metallic)
    if bsdf == "lambert":
        diff_only = kd_diff * lambert(nrm, wo)
    else:
        diff_only = kd_diff * frostbite_diffuse(nrm, wo, wo, roughness)
    spec_only = pbr_specular(ks, nrm, wo, wo, roughness * roughness)
    rgb = lambda_diffuse * diff_only + lambda_specular * spec_only
    rgb = rgb * out.alpha + background * (1.0 - out.alpha)

    def u8(x):
        return to_uint8(np.asarray(jnp.clip(x, 0.0, 1.0)))

    return {"rgb": u8(rgb), "diffuse": u8(diff_only), "specular": u8(spec_only)}
