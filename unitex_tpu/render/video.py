"""Turntable video export (``VideoExporter.export_orbit_video``,
/root/reference/TextureTools/texturetools/video/export_nvdiffrast_video.py:141-256):
120-frame orbit at 1024², perspective fov 49.1°, radius 2.8, textured
render, mp4 at 15 fps via imageio."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..camera.generator import generate_intrinsics, generate_orbit_views_c2ws
from ..geometry.io.mesh_io import load_mesh
from ..geometry.mesh import Mesh
from ..utils.image_io import to_uint8
from .renderer import render_views


def render_orbit_frames(
    mesh: Mesh,
    texture: Optional[jnp.ndarray],
    n_frames: int = 120,
    size: int = 1024,
    radius: float = 2.8,
    fov_deg: float = 49.1,
    height: float = 0.0,
    background: float = 1.0,
    batch: int = 10,
) -> np.ndarray:
    """-> [n_frames, size, size, 3] uint8 frames."""
    c2ws = generate_orbit_views_c2ws(n_frames + 1, radius=radius, height=height)[:n_frames]
    intr = generate_intrinsics(fov_deg, fov_deg, fov=True, degree=True)
    frames = []
    for i in range(0, n_frames, batch):
        chunk = c2ws[i : i + batch]
        out = render_views(
            mesh,
            chunk,
            intr,
            (size, size),
            perspective=True,
            map_attr=texture,
            render_uv=texture is not None,
            render_map_attr=texture is not None,
            render_world_normal=texture is None,
        )
        if texture is not None:
            rgb = out.map_attr
        else:
            rgb = out.world_normal * 0.5 + 0.5
        rgb = rgb * out.alpha + background * (1.0 - out.alpha)
        frames.append(to_uint8(np.asarray(rgb)))
    return np.concatenate(frames, axis=0)


def export_orbit_video(
    mesh_path: str,
    out_path: str,
    n_frames: int = 120,
    size: int = 1024,
    fps: int = 15,
    radius: float = 2.8,
    fov_deg: float = 49.1,
) -> str:
    host = load_mesh(mesh_path)
    tex = None
    if host.texture is not None:
        tex = jnp.asarray(host.texture[..., :3], jnp.float32) / 255.0
    mesh = Mesh(
        jnp.asarray(host.vertices),
        jnp.asarray(host.faces),
        uv=jnp.asarray(host.uv) if host.uv is not None else None,
        faces_uv=jnp.asarray(host.faces_uv) if host.faces_uv is not None else None,
    )
    frames = render_orbit_frames(
        mesh, tex, n_frames=n_frames, size=size, radius=radius, fov_deg=fov_deg
    )
    import imageio.v2 as imageio

    imageio.mimwrite(out_path, list(frames), fps=fps, quality=8)
    return out_path
