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
    video_type: str = "rgb",
) -> np.ndarray:
    """-> [n_frames, size, size, 3] uint8 frames.  ``video_type``:
    'rgb' (textured), 'normal', or 'ccm' (export_video's video_type
    variants, export_nvdiffrast_video.py:37-139)."""
    assert video_type in ("rgb", "normal", "ccm")
    c2ws = generate_orbit_views_c2ws(n_frames + 1, radius=radius, height=height)[:n_frames]
    intr = generate_intrinsics(fov_deg, fov_deg, fov=True, degree=True)
    want_tex = video_type == "rgb" and texture is not None
    frames = []
    for i in range(0, n_frames, batch):
        chunk = c2ws[i : i + batch]
        out = render_views(
            mesh,
            chunk,
            intr,
            (size, size),
            perspective=True,
            map_attr=texture if want_tex else None,
            render_uv=want_tex,
            render_map_attr=want_tex,
            render_world_normal=video_type == "normal" or not want_tex,
            render_world_position=video_type == "ccm",
        )
        if video_type == "ccm":
            rgb = out.world_position * 0.5 + 0.5
        elif want_tex:
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
    video_type: str = "rgb",
    save_camera: bool = False,
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
        mesh, tex, n_frames=n_frames, size=size, radius=radius,
        fov_deg=fov_deg, video_type=video_type,
    )
    import imageio.v2 as imageio

    try:
        imageio.mimwrite(out_path, list(frames), fps=fps, quality=8)
    except (ValueError, ImportError):
        # no ffmpeg backend in this environment: fall back to GIF
        import os

        out_path = os.path.splitext(out_path)[0] + ".gif"
        imageio.mimwrite(out_path, list(frames), duration=1000.0 / fps, loop=0)
    if save_camera:
        import os

        c2ws = generate_orbit_views_c2ws(n_frames + 1, radius=radius)[:n_frames]
        intr = generate_intrinsics(fov_deg, fov_deg, fov=True, degree=True)
        np.savez(
            os.path.splitext(out_path)[0] + "_camera.npz",
            c2ws=np.asarray(c2ws),
            intrinsics=np.asarray(intr),
            perspective=np.asarray(True),
        )
    return out_path


def render_height_sweep_frames(
    mesh: Mesh,
    texture: Optional[jnp.ndarray],
    n_frames: int = 9,
    size: int = 512,
    radius: float = 2.8,
    video_type: str = "rgb",
) -> np.ndarray:
    """Three stacked orbits at heights 0 / r·cos60° / r·cos30° (the
    texture-check exporter's non-orbit mode,
    export_nvdiffrast_uv_video.py:71-76), n_frames//3 frames each."""
    per = n_frames // 3
    chunks = [
        render_orbit_frames(
            mesh, texture, n_frames=per, size=size, radius=radius,
            height=radius * math.cos(math.radians(deg)),
            video_type=video_type,
        )
        for deg in (90.0, 60.0, 30.0)
    ]
    return np.concatenate(chunks, axis=0)


def export_turntable(
    mesh_path: str,
    save_path: str,
    n_frames: int = 8,
    size: int = 512,
    fps: int = 15,
    video_type: str = "rgb",
    height_sweep: bool = False,
) -> str:
    """Texture-check export (export_nvdiffrast_uv_video.export_video):
    the extension decides the output — .mp4/.gif = orbit video,
    .png/.jpg/.webp = a tiled frame grid.  ``height_sweep`` renders the
    reference's three-height orbit stack instead of a single orbit."""
    import os

    ext = os.path.splitext(save_path)[1].lower()
    assert ext in (".png", ".jpg", ".webp", ".mp4", ".gif")
    if ext in (".mp4", ".gif") and not height_sweep:
        return export_orbit_video(
            mesh_path, save_path, n_frames=n_frames, size=size, fps=fps,
            video_type=video_type,
        )
    host = load_mesh(mesh_path)
    tex = None
    if host.texture is not None:
        tex = jnp.asarray(host.texture[..., :3], jnp.float32) / 255.0
    mesh = Mesh(
        jnp.asarray(host.vertices), jnp.asarray(host.faces),
        uv=jnp.asarray(host.uv) if host.uv is not None else None,
        faces_uv=jnp.asarray(host.faces_uv) if host.faces_uv is not None else None,
    )
    if height_sweep:
        frames = render_height_sweep_frames(
            mesh, tex, n_frames=n_frames, size=size, video_type=video_type
        )
        n_frames = frames.shape[0]
    else:
        frames = render_orbit_frames(
            mesh, tex, n_frames=n_frames, size=size, video_type=video_type
        )
    if ext in (".mp4", ".gif"):
        import imageio.v2 as imageio

        try:
            imageio.mimwrite(save_path, list(frames), fps=fps, quality=8)
        except (ValueError, ImportError):
            save_path = os.path.splitext(save_path)[0] + ".gif"
            imageio.mimwrite(
                save_path, list(frames), duration=1000.0 / fps, loop=0)
        return save_path
    # tile into a near-square grid
    cols = int(np.ceil(np.sqrt(n_frames)))
    rows = int(np.ceil(n_frames / cols))
    pad = rows * cols - n_frames
    if pad:
        frames = np.concatenate(
            [frames, np.full((pad,) + frames.shape[1:], 255, np.uint8)]
        )
    grid = (
        frames.reshape(rows, cols, size, size, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * size, cols * size, 3)
    )
    from PIL import Image

    Image.fromarray(grid).save(save_path)
    return save_path
